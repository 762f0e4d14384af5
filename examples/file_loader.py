"""Load .splat / .ply / quantized-.ply, render one frame, save to .splat —
the reference's file-loader example (examples/file-loader/src/main.ts:
format dispatch on file extension, progress bar, Scene → saveToFile)."""

import sys

from _common import demo_scene, out_path

from gsjax import Camera, RenderConfig, load_ply, load_splat, render, save_splat
from gsjax.utils.image import write_png


def load_any(path: str):
    """Extension dispatch ≙ file-loader/src/main.ts selectFile()."""
    if path.endswith(".splat"):
        return load_splat(path)
    if path.endswith(".qply"):  # quantized codebook PLY
        return load_ply(path, quantized=True)
    if path.endswith(".ply"):
        return load_ply(path, use_shs=True)
    raise ValueError(f"unsupported scene format: {path}")


def main():
    if len(sys.argv) > 1:
        g = load_any(sys.argv[1])
        print(f"loaded {sys.argv[1]}: {g.n} splats, {g.sh.shape[1]} SH coeffs")
    else:
        g = demo_scene()
        print(f"synthetic scene: {g.n} splats")

    cam = Camera.look_at(
        (0.0, -1.0, -1.0), (0.0, 0.0, 4.0), fx=500.0, fy=500.0,
        width=640, height=480,
    )
    img = render(g, cam, RenderConfig(backend="auto"))
    write_png(out_path("file_loader.png"), img)

    # round-trip back to .splat (≙ Scene.saveToFile, Scene.ts:368-403)
    save_splat(g, out_path("scene_out.splat"))
    print(f"wrote {out_path('file_loader.png')} and {out_path('scene_out.splat')}")


if __name__ == "__main__":
    main()
