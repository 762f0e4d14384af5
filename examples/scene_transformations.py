"""Scene edit ops — the reference's scene-transformations example
(examples/scene-transformations/src/main.ts: Scene.translate / rotate /
scale / limitBox then saveToFile). Renders before/after frames."""

import sys

import numpy as np
from _common import load_or_demo, out_path

from gsjax import Camera, RenderConfig, render, save_splat, transforms
from gsjax.utils.image import write_png


def main():
    g = load_or_demo(sys.argv)
    cam = Camera.look_at(
        (0.0, -1.0, -1.0), (0.0, 0.0, 4.0), fx=500.0, fy=500.0,
        width=640, height=480,
    )
    cfg = RenderConfig(backend="auto")
    write_png(out_path("transform_before.png"), render(g, cam, cfg))

    # ≙ scene.rotate(q) — 30° about +y (Scene.ts:197-257)
    half = np.deg2rad(30.0) / 2
    g2 = transforms.rotate(g, (np.cos(half), 0.0, np.sin(half), 0.0))
    # ≙ scene.translate (Scene.ts:182-195) and scale (Scene.ts:259-305)
    g2 = transforms.translate(g2, (0.3, 0.0, 0.0))
    g2 = transforms.scale(g2, 0.8)
    # ≙ scene.limitBox (Scene.ts:307-366): fade splats outside the box
    g2 = transforms.limit_box(g2, -2.0, 2.0, -2.0, 2.0, 1.0, 7.0)

    write_png(out_path("transform_after.png"), render(g2, cam, cfg))
    save_splat(g2, out_path("transformed.splat"))
    print(f"wrote before/after renders and {out_path('transformed.splat')}")


if __name__ == "__main__":
    main()
