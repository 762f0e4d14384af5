""".ply → .splat conversion — the reference's ply-converter example
(examples/ply-converter/src/main.ts: PLYLoader.LoadFromFileAsync →
scene.saveToFile)."""

import sys

from _common import demo_scene, out_path

from gsjax import load_ply, save_splat
from gsjax.io.ply import save_ply


def main():
    if len(sys.argv) > 1:
        g = load_ply(sys.argv[1])
        src = sys.argv[1]
    else:
        # no input: synthesize, write a .ply, then convert it back
        g = demo_scene(n=500)
        src = out_path("demo.ply")
        save_ply(g, src)

    out = out_path("converted.splat")
    save_splat(load_ply(src), out)
    print(f"{src} → {out}")


if __name__ == "__main__":
    main()
