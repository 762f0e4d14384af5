"""Orbit-view a scene and write frames — the headless form of the
reference's simple-server example (examples/simple-server/src/main.ts:
load .splat → OrbitControls + requestAnimationFrame render loop)."""

import sys

from _common import load_or_demo, out_path

from gsjax import RenderConfig
from gsjax.viewer import render_orbit


def main():
    g = load_or_demo(sys.argv)
    frames = render_orbit(
        g,
        n_frames=8,
        radius=5.0,
        target=(0.0, 0.0, 4.0),
        beta=0.3,
        cfg=RenderConfig(backend="auto"),
        out_dir=out_path("simple_viewer"),
        width=640,
        height=480,
        fx=500.0,
        fy=500.0,
    )
    print(f"wrote {len(frames)} frames to {out_path('simple_viewer')}")


if __name__ == "__main__":
    main()
