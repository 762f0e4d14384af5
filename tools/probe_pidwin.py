"""Time packed_pid_windows alone on the bench scene (TPU).

Usage: python tools/probe_pidwin.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsjax import RenderConfig
from gsjax.bench.synth import bench_camera, bonsai_like
from gsjax.render.binning import build_tile_bins
from gsjax.render.composite import clipped_pair_stream
from gsjax.render.homesort import build_home_layout
from gsjax.render.pallas_stream import packed_pid_windows
from gsjax.render.project import project


def _sync(out):
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def main():
    cfg = RenderConfig(backend="stream")
    g = bonsai_like(n=1_200_000)
    cam = bench_camera(width=1920, height=1080)
    prep = jax.jit(
        lambda g: clipped_pair_stream(
            build_tile_bins(
                project(build_home_layout(g, cam, cfg)[0], cam, cfg),
                cam, cfg, anchor="home",
            ),
            cfg,
        )
    )
    pid, starts, _ = prep(g)
    _sync(pid)

    f = jax.jit(lambda pid, starts: packed_pid_windows(pid, starts, cfg))
    out = f(pid, starts)
    _sync(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = f(pid, starts)
    _sync(out)
    print(f"pid windows: {(time.perf_counter() - t0) / reps * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
