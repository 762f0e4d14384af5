"""Stream-kernel stage attribution by ablation.

For each ablation (a stage stubbed out with shape-identical cheap math —
see pallas_stream._ABLATE), re-exec a child process with GSJAX_ABLATE set
and time ONLY the fwd/bwd Pallas kernels on the bench scene. The delta
full − ablated is that stage's cost. Images are garbage under ablation;
this tool is timing-only.

  python tools/ablate_stream.py [--n 1200000] [--wh 1920x1080] [--reps 3]

CAVEAT: with early termination on, any ablation that changes
alpha/transmittance changes the live chunk set, so deltas conflate
stage cost with workload. Pass --eps 0 to disable termination: every
in-count chunk is live for every variant and deltas are clean
per-chunk stage costs (on the ~6.5× larger no-termination workload).
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATIONS = ["", "gather", "hs", "exp", "scatter"]


def parent():
    for a in ABLATIONS:
        env = dict(os.environ, GSJAX_ABLATE=a, _GSJAX_ABLATE_CHILD="1")
        print(f"== ablate [{a or 'none'}] ==", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env=env,
            check=False,
        )


def child():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--wh", default="1920x1080")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--pair-cap", type=int, default=8_000_000)
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    import jax
    import jax.numpy as jnp

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.render.binning import build_tile_bins
    from gsjax.render.composite import clipped_pair_stream
    from gsjax.render.homesort import build_home_layout
    from gsjax.render.pallas_stream import (
        _bwd_call,
        _fwd_call,
        _table_pad,
        att_cols_table,
        band_blocks,
        packed_pid_windows,
    )
    from gsjax.render.project import project

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    def timeit(fn, *a, reps=args.reps):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        _sync(out)
        return (time.perf_counter() - t0) / reps * 1e3, out

    cfg = RenderConfig(
        backend="stream",
        chunk=args.chunk,
        transmittance_eps=args.eps,
        pair_cap=args.pair_cap or None,
    )
    g = bonsai_like(n=args.n)
    cam = bench_camera(width=W, height=H)

    # build kernel inputs (one compile each; not timed)
    build = jax.jit(
        lambda g: _build(g, cam, cfg, build_home_layout, project,
                         build_tile_bins, clipped_pair_stream,
                         packed_pid_windows, band_blocks, att_cols_table,
                         _table_pad, jnp)
    )
    inputs = build(g)
    _sync(inputs)
    att_tab, pidwin, blktab, starts, cbase, tile_of, ty0 = inputs
    tiles_x = cfg.tiles_x(cam.width)
    band_rows = cfg.tiles_y(cam.height)

    f_fwd = jax.jit(
        lambda *a: _fwd_call(*a, tiles_x, band_rows, cfg)
    )
    t, fwd_out = timeit(f_fwd, att_tab, pidwin, blktab, starts, cbase,
                        tile_of, ty0)
    print(f"  fwd kernel : {t:8.2f} ms", flush=True)

    ts = cfg.tile_size
    n_px = ts * ts
    ct_img = jnp.ones((tiles_x * band_rows, 3, n_px), jnp.float32)
    ct_T = jnp.ones((tiles_x * band_rows, n_px), jnp.float32)
    f_bwd = jax.jit(lambda *a: _bwd_call(*a, tiles_x, band_rows, cfg))
    t, _ = timeit(f_bwd, att_tab, pidwin, blktab, starts, cbase, tile_of,
                  ty0, fwd_out, ct_img, ct_T)
    print(f"  bwd kernel : {t:8.2f} ms", flush=True)


def _build(g, cam, cfg, build_home_layout, project, build_tile_bins,
           clipped_pair_stream, packed_pid_windows, band_blocks,
           att_cols_table, _table_pad, jnp):
    p = project(g, cam, cfg)
    p, layout = build_home_layout(p, cam, cfg)
    bins = build_tile_bins(p, cam, cfg, anchor="home", layout=layout)
    pid, starts, _nd = clipped_pair_stream(bins, cfg)
    pidwin, tile_of, cbase = packed_pid_windows(pid, starts, cfg)
    blktab, _novf = band_blocks(
        layout.seg_starts, bins.ty0, bins.tiles_x, layout.tiles_y,
        bins.band_rows, cfg,
    )
    ts = float(cfg.tile_size)
    htx = layout.home_x.astype(jnp.float32)
    hty = layout.home_y.astype(jnp.float32)
    cols = (p.mean2d[:, 0] - htx * ts, p.mean2d[:, 1] - hty * ts,
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], p.opacity)
    att_tab = att_cols_table(cols, _table_pad(cols[0].shape[0], cfg))
    return (att_tab, pidwin, blktab, starts, cbase, tile_of, bins.ty0)


if __name__ == "__main__":
    if os.environ.get("_GSJAX_ABLATE_CHILD") == "1":
        child()
    else:
        parent()
