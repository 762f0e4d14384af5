"""Sweep stream_unroll (and optionally pair_cap) against the stream
fwd/bwd kernel times on the bench scene — the per-grid-step fixed cost
(~0.8 µs, tools/probe_chunk.py) times the group count is the dominant
kernel cost, so fewer/larger groups should win until code size or
padding waste pushes back.

Usage: python tools/probe_unroll.py [--unrolls 4,8,16] [--pair-cap N]
"""

import argparse
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
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, *a, reps=5):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--unrolls", default="4,8,16")
    ap.add_argument("--pair-cap", type=int, default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-size", type=int, default=16)
    ap.add_argument("--block-tiles", type=int, default=8)
    ap.add_argument("--band-cap", type=int, default=49152)
    args = ap.parse_args()

    g = bonsai_like(n=args.n)
    cam = bench_camera(width=1920, height=1080)

    for u in [int(x) for x in args.unrolls.split(",")]:
        cfg = RenderConfig(
            backend="stream", stream_unroll=u, pair_cap=args.pair_cap,
            tile_size=args.tile_size, stream_block_tiles=args.block_tiles,
            stream_band_cap=args.band_cap,
        )
        prep = jax.jit(
            lambda g, cfg=cfg: _prep(g, cam, cfg)
        )
        inputs = prep(g)
        _sync(inputs)
        att_tab, pidwin, blktab, starts, cbase, tile_of, ty0 = inputs[:7]
        n_pairs, novf = int(inputs[7]), int(inputs[8])
        print(f"  pairs={n_pairs} band_overflow={novf}", flush=True)
        tiles_x = cfg.tiles_x(cam.width)
        band_rows = cfg.tiles_y(cam.height)
        ncb = pidwin.shape[0]

        f_fwd = jax.jit(lambda *a, cfg=cfg: _fwd_call(*a, tiles_x, band_rows, cfg))
        t_f, fwd_out = timeit(f_fwd, att_tab, pidwin, blktab, starts,
                              cbase, tile_of, ty0, reps=args.reps)

        n_px = cfg.tile_size**2
        ct_img = jnp.ones((tiles_x * band_rows, 3, n_px), jnp.float32)
        ct_T = jnp.ones((tiles_x * band_rows, n_px), jnp.float32)
        f_bwd = jax.jit(lambda *a, cfg=cfg: _bwd_call(*a, tiles_x, band_rows, cfg))
        t_b, _ = timeit(f_bwd, att_tab, pidwin, blktab, starts, cbase,
                        tile_of, ty0, fwd_out, ct_img, ct_T, reps=args.reps)
        print(
            f"unroll={u:3d} pair_cap={args.pair_cap}: NCB={ncb} "
            f"groups={ncb // u}  fwd {t_f:7.2f} ms  bwd {t_b:7.2f} ms",
            flush=True,
        )


def _prep(g, cam, cfg):
    g_home, layout = build_home_layout(g, cam, cfg)
    p = project(g_home, cam, cfg)
    bins = build_tile_bins(p, cam, cfg, anchor="home")
    pid, starts, _nd = clipped_pair_stream(bins, cfg)
    pidwin, tile_of, cbase = packed_pid_windows(pid, starts, cfg)
    blktab, novf = band_blocks(
        layout.seg_starts, bins.ty0, bins.tiles_x, layout.tiles_y,
        bins.band_rows, cfg,
    )
    ts = float(cfg.tile_size)
    htx = jnp.clip(jnp.floor(p.mean2d[:, 0] / ts), 0, bins.tiles_x - 1)
    hty = jnp.clip(jnp.floor(p.mean2d[:, 1] / ts), 0, layout.tiles_y - 1)
    cols = (p.mean2d[:, 0] - htx * ts, p.mean2d[:, 1] - hty * ts,
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], p.opacity)
    att_tab = att_cols_table(cols, _table_pad(cols[0].shape[0], cfg))
    return (att_tab, pidwin, blktab, starts, cbase, tile_of, bins.ty0,
            bins.n_pairs, novf)


if __name__ == "__main__":
    main()
