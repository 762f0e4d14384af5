"""Sub-stage timing of the home-anchor binning path at bench scale
(r3: 109 ms total — expansion kernel vs cols transpose vs sort vs
searchsorted, on REAL keys).

Usage: python tools/probe_binning2.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--wh", default="1920x1080")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.render.binning import _EXPAND_R, expand_pairs_pallas
    from gsjax.render.homesort import build_home_layout
    from gsjax.render.project import project

    cfg = RenderConfig(backend="stream")
    g = bonsai_like(n=args.n, sh_degree=0)
    cam = bench_camera(width=W, height=H)
    p0 = jax.jit(lambda g: project(g, cam, cfg))(g)
    p, layout = jax.jit(lambda p: build_home_layout(p, cam, cfg))(p0)

    n = p.depth.shape[0]
    tiles_x, tiles_y = layout.tiles_x, layout.tiles_y
    span = cfg.tile_span
    k_slots = span * span
    nh_pad = -(-n // _EXPAND_R) * _EXPAND_R
    print(f"# n(home rows)={n} nh_pad={nh_pad} slots={k_slots*nh_pad}")

    def cols_stage(p, layout):
        ca1, cb1, cc1 = p.conic[:, 0], p.conic[:, 1], p.conic[:, 2]
        thr1 = 2.0 * jnp.log(
            jnp.maximum(p.opacity, cfg.alpha_min) / cfg.alpha_min
        ) + 1e-3
        cols = jnp.stack(
            [layout.home_x.astype(jnp.float32),
             layout.home_y.astype(jnp.float32),
             layout.win[:, 0].astype(jnp.float32),
             layout.win[:, 1].astype(jnp.float32),
             layout.win[:, 2].astype(jnp.float32),
             layout.win[:, 3].astype(jnp.float32),
             p.valid.astype(jnp.float32),
             p.mean2d[:, 0], p.mean2d[:, 1],
             ca1, cb1, cc1, thr1, -cb1 / cc1, -cb1 / ca1,
             jnp.zeros_like(thr1)])
        return jnp.pad(cols, ((0, 0), (0, nh_pad - n)))

    f1 = jax.jit(cols_stage)
    t, cols = timeit(f1, p, layout, reps=args.reps)
    print(f"cols stack/transpose [16, NH]:  {t:8.2f} ms")

    meta = jnp.stack([jnp.int32(0), jnp.int32(tiles_y),
                      jnp.int32(tiles_x), jnp.int32(cfg.tile_size)])

    f2 = jax.jit(lambda cols, meta: expand_pairs_pallas(cols, meta, nh_pad, span))
    t, (tile2d, pid2d) = timeit(f2, cols, meta, reps=args.reps)
    print(f"expansion kernel [9, NH]:       {t:8.2f} ms")

    def dbits_stage(p, tile2d, pid2d):
        tile_i = tile2d.reshape(-1)
        pids = pid2d.reshape(-1)
        dbits = jnp.asarray(p.depth, jnp.float32).view(jnp.int32)
        dbits = jnp.pad(dbits, (0, nh_pad - n))
        dpair = jnp.broadcast_to(dbits[None, :], (k_slots, nh_pad)).reshape(-1)
        return tile_i, dpair, pids

    f3 = jax.jit(dbits_stage)
    t, (tile_i, dpair, pids) = timeit(f3, p, tile2d, pid2d, reps=args.reps)
    print(f"dbits broadcast/reshape:        {t:8.2f} ms")

    f4 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3,
                                              is_stable=False))
    t, (tile_of, _, pid_sorted) = timeit(f4, tile_i, dpair, pids, reps=3)
    live = int(jnp.sum((tile_i != jnp.int32(0x7FFFFFFF)).astype(jnp.int32)))
    print(f"3-key pair sort (REAL keys):    {t:8.2f} ms   live={live}")

    f5 = jax.jit(lambda t_of: jnp.searchsorted(
        t_of, jnp.arange(tiles_x * tiles_y + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32))
    t, starts = timeit(f5, tile_of, reps=args.reps)
    print(f"tile_starts searchsorted:       {t:8.2f} ms")

    # how much does the INVALID tail cost? sort only a live-sized prefix
    for frac in (0.5,):
        m = int(k_slots * nh_pad * frac) // 256 * 256
        f6 = jax.jit(lambda a, b, c: jax.lax.sort(
            (a[:m], b[:m], c[:m]), num_keys=3, is_stable=False))
        t, _ = timeit(f6, tile_i, dpair, pids, reps=3)
        print(f"3-key sort of {frac:.0%} ({m/1e6:.1f}M):    {t:8.2f} ms")


if __name__ == "__main__":
    main()
