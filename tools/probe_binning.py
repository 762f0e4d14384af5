"""Break build_tile_bins into sub-stages on the TPU: pair expansion +
ellipse cull math vs the lax.sort vs the segment searchsorted.

Usage: python tools/probe_binning.py [--n 1200000]
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
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.render.binning import INVALID_KEY, build_tile_bins
    from gsjax.render.common import DEPTH_BITS, depth_key, tile_rect
    from gsjax.render.homesort import build_home_layout
    from gsjax.render.project import project

    cfg = RenderConfig(backend="stream")
    g = bonsai_like(n=args.n)
    cam = bench_camera(width=1920, height=1080)
    p = jax.jit(lambda g: project(g, cam, cfg))(g)
    p, layout = jax.jit(lambda p: build_home_layout(p, cam, cfg))(p)

    noop = jax.jit(lambda x: x + 1)
    floor, _ = timeit(noop, jnp.zeros((8, 128), jnp.int32))
    print(f"dispatch floor  : {floor:7.2f} ms")

    # full binning
    f_full = jax.jit(
        lambda p, layout: build_tile_bins(p, cam, cfg, anchor="home", layout=layout)
    )
    t, bins = timeit(f_full, p, layout, reps=args.reps)
    print(f"binning (full)  : {t - floor:7.2f} ms   pairs={int(bins.n_pairs)}")

    # keys only (expansion + culls + key packing, no sort)
    span = cfg.tile_span
    k_slots = span * span
    tiles_x = cfg.tiles_x(cam.width)
    tiles_y = cfg.tiles_y(cam.height)

    def keys_only(p, layout):
        slot = jnp.arange(k_slots, dtype=jnp.int32)
        sx = (slot % span)[None, :]
        sy = (slot // span)[None, :]
        x0, x1 = layout.win[:, 0], layout.win[:, 1]
        y0, y1 = layout.win[:, 2], layout.win[:, 3]
        txs = (layout.home_x - 1)[:, None] + sx
        tys = (layout.home_y - 1)[:, None] + sy
        pair_ok = (
            p.valid[:, None]
            & (txs >= x0[:, None]) & (txs < x1[:, None])
            & (tys >= y0[:, None]) & (tys < y1[:, None])
            & (tys >= 0) & (tys < tiles_y)
        )
        ts_f = float(cfg.tile_size)
        ca, cb, cc = p.conic[:, 0:1], p.conic[:, 1:2], p.conic[:, 2:3]
        thr = 2.0 * jnp.log(
            jnp.maximum(p.opacity[:, None], cfg.alpha_min) / cfg.alpha_min
        ) + 1e-3
        tx_lo = txs.astype(jnp.float32) * ts_f
        ty_lo = tys.astype(jnp.float32) * ts_f
        dxl = tx_lo - p.mean2d[:, 0:1]
        dxr = dxl + (ts_f - 1.0)
        dyl = ty_lo - p.mean2d[:, 1:2]
        dyr = dyl + (ts_f - 1.0)
        inside = (dxl <= 0) & (dxr >= 0) & (dyl <= 0) & (dyr >= 0)

        def _edge_x(dx):
            dy = jnp.clip(-cb * dx / cc, dyl, dyr)
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        def _edge_y(dy):
            dx = jnp.clip(-cb * dy / ca, dxl, dxr)
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        qmin = jnp.minimum(
            jnp.minimum(_edge_x(dxl), _edge_x(dxr)),
            jnp.minimum(_edge_y(dyl), _edge_y(dyr)),
        )
        qmin = jnp.where(inside, 0.0, qmin)
        pair_ok &= qmin <= thr
        tile = (tys * tiles_x + txs).astype(jnp.uint32)
        keys = (tile << jnp.uint32(DEPTH_BITS)) | depth_key(p.depth)[:, None]
        return jnp.where(pair_ok, keys, INVALID_KEY).reshape(-1)

    f_keys = jax.jit(keys_only)
    t, keys = timeit(f_keys, p, layout, reps=args.reps)
    print(f"keys only       : {t - floor:7.2f} ms")

    # same without the ellipse cull (rect-only test)
    def keys_rect(p, layout):
        slot = jnp.arange(k_slots, dtype=jnp.int32)
        sx = (slot % span)[None, :]
        sy = (slot // span)[None, :]
        x0, x1 = layout.win[:, 0], layout.win[:, 1]
        y0, y1 = layout.win[:, 2], layout.win[:, 3]
        txs = (layout.home_x - 1)[:, None] + sx
        tys = (layout.home_y - 1)[:, None] + sy
        pair_ok = (
            p.valid[:, None]
            & (txs >= x0[:, None]) & (txs < x1[:, None])
            & (tys >= y0[:, None]) & (tys < y1[:, None])
            & (tys >= 0) & (tys < tiles_y)
        )
        tile = (tys * tiles_x + txs).astype(jnp.uint32)
        keys = (tile << jnp.uint32(DEPTH_BITS)) | depth_key(p.depth)[:, None]
        return jnp.where(pair_ok, keys, INVALID_KEY).reshape(-1)

    f_rect = jax.jit(keys_rect)
    t, keys_r = timeit(f_rect, p, layout, reps=args.reps)
    nv = int(jnp.sum(keys != INVALID_KEY))
    nr = int(jnp.sum(keys_r != INVALID_KEY))
    print(f"keys rect-only  : {t - floor:7.2f} ms   pairs {nr} vs culled {nv}")

    # AABB ellipse cull variant (per-splat half-extents, 4 compares/pair)
    def keys_aabb(p, layout):
        slot = jnp.arange(k_slots, dtype=jnp.int32)
        sx = (slot % span)[None, :]
        sy = (slot // span)[None, :]
        x0, x1 = layout.win[:, 0], layout.win[:, 1]
        y0, y1 = layout.win[:, 2], layout.win[:, 3]
        txs = (layout.home_x - 1)[:, None] + sx
        tys = (layout.home_y - 1)[:, None] + sy
        pair_ok = (
            p.valid[:, None]
            & (txs >= x0[:, None]) & (txs < x1[:, None])
            & (tys >= y0[:, None]) & (tys < y1[:, None])
            & (tys >= 0) & (tys < tiles_y)
        )
        ca, cb, cc = p.conic[:, 0], p.conic[:, 1], p.conic[:, 2]
        det = ca * cc - cb * cb
        thr = 2.0 * jnp.log(
            jnp.maximum(p.opacity, cfg.alpha_min) / cfg.alpha_min
        ) + 1e-3
        ex = jnp.sqrt(jnp.maximum(thr * cc / jnp.maximum(det, 1e-12), 0.0))
        ey = jnp.sqrt(jnp.maximum(thr * ca / jnp.maximum(det, 1e-12), 0.0))
        ts_f = float(cfg.tile_size)
        tx_lo = txs.astype(jnp.float32) * ts_f
        ty_lo = tys.astype(jnp.float32) * ts_f
        mx, my = p.mean2d[:, 0:1], p.mean2d[:, 1:2]
        pair_ok &= (
            (tx_lo <= mx + ex[:, None])
            & (tx_lo + (ts_f - 1.0) >= mx - ex[:, None])
            & (ty_lo <= my + ey[:, None])
            & (ty_lo + (ts_f - 1.0) >= my - ey[:, None])
        )
        tile = (tys * tiles_x + txs).astype(jnp.uint32)
        keys = (tile << jnp.uint32(DEPTH_BITS)) | depth_key(p.depth)[:, None]
        return jnp.where(pair_ok, keys, INVALID_KEY).reshape(-1)

    f_aabb = jax.jit(keys_aabb)
    t, keys_a = timeit(f_aabb, p, layout, reps=args.reps)
    na = int(jnp.sum(keys_a != INVALID_KEY))
    print(f"keys aabb cull  : {t - floor:7.2f} ms   pairs {na}")

    # sort of the produced keys
    pids = jnp.arange(keys.shape[0], dtype=jnp.int32)
    f_sort = jax.jit(
        lambda k, p: jax.lax.sort((k, p), num_keys=2, is_stable=False)
    )
    t, (ks, _) = timeit(f_sort, keys, pids, reps=args.reps)
    print(f"sort real keys  : {t - floor:7.2f} ms")

    # searchsorted
    n_tiles = tiles_x * tiles_y
    f_ss = jax.jit(
        lambda ks: jnp.searchsorted(
            (ks >> jnp.uint32(DEPTH_BITS)).astype(jnp.int32),
            jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left",
        )
    )
    t, _ = timeit(f_ss, ks, reps=args.reps)
    print(f"searchsorted    : {t - floor:7.2f} ms")


if __name__ == "__main__":
    main()
