"""Sub-stage timing of build_home_layout at bench scale (r3: the stage
measured 111 ms total — where does it go?).

Mirrors the internals of homesort.build_home_layout (exact mode) as
separately-jitted pieces. Usage: python tools/probe_homesort2.py
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
    from gsjax.render.common import depth_bits, tile_rect
    from gsjax.render.homesort import (
        _block_qmin, _i2f, _f2i, resolve_fat_caps,
    )
    from gsjax.render.project import project

    cfg = RenderConfig(backend="stream")
    g = bonsai_like(n=args.n, sh_degree=0)
    cam = bench_camera(width=W, height=H)
    p = jax.jit(lambda g: project(g, cam, cfg))(g)

    n = p.depth.shape[0]
    tiles_x, tiles_y = cfg.tiles_x(cam.width), cfg.tiles_y(cam.height)
    span, h = cfg.tile_span, cfg.tile_span // 2
    ts = cfg.tile_size
    fat_cap, live_cap = resolve_fat_caps(n, cfg)
    t_sent = jnp.int32(tiles_x * tiles_y)
    nt, nh = n + fat_cap, n + live_cap
    print(f"# n={n} fat_cap={fat_cap} live_cap={live_cap} nt={nt} nh={nh}")

    sg = jax.lax.stop_gradient

    def enum_stage(p):
        mean2d, radius, depth, valid = sg(p.mean2d), sg(p.radius), sg(p.depth), p.valid
        x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y, ts)
        on = valid & (x1 > x0) & (y1 > y0)
        sbx = -(-(x1 - x0) // span)
        sby = -(-(y1 - y0) // span)
        nb_full = jnp.where(on, sbx * sby, 1)
        n_blocks = jnp.minimum(nb_full, cfg.fat_max_blocks)
        n_ex = jnp.where(on & (n_blocks > 1), n_blocks - 1, 0)
        base = jnp.cumsum(n_ex) - n_ex
        is_fat = on & (n_ex > 0)
        marks = (jnp.zeros((fat_cap + 1,), jnp.int32)
                 .at[jnp.where(is_fat, base, fat_cap)].add(1, mode="drop"))
        r = jnp.cumsum(marks[:fat_cap]) - 1
        fat_rank = jnp.cumsum(is_fat.astype(jnp.int32)) - 1
        prank = (jnp.zeros((fat_cap + 1,), jnp.int32)
                 .at[jnp.where(is_fat & (base < fat_cap), fat_rank, fat_cap)]
                 .set(jnp.arange(n, dtype=jnp.int32), mode="drop"))
        parent = prank[jnp.clip(r, 0, fat_cap - 1)]
        return parent, base, (x0, y0, x1, y1, on, sbx)

    f1 = jax.jit(enum_stage)
    t, (parent, base, geo) = timeit(f1, p, reps=args.reps)
    print(f"ragged enumeration (cumsums+marks+ranks): {t:8.2f} ms")

    def gather_stage(p, parent, geo):
        x0, y0, x1, y1, on, sbx = geo
        pcols = jnp.concatenate(
            [_i2f(jnp.stack([jnp.zeros_like(x0), sbx, x0, y0, x1, y1], -1)),
             sg(p.mean2d), p.conic, p.opacity[:, None], sg(p.depth)[:, None],
             p.radius[:, None], p.rgb], axis=-1)
        return sg(pcols)[parent]

    f2 = jax.jit(gather_stage)
    t, pg = timeit(f2, p, parent, geo, reps=args.reps)
    print(f"merged parent gather [F={fat_cap}, 17]:   {t:8.2f} ms")

    def tailmath_stage(pg, base, geo, p):
        x0, y0, x1, y1, on, sbx = geo
        gi = _f2i(pg[:, 0:6])
        gsbx = jnp.maximum(gi[:, 1], 1)
        gx0, gy0, gx1, gy1 = gi[:, 2], gi[:, 3], gi[:, 4], gi[:, 5]
        lanes = jnp.arange(fat_cap, dtype=jnp.int32)
        b = lanes + 1
        bx, by = b % gsbx, b // gsbx
        cwx0 = gx0 + span * bx
        cwx1 = jnp.minimum(cwx0 + span, gx1)
        cwy0 = gy0 + span * by
        cwy1 = jnp.minimum(cwy0 + span, gy1)
        thr = 2.0 * jnp.log(jnp.maximum(pg[:, 11], cfg.alpha_min) / cfg.alpha_min) + 1e-3
        qmin = _block_qmin(pg[:, 6], pg[:, 7], pg[:, 8], pg[:, 9], pg[:, 10],
                           cwx0, cwx1, cwy0, cwy1, float(ts))
        tail_ok = (lanes < fat_cap) & (qmin <= thr)
        chx = jnp.minimum(cwx0 + h, tiles_x - 1)
        chy = jnp.minimum(cwy0 + h, tiles_y - 1)
        home_key = jnp.where(tail_ok, chy * tiles_x + chx, t_sent)
        return home_key, depth_bits(jnp.where(tail_ok, pg[:, 12], 1.0))

    f3 = jax.jit(tailmath_stage)
    t, (hk_tail, dk_tail) = timeit(f3, pg, base, geo, p, reps=args.reps)
    print(f"tail block math + cull:                   {t:8.2f} ms")

    hk = jnp.concatenate([jnp.zeros((n,), jnp.int32), hk_tail])
    dk = jnp.concatenate([depth_bits(sg(p.depth)), dk_tail])

    def sort_stage(hk, dk):
        return jax.lax.sort(
            (hk, dk, jnp.arange(nt, dtype=jnp.int32)), num_keys=3,
            is_stable=False)

    f4 = jax.jit(sort_stage)
    t, (hs, _, perm_full) = timeit(f4, hk, dk, reps=args.reps)
    print(f"3-key (home,depth,idx) sort nt={nt}: {t:8.2f} ms")

    def inv_sort_stage(perm_full):
        _, inv = jax.lax.sort(
            (perm_full, jnp.arange(nt, dtype=jnp.int32)), num_keys=2,
            is_stable=False)
        return inv

    f5 = jax.jit(inv_sort_stage)
    t, _ = timeit(f5, perm_full, reps=args.reps)
    print(f"inverse-perm SORT nt={nt}:          {t:8.2f} ms")

    def inv_scatter_stage(perm_full):
        return (jnp.zeros((nt,), jnp.int32)
                .at[perm_full].set(jnp.arange(nt, dtype=jnp.int32)))

    f6 = jax.jit(inv_scatter_stage)
    t, _ = timeit(f6, perm_full, reps=args.reps)
    print(f"inverse-perm SCATTER-SET nt={nt}:   {t:8.2f} ms")

    def relayout_stage(p, pg, perm_full):
        perm = perm_full[:nh]
        packed_n = jnp.concatenate(
            [p.mean2d, p.depth[:, None], p.conic, p.radius[:, None],
             p.rgb, p.opacity[:, None]], axis=-1)
        tail_packed = jnp.concatenate(
            [pg[:, 6:8], pg[:, 12:13], pg[:, 8:11], pg[:, 13:14],
             pg[:, 14:17], pg[:, 11:12]], axis=-1)
        full = jnp.concatenate([packed_n, sg(tail_packed)])
        return full[perm]

    f7 = jax.jit(relayout_stage)
    t, _ = timeit(f7, p, pg, perm_full, reps=args.reps)
    print(f"relayout row gather [nh={nh}, 11]:  {t:8.2f} ms")

    def seg_stage(hs):
        return jnp.searchsorted(
            jnp.minimum(hs[:nh], t_sent),
            jnp.arange(tiles_x * tiles_y + 2, dtype=jnp.int32), side="left")

    f8 = jax.jit(seg_stage)
    t, _ = timeit(f8, hs, reps=args.reps)
    print(f"seg_starts searchsorted:                  {t:8.2f} ms")


if __name__ == "__main__":
    main()
