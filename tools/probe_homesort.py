"""Microprofile build_home_layout's internals on TPU — the 115 ms
regression hunt (r1 home sort was 15-19 ms; exact-footprint mode made it
115). Times each sub-piece in isolation.

Usage: python tools/probe_homesort.py [--n 1200000]
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
    from gsjax.render.common import depth_bits, tile_rect
    from gsjax.render.homesort import build_home_layout, resolve_fat_caps
    from gsjax.render.project import project

    cfg = RenderConfig(backend="stream")
    g = bonsai_like(n=args.n)
    cam = bench_camera()
    p = jax.jit(lambda g: project(g, cam, cfg))(g)
    _sync(p.mean2d)

    noop = jax.jit(lambda x: x + 1.0)
    floor, _ = timeit(noop, jnp.zeros((8, 128)), reps=args.reps)
    print(f"dispatch floor       : {floor:7.2f} ms")

    t, _ = timeit(
        jax.jit(lambda p: build_home_layout(p, cam, cfg)), p, reps=args.reps
    )
    print(f"build_home_layout    : {t - floor:7.2f} ms")

    n = args.n
    tiles_x, tiles_y = cfg.tiles_x(cam.width), cfg.tiles_y(cam.height)
    span = cfg.tile_span
    fsc, fat_cap = resolve_fat_caps(n, cfg)
    nh = n + fat_cap
    print(f"  fsc={fsc} fat_cap={fat_cap} NH={nh}")

    # --- stage 1: rects + block counts -------------------------------------
    def rects(p):
        x0, y0, x1, y1 = tile_rect(
            p.mean2d, p.radius, tiles_x, tiles_y, cfg.tile_size
        )
        on = p.valid & (x1 > x0) & (y1 > y0)
        nbx = -(-(x1 - x0) // span)
        nby = -(-(y1 - y0) // span)
        return x0, y0, x1, y1, on, nbx, nby

    t, (x0, y0, x1, y1, on, nbx, nby) = timeit(jax.jit(rects), p, reps=args.reps)
    print(f"rects+counts         : {t - floor:7.2f} ms")
    nb = np.asarray(jnp.where(on, nbx * nby, 1))
    print(
        f"  fat splats (nb>1)  : {int((nb > 1).sum())}   "
        f"copies needed: {int(np.maximum(nb - 1, 0).sum())}   "
        f"p99 blocks={int(np.percentile(nb, 99))} max={nb.max()}"
    )

    # --- stage 2: fat enumeration ------------------------------------------
    def fat_enum(x0, y0, x1, y1, on, nbx, nby):
        n_blocks = jnp.where(on, nbx * nby, 1)
        is_fat = on & (n_blocks > 1)
        fat_rank = jnp.cumsum(is_fat.astype(jnp.int32)) - 1
        slot = jnp.where(is_fat & (fat_rank < fsc), fat_rank, fsc)
        fat_id = (
            jnp.full((fsc + 1,), n, jnp.int32)
            .at[slot]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )[:fsc]
        return fat_rank, fat_id

    t, (fat_rank, fat_id) = timeit(
        jax.jit(fat_enum), x0, y0, x1, y1, on, nbx, nby, reps=args.reps
    )
    print(f"fat cumsum+ids       : {t - floor:7.2f} ms")

    # --- stage 3: tail scatters --------------------------------------------
    maxb = cfg.fat_max_blocks

    def tail(x0, y0, x1, y1, on, nbx, nby, fat_id):
        n_blocks = jnp.where(on, nbx * nby, 1)
        fat_ok = fat_id < n
        fid = jnp.minimum(fat_id, n - 1)
        fx0, fy0 = x0[fid], y0[fid]
        fx1, fy1 = x1[fid], y1[fid]
        fnbx = nbx[fid]
        fnb = jnp.where(fat_ok, n_blocks[fid], 1)
        fnb_cap = jnp.minimum(fnb, maxb)
        n_ex = fnb_cap - 1
        base = jnp.cumsum(n_ex) - n_ex
        b = jnp.arange(1, maxb, dtype=jnp.int32)[None, :]
        keep = fat_ok[:, None] & (b < fnb_cap[:, None])
        dest = jnp.where(keep, base[:, None] + b - 1, fat_cap)
        bx = b % fnbx[:, None]
        by = b // fnbx[:, None]
        h = span // 2
        chx = jnp.minimum(fx0[:, None] + span * bx + h, tiles_x - 1)
        chy = jnp.minimum(fy0[:, None] + span * by + h, tiles_y - 1)
        cw = jnp.stack(
            [
                fx0[:, None] + span * bx,
                jnp.minimum(fx0[:, None] + span * bx + span, fx1[:, None]),
                fy0[:, None] + span * by,
                jnp.minimum(fy0[:, None] + span * by + span, fy1[:, None]),
            ],
            axis=-1,
        )
        tail_parent = (
            jnp.zeros((fat_cap + 1,), jnp.int32)
            .at[dest]
            .set(jnp.broadcast_to(fid[:, None], dest.shape), mode="drop")
        )[:fat_cap]
        tail_hx = (
            jnp.zeros((fat_cap + 1,), jnp.int32).at[dest].set(chx, mode="drop")
        )[:fat_cap]
        tail_hy = (
            jnp.zeros((fat_cap + 1,), jnp.int32).at[dest].set(chy, mode="drop")
        )[:fat_cap]
        tail_win = (
            jnp.zeros((fat_cap + 1, 4), jnp.int32)
            .at[dest]
            .set(cw, mode="drop")
        )[:fat_cap]
        return tail_parent, tail_hx, tail_hy, tail_win

    t, _ = timeit(
        jax.jit(tail), x0, y0, x1, y1, on, nbx, nby, fat_id, reps=args.reps
    )
    print(f"tail scatters        : {t - floor:7.2f} ms   "
          f"(dest grid {fsc}x{maxb - 1} = {fsc * (maxb - 1)})")

    # --- stage 4: the sorts ------------------------------------------------
    hk = jnp.where(on, y0 * tiles_x + x0, tiles_x * tiles_y).astype(jnp.int32)
    hk_ext = jnp.concatenate([hk, jnp.zeros((fat_cap,), jnp.int32)])
    dk = depth_bits(p.depth)
    dk_ext = jnp.concatenate([dk, dk[:fat_cap]])

    def sorts(hk_ext, dk_ext):
        idx = jnp.arange(nh, dtype=jnp.int32)
        hs, _, perm = jax.lax.sort(
            (hk_ext, dk_ext, idx), num_keys=3, is_stable=False
        )
        _, inv = jax.lax.sort((perm, idx), num_keys=2, is_stable=False)
        return hs, perm, inv

    t, (hs, perm, inv) = timeit(jax.jit(sorts), hk_ext, dk_ext, reps=args.reps)
    print(f"3-op + inverse sorts : {t - floor:7.2f} ms   (NH={nh})")

    # --- stage 5: the row gather -------------------------------------------
    packed = jnp.concatenate(
        [p.mean2d, p.depth[:, None], p.conic, p.radius[:, None], p.rgb,
         p.opacity[:, None]],
        axis=-1,
    )
    src = jnp.concatenate([jnp.arange(n, dtype=jnp.int32)] * 1 + [
        jnp.zeros((fat_cap,), jnp.int32)])[jnp.asarray(perm)]

    t, _ = timeit(jax.jit(lambda x, s: x[s]), packed, src, reps=args.reps)
    print(f"packed row gather    : {t - floor:7.2f} ms   [{nh}, 11]")

    # win gather [NH, 4]
    win = jnp.zeros((nh, 4), jnp.int32)
    t, _ = timeit(jax.jit(lambda w, pm: w[pm]), win, perm, reps=args.reps)
    print(f"win row gather       : {t - floor:7.2f} ms   [{nh}, 4]")

    # searchsorted seg starts
    t, _ = timeit(
        jax.jit(
            lambda hs: jnp.searchsorted(
                hs, jnp.arange(tiles_x * tiles_y + 2, dtype=jnp.int32),
                side="left",
            )
        ),
        hs,
        reps=args.reps,
    )
    print(f"seg searchsorted     : {t - floor:7.2f} ms")


if __name__ == "__main__":
    main()
