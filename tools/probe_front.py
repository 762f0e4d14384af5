"""Decompose the exact-mode front-end (homesort v2 + binning) on TPU.

profile_stages r2 showed home sort 147 ms and binning 154 ms at the
1080p bench — this isolates their internals to find the whales.

Usage: python tools/probe_front.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.render.binning import build_tile_bins
    from gsjax.render.common import depth_bits, tile_rect
    from gsjax.render.homesort import build_home_layout, resolve_fat_caps
    from gsjax.render.project import project

    cfg = RenderConfig(backend="stream")
    cam = bench_camera()
    n = 1_200_000
    g = bonsai_like(n=n)
    p = jax.jit(lambda g: project(g, cam, cfg))(g)
    _sync(p.mean2d)

    noop = jax.jit(lambda x: x + 1.0)
    floor, _ = timeit(noop, jnp.zeros((8, 128)))
    print(f"dispatch floor       : {floor:7.2f} ms")

    t, (ph, layout) = timeit(
        jax.jit(lambda p: build_home_layout(p, cam, cfg)), p
    )
    print(f"build_home_layout    : {t - floor:7.2f} ms")

    tiles_x, tiles_y = cfg.tiles_x(cam.width), cfg.tiles_y(cam.height)
    fat_cap, live_cap = resolve_fat_caps(n, cfg)
    nt, nh = n + fat_cap, n + live_cap
    print(f"  fat_cap={fat_cap} live_cap={live_cap} nt={nt} nh={nh}")

    # --- homesort pieces ---------------------------------------------------

    span = cfg.tile_span
    sg = jax.lax.stop_gradient

    def enum_phase(p):
        """everything before the sort (rects, ragged enum, cull, keys)."""
        mean2d, radius, depth = sg(p.mean2d), sg(p.radius), sg(p.depth)
        x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y, cfg.tile_size)
        on = p.valid & (x1 > x0) & (y1 > y0)
        sbx = -(-(x1 - x0) // span)
        sby = -(-(y1 - y0) // span)
        nb_full = jnp.where(on, sbx * sby, 1)
        n_blocks = jnp.minimum(nb_full, cfg.fat_max_blocks)
        n_ex = jnp.where(on & (n_blocks > 1), n_blocks - 1, 0)
        base = jnp.cumsum(n_ex) - n_ex
        is_fat = n_ex > 0
        marks = (
            jnp.zeros((fat_cap + 1,), jnp.int32)
            .at[jnp.where(is_fat, base, fat_cap)]
            .add(1, mode="drop")
        )
        r = jnp.cumsum(marks[:fat_cap]) - 1
        fat_rank = jnp.cumsum(is_fat.astype(jnp.int32)) - 1
        prank = (
            jnp.zeros((fat_cap + 1,), jnp.int32)
            .at[jnp.where(is_fat & (base < fat_cap), fat_rank, fat_cap)]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        parent = prank[jnp.clip(r, 0, fat_cap - 1)]
        pcols = jnp.concatenate(
            [
                jnp.stack([base, sbx, x0, y0, x1, y1], -1).astype(jnp.float32),
                mean2d, p.conic, p.opacity[:, None], depth[:, None],
            ],
            axis=-1,
        )
        pg = sg(pcols)[parent]
        return parent, pg, base, n_ex

    t, (parent, pg, base, n_ex) = timeit(jax.jit(enum_phase), p)
    print(f"  enum+cumsums+pg gather: {t - floor:7.2f} ms")

    # the two sorts alone at nt
    hk = jnp.where(
        jnp.arange(nt) % 7 != 0, jnp.arange(nt) % (tiles_x * tiles_y),
        tiles_x * tiles_y,
    ).astype(jnp.int32)
    dk = jax.random.randint(jax.random.PRNGKey(0), (nt,), 0, 1 << 30, jnp.int32)

    def sorts(hk, dk):
        hs_, _, perm = jax.lax.sort(
            (hk, dk, jnp.arange(nt, dtype=jnp.int32)), num_keys=3,
            is_stable=False,
        )
        _, inv = jax.lax.sort(
            (perm, jnp.arange(nt, dtype=jnp.int32)), num_keys=2,
            is_stable=False,
        )
        return hs_, perm, inv

    t, _ = timeit(jax.jit(sorts), hk, dk)
    print(f"  3-op + inverse sorts (nt={nt}): {t - floor:7.2f} ms")

    # layout gather [nh, 15]
    full = jnp.ones((nt, 15), jnp.float32)
    permx = jax.random.permutation(jax.random.PRNGKey(1), nt)[:nh]
    t, _ = timeit(jax.jit(lambda f, pm: f[pm]), full, permx)
    print(f"  layout row gather [nh,15]: {t - floor:7.2f} ms")

    # --- binning pieces ----------------------------------------------------
    t, bins = timeit(
        jax.jit(
            lambda ph, layout: build_tile_bins(
                ph, cam, cfg, anchor="home", layout=layout
            )
        ),
        ph, layout,
    )
    print(f"build_tile_bins      : {t - floor:7.2f} ms  pairs={int(bins.n_pairs)}")

    from gsjax.render.binning import INVALID_TILE

    def expansion_only(ph, layout):
        nloc = ph.depth.shape[0]
        k_slots = span * span
        slot = jnp.arange(k_slots, dtype=jnp.int32)
        sx = (slot % span)[None, :]
        sy = (slot // span)[None, :]
        x0w, x1w = layout.win[:, 0], layout.win[:, 1]
        y0w, y1w = layout.win[:, 2], layout.win[:, 3]
        txs = (layout.home_x - 1)[:, None] + sx
        tys = (layout.home_y - 1)[:, None] + sy
        pair_ok = (
            ph.valid[:, None]
            & (txs >= x0w[:, None]) & (txs < x1w[:, None])
            & (tys >= y0w[:, None]) & (tys < y1w[:, None])
        )
        ts_f = float(cfg.tile_size)
        ca, cb, cc = ph.conic[:, 0:1], ph.conic[:, 1:2], ph.conic[:, 2:3]
        thr = 2.0 * jnp.log(
            jnp.maximum(ph.opacity[:, None], cfg.alpha_min) / cfg.alpha_min
        ) + 1e-3
        neg_cb_rcc = -cb / cc
        neg_cb_rca = -cb / ca
        tx_lo = txs.astype(jnp.float32) * ts_f
        ty_lo = tys.astype(jnp.float32) * ts_f
        dxl = tx_lo - ph.mean2d[:, 0:1]
        dxr = dxl + (ts_f - 1.0)
        dyl = ty_lo - ph.mean2d[:, 1:2]
        dyr = dyl + (ts_f - 1.0)
        inside = (dxl <= 0) & (dxr >= 0) & (dyl <= 0) & (dyr >= 0)

        def _ex(dx):
            dy = jnp.clip(neg_cb_rcc * dx, dyl, dyr)
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        def _ey(dy):
            dx = jnp.clip(neg_cb_rca * dy, dxl, dxr)
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        qmin = jnp.minimum(
            jnp.minimum(_ex(dxl), _ex(dxr)), jnp.minimum(_ey(dyl), _ey(dyr))
        )
        qmin = jnp.where(inside, 0.0, qmin)
        pair_ok &= qmin <= thr
        tile_i = (tys * tiles_x + txs).astype(jnp.int32)
        tile_i = jnp.where(pair_ok, tile_i, INVALID_TILE).reshape(-1)
        dbits = jnp.asarray(ph.depth, jnp.float32).view(jnp.int32)
        dpair = jnp.broadcast_to(dbits[:, None], (nloc, k_slots)).reshape(-1)
        return tile_i, dpair

    t, (tile_i, dpair) = timeit(jax.jit(expansion_only), ph, layout)
    print(f"  expansion+cull (no sort): {t - floor:7.2f} ms  S={tile_i.shape[0]}")

    S = tile_i.shape[0]
    pids = jnp.arange(S, dtype=jnp.int32)

    def sort3(tile_i, dpair, pids):
        return jax.lax.sort((tile_i, dpair, pids), num_keys=3, is_stable=False)

    t, (tile_of, _, pid_sorted) = timeit(jax.jit(sort3), tile_i, dpair, pids)
    print(f"  3-op pair sort S={S}: {t - floor:7.2f} ms")

    t, _ = timeit(
        jax.jit(
            lambda t_of: jnp.searchsorted(
                t_of, jnp.arange(tiles_x * tiles_y + 1, dtype=jnp.int32),
                side="left",
            )
        ),
        tile_of,
    )
    print(f"  tile_starts searchsorted: {t - floor:7.2f} ms")


if __name__ == "__main__":
    main()
