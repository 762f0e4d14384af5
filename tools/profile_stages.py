"""Per-stage timing of the render pipeline on the current backend.

Each stage is jitted separately (pays ~13 ms axon dispatch latency once
per call; timings subtract the measured dispatch floor). Usage:

  python tools/profile_stages.py [--n 1200000] [--wh 1920x1080] [--reps 5]
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
    # block_until_ready does not reliably wait through the axon tunnel;
    # a device_get of one element does (it waits for the whole buffer)
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
    ap.add_argument("--cap", type=int, default=1024)
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.render.binning import build_tile_bins
    from gsjax.render.composite import blend_padded, build_padded_lists
    from gsjax.render.project import project

    cfg = RenderConfig(tile_list_cap=args.cap, chunk=128)
    g = bonsai_like(n=args.n)
    cam = bench_camera(width=W, height=H)

    # dispatch floor
    noop = jax.jit(lambda x: x + 1.0)
    floor_ms, _ = timeit(noop, jnp.zeros((8, 128)), reps=args.reps)
    print(f"dispatch floor      : {floor_ms:8.2f} ms")

    f_proj = jax.jit(lambda g: project(g, cam, cfg))
    t, p = timeit(f_proj, g, reps=args.reps)
    print(f"project             : {t - floor_ms:8.2f} ms")

    f_bins = jax.jit(lambda p: build_tile_bins(p, cam, cfg))
    t, bins = timeit(f_bins, p, reps=args.reps)
    print(f"binning (pair sort) : {t - floor_ms:8.2f} ms   "
          f"pairs={int(bins.n_pairs)} clamped={int(bins.n_clamped)} "
          f"overflow={int(np.sum(np.maximum(np.asarray(bins.tile_counts) - args.cap, 0)))}")

    f_lists = jax.jit(lambda p, bins: build_padded_lists(p, bins, cfg))
    t, (att, counts) = timeit(f_lists, p, bins, reps=args.reps)
    print(f"padded-list gather  : {t - floor_ms:8.2f} ms   att={att.shape}")
    cnt = np.asarray(counts)
    print(f"  counts: mean={cnt.mean():.0f} p50={np.percentile(cnt,50):.0f} "
          f"p95={np.percentile(cnt,95):.0f} max={cnt.max()} "
          f"frac_at_cap={(cnt >= args.cap).mean():.3f}")

    tiles_x, band_rows = bins.tiles_x, bins.band_rows
    f_xla = jax.jit(lambda att, counts, ty0: blend_padded(att, counts, ty0, tiles_x, band_rows, cfg))
    t, _ = timeit(f_xla, att, counts, bins.ty0, reps=max(1, args.reps // 2))
    print(f"blend (xla)         : {t - floor_ms:8.2f} ms")

if __name__ == "__main__" and "--slots" not in sys.argv and "--stream" not in sys.argv:
    main()


def profile_slots():
    """Slot-path stage timings (python tools/profile_stages.py --slots)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", action="store_true")
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--wh", default="1920x1080")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--pair-cap", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.render.binning import build_tile_bins
    from gsjax.render.composite import att_table, clipped_pair_stream
    from gsjax.render.pallas_flat import chunked_pair_attrs, blend_slots, _bwd_call
    from gsjax.render.project import project

    cfg = RenderConfig(pair_cap=args.pair_cap, chunk=args.chunk)
    g = bonsai_like(n=args.n)
    cam = bench_camera(width=W, height=H)

    f_proj = jax.jit(lambda g: project(g, cam, cfg))
    t, p = timeit(f_proj, g, reps=args.reps)
    print(f"project             : {t:8.2f} ms")

    f_bins = jax.jit(lambda p: build_tile_bins(p, cam, cfg))
    t, bins = timeit(f_bins, p, reps=args.reps)
    print(f"binning (pair sort) : {t:8.2f} ms   pairs={int(bins.n_pairs)}")

    f_clip = jax.jit(lambda bins: clipped_pair_stream(bins, cfg))
    t, (pid, starts, ndrop) = timeit(f_clip, bins, reps=args.reps)
    print(f"clip stream         : {t:8.2f} ms   S={pid.shape[0]} dropped={int(ndrop)}")

    k_slots = cfg.tile_span * cfg.tile_span
    f_attr = jax.jit(lambda p, pid, starts: chunked_pair_attrs(att_table(p), pid, starts, cfg, k_slots))
    t, (att_al, tile_of, cbase) = timeit(f_attr, p, pid, starts, reps=args.reps)
    used = int(np.asarray(cbase)[-1])
    print(f"slot attrs (gather) : {t:8.2f} ms   NCB={att_al.shape[0]} used={used}")

    tiles_x, band_rows = bins.tiles_x, bins.band_rows
    f_fwd = jax.jit(lambda att_al, starts, cbase, tile_of, ty0: blend_slots(
        att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg))
    t, (img_t, T_t) = timeit(f_fwd, att_al, starts, cbase, tile_of, bins.ty0, reps=args.reps)
    print(f"blend fwd (pallas)  : {t:8.2f} ms")

    import jax.numpy as jnp
    ct_img = jnp.swapaxes(jnp.ones_like(img_t), 1, 2)
    ct_T = jnp.ones_like(T_t)
    from gsjax.render.pallas_flat import _fwd_call
    fwd_out = jax.jit(lambda *a: _fwd_call(*a, tiles_x, band_rows, cfg))(
        att_al, starts, cbase, tile_of, bins.ty0)
    f_bwd = jax.jit(lambda att_al, starts, cbase, tile_of, ty0, fwd_out, ci, cT: _bwd_call(
        att_al, starts, cbase, tile_of, ty0, fwd_out, ci, cT, tiles_x, band_rows, cfg))
    t, datt = timeit(f_bwd, att_al, starts, cbase, tile_of, bins.ty0, fwd_out, ct_img, ct_T, reps=args.reps)
    print(f"blend bwd (pallas)  : {t:8.2f} ms")

    # pair-grad scatter-set + K reduce back to splats
    N = args.n
    from gsjax.render.pallas_flat import _gather_bwd
    f_scat = jax.jit(lambda datt, pid_al: _gather_bwd(k_slots, (N, pid_al), datt)[0])
    # rebuild pid_al the way chunked_pair_attrs does
    from gsjax.render.pallas_flat import _slot_tables
    ncb = att_al.shape[0]
    tile_of2, win, cbase2, valid_count = jax.jit(
        lambda starts: _slot_tables(starts, cfg.chunk, ncb))(starts)
    pid_pad = jnp.concatenate([pid, jnp.zeros((cfg.chunk,), pid.dtype)])
    pid_al = jax.vmap(lambda s: jax.lax.dynamic_slice(pid_pad, (s,), (cfg.chunk,)))(win)
    lanev = jnp.arange(cfg.chunk, dtype=jnp.int32)[None, :]
    pid_al = jnp.where(lanev < valid_count[:, None], pid_al, jnp.int32(N * k_slots))
    t, _ = timeit(f_scat, datt, pid_al, reps=args.reps)
    print(f"grad unsort+reduce  : {t:8.2f} ms")


if __name__ == "__main__" and "--slots" in sys.argv:
    profile_slots()
    sys.exit(0)


def profile_stream():
    """Stream-path stage timings (python tools/profile_stages.py --stream)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--wh", default="1920x1080")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--pair-cap", type=int, default=None)
    ap.add_argument("--oh-cache", action="store_true")
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

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

    cfg = RenderConfig(backend="stream", chunk=args.chunk,
                       pair_cap=args.pair_cap,
                       stream_oh_cache=args.oh_cache)
    g = bonsai_like(n=args.n)
    cam = bench_camera(width=W, height=H)

    f_proj = jax.jit(lambda g: project(g, cam, cfg))
    t, p0 = timeit(f_proj, g, reps=args.reps)
    print(f"project             : {t:8.2f} ms")

    f_home = jax.jit(lambda p0: build_home_layout(p0, cam, cfg))
    t, (p, layout) = timeit(f_home, p0, reps=args.reps)
    print(f"home sort+relayout  : {t:8.2f} ms   "
          f"fat_ovf={int(layout.n_fat_overflow)}")

    f_bins = jax.jit(
        lambda p, layout: build_tile_bins(p, cam, cfg, anchor="home", layout=layout)
    )
    t, bins = timeit(f_bins, p, layout, reps=args.reps)
    print(f"binning (pair sort) : {t:8.2f} ms   pairs={int(bins.n_pairs)}")

    k = cfg.tile_span**2
    f_clip = jax.jit(lambda bins: clipped_pair_stream(bins, cfg))
    t, (pid, starts, nd) = timeit(f_clip, bins, reps=args.reps)
    print(f"clip stream         : {t:8.2f} ms   S={pid.shape[0]}")

    # repack pads carry sid = nh_pad; mask them out of the window bounds
    # exactly like composite_tiles_stream does
    sid_dead = None
    if cfg.pair_repack and not cfg.footprint_clamp:
        from gsjax.render.binning import _EXPAND_R

        sid_dead = -(-int(p.depth.shape[0]) // _EXPAND_R) * _EXPAND_R
    f_slots = jax.jit(
        lambda pid, starts: packed_pid_windows(pid, starts, cfg, sid_dead)
    )
    t, (pidwin, tile_of, cbase) = timeit(f_slots, pid, starts, reps=args.reps)
    print(f"pid windows         : {t:8.2f} ms   NCB={pidwin.shape[0]}")

    f_blk = jax.jit(lambda ss: band_blocks(ss, 0, bins.tiles_x, layout.tiles_y, bins.band_rows, cfg))
    t, (blktab, novf) = timeit(f_blk, layout.seg_starts, reps=args.reps)
    print(f"band blocks         : {t:8.2f} ms   ovf={int(novf)}")

    ts = float(cfg.tile_size)
    htx = layout.home_x.astype(jnp.float32)
    hty = layout.home_y.astype(jnp.float32)
    cols = (p.mean2d[:, 0] - htx * ts, p.mean2d[:, 1] - hty * ts,
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], p.opacity)
    n_pad = _table_pad(int(p.depth.shape[0]), cfg)
    f_tab = jax.jit(lambda cols: att_cols_table(cols, n_pad))
    t, att_tab = timeit(f_tab, cols, reps=args.reps)
    print(f"att table (bf16 hi/lo): {t:6.2f} ms")

    tiles_x, band_rows = bins.tiles_x, bins.band_rows
    f_fwd = jax.jit(lambda *a: _fwd_call(*a, tiles_x, band_rows, cfg))
    t, fwd_out = timeit(f_fwd, att_tab, pidwin, blktab, starts, cbase,
                        tile_of, bins.ty0, reps=args.reps)
    print(f"stream fwd kernel   : {t:8.2f} ms")

    n_px = cfg.tile_size * cfg.tile_size
    ct_img = jnp.ones((tiles_x * band_rows, 3, n_px), jnp.float32)
    ct_T = jnp.ones((tiles_x * band_rows, n_px), jnp.float32)
    f_bwd = jax.jit(lambda *a: _bwd_call(*a, tiles_x, band_rows, cfg))
    t, dgrad = timeit(f_bwd, att_tab, pidwin, blktab, starts, cbase,
                      tile_of, bins.ty0, fwd_out, ct_img, ct_T, reps=args.reps)
    print(f"stream bwd kernel   : {t:8.2f} ms")


if __name__ == "__main__" and "--stream" in sys.argv:
    profile_stream()
    sys.exit(0)
