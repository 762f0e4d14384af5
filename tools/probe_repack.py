"""Probe the bucket-repack pair-sort design (render/DESIGN.md roadmap #1).

The production pair sort is one 1-D 3-operand lax.sort over ~24.3M slots
(~95 ms at the 1080p bench). The repack design cuts it into balanced
[R, W] rows (each row = a contiguous range of tiles' candidate runs,
gathered 128/256/512-block-granular from the class-major expansion) and
sorts rows independently — escaping lax.sort's superlinear 1-D scaling.

r3's pencil used SYNTHETIC uniform keys ([512, 47k] 3-op = 2.28 ns/elem)
but the 1-D probe numbers did not transfer to real keys (2.21 probe vs
~4 ns/elem measured in-frame), so this probe uses REALISTIC key
distributions: ~38% live slots with small per-row tile ranges, 62%
INVALID (0x7FFFFFFF) tails, f32-depth-bit second keys.

Usage: python tools/probe_repack.py
"""

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
    return (time.perf_counter() - t0) / reps * 1e3


def realistic_rows(rng, r, w, live_frac=0.38, tiles_per_row=14):
    """Per-row keys: `live_frac` of slots carry a tile id from a small
    per-row range (tiles_per_row consecutive ids, clustered — like
    candidate runs), rest INVALID. Depth = positive f32 bits."""
    base = (np.arange(r, dtype=np.int64) * tiles_per_row).astype(np.int32)
    t_off = rng.integers(0, tiles_per_row, (r, w), dtype=np.int32)
    tiles = base[:, None] + np.sort(t_off, axis=1)  # run-clustered
    live = rng.random((r, w)) < live_frac
    keys = np.where(live, tiles, np.int32(0x7FFFFFFF))
    depth = rng.uniform(0.2, 50.0, (r, w)).astype(np.float32).view(np.int32)
    pid = rng.integers(0, 1 << 24, (r, w), dtype=np.int32)
    return jnp.asarray(keys), jnp.asarray(depth), jnp.asarray(pid)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    noop = jax.jit(lambda x: x + 1)
    floor = timeit(noop, jnp.zeros((8, 128), jnp.int32))
    print(f"dispatch floor       : {floor:7.2f} ms")

    sort3_1d = jax.jit(
        lambda k, d, p: jax.lax.sort((k, d, p), num_keys=3, is_stable=False)
    )
    sort3_2d = jax.jit(
        lambda k, d, p: jax.lax.sort(
            (k, d, p), num_keys=3, is_stable=False, dimension=1
        )
    )

    # 0) calibrate: 1-D 3-op, 24.3M realistic keys (the production sort)
    n = 24_300_000
    k1, d1, p1 = realistic_rows(rng, 1, n, tiles_per_row=8160)
    k1, d1, p1 = k1[0], d1[0], p1[0]
    t = timeit(sort3_1d, k1, d1, p1, reps=3) - floor
    print(f"1D 3-op n=24.3M real : {t:7.2f} ms   {t * 1e6 / n:6.2f} ns/elem")

    # 1) balanced 2-D rows at ~26M total (24.3M + repack slack), several W
    for w in (16384, 32768, 49152, 65536):
        r = -(-26_000_000 // w)
        k, d, p = realistic_rows(rng, r, w, tiles_per_row=max(4, 8160 // r))
        t = timeit(sort3_2d, k, d, p, reps=3) - floor
        tot = r * w
        print(
            f"2D [{r:>5},{w:>6}] 3-op : {t:7.2f} ms   "
            f"{t * 1e6 / tot:6.2f} ns/elem"
        )

    # 1b) uniform-random keys for comparison (the r3 pencil's setting)
    w = 49152
    r = -(-26_000_000 // w)
    ku = jax.random.randint(key, (r, w), 0, 1 << 30, jnp.int32)
    du = jax.random.randint(key, (r, w), 0, 1 << 30, jnp.int32)
    pu = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (r, w))
    t = timeit(sort3_2d, ku, du, jnp.asarray(pu), reps=3) - floor
    print(f"2D [{r:>5},{w:>6}] synth: {t:7.2f} ms   {t * 1e6 / (r*w):6.2f} ns/elem")

    # 2) live-only 2-D rows (~10M total): the prize if compaction happened
    for w in (32768,):
        r = -(-10_000_000 // w)
        k, d, p = realistic_rows(
            rng, r, w, live_frac=1.0, tiles_per_row=max(4, 8160 // r)
        )
        t = timeit(sort3_2d, k, d, p, reps=3) - floor
        tot = r * w
        print(
            f"2D [{r:>5},{w:>6}] live : {t:7.2f} ms   "
            f"{t * 1e6 / tot:6.2f} ns/elem"
        )

    # 3) repack row-gather: gather ~26M elems as G-wide rows from a flat
    #    [24.3M] i32 source (3 arrays: tile, depth, pid)
    src = jnp.asarray(rng.integers(0, 1 << 30, 24_300_032, dtype=np.int32))
    for g in (128, 256, 512):
        nrows_src = src.shape[0] // g
        nidx = 26_000_000 // g
        idx = jnp.asarray(
            np.sort(rng.integers(0, nrows_src, nidx).astype(np.int32))
        )

        def f(src, idx, g=g):
            return src.reshape(-1, g)[idx]

        jf = jax.jit(f)
        t = timeit(jf, src, idx, reps=3) - floor
        print(
            f"row-gather g={g:>3} x{nidx:>7}: {t:7.2f} ms   "
            f"{t * 1e6 / nidx:6.1f} ns/row  ({t * 1e6 / (nidx * g):5.2f} ns/elem)"
        )

    # 4) P-table pieces: block-sums of a [9, NH] 0/1 array + boundary
    #    row gathers + masked partial sums (NH = 2.7M)
    nh = 2_700_000
    nh_pad = -(-nh // 512) * 512
    valid = jnp.asarray(
        rng.random((9, nh_pad)).astype(np.float32) < 0.38, jnp.float32
    )
    bounds = jnp.asarray(
        np.sort(rng.integers(0, nh, 8161).astype(np.int32))
    )

    def ptab(valid, bounds):
        bs = valid.reshape(9, -1, 512).sum(-1)  # [9, NB]
        bc = jnp.cumsum(bs, axis=1)  # exclusive below
        bexc = bc - bs
        blk = bounds // 512
        # per-class: blockcum at boundary + masked partial inside block
        vb = valid[:, : (nh_pad // 512) * 512].reshape(9, -1, 512)
        rows = vb[:, blk, :]  # [9, 8161, 512] row gather
        lane = jnp.arange(512, dtype=jnp.int32)[None, None, :]
        part = jnp.sum(
            jnp.where(lane < (bounds % 512)[None, :, None], rows, 0.0), -1
        )
        return bexc[:, blk] + part  # [9, 8161]

    jp = jax.jit(ptab)
    t = timeit(jp, valid, bounds, reps=3) - floor
    print(f"P-tables [9,2.7M]    : {t:7.2f} ms")


if __name__ == "__main__":
    main()
