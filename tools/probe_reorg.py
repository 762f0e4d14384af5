"""Probe XLA data-reorg pathologies found in the r3 homesort breakdown:

  (a) row gather from a CONCAT table (the 54 ms relayout) vs the same
      gather behind an optimization_barrier vs two-gather+select,
  (b) scatter-set inverse permutation with/without unique_indices +
      promise_in_bounds,
  (c) 3-operand sorts: 1D at pair-stream scale vs [R, C] 2D shapes
      (the binning partition design),
  (d) 1-col i32 row gather (the enumeration's prank[r]) vs cummax
      forward-fill replacement.

Usage: python tools/probe_reorg.py
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
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default='abcd')
    args = ap.parse_args()
    only = args.only
    rng = np.random.default_rng(0)
    n, f = 1_200_000, 2_400_000
    nt, nh = n + f, n + 1_500_000

    # (a) relayout gather variants
    if 'a' in only:
        _sec_a(rng, n, f, nt, nh)
    if 'b' in only:
        _sec_b(rng, nt)
    if 'c' in only:
        _sec_c(rng)
    if 'd' in only:
        _sec_d(rng, n, f)


def _sec_a(rng, n, f, nt, nh):
    a = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((f, 16)), jnp.float32)
    perm = jnp.asarray(rng.permutation(nt)[:nh].astype(np.int32))

    t, _ = timeit(jax.jit(lambda a, b, perm: jnp.concatenate([a, b])[perm]),
                  a, b, perm)
    print(f"(a) concat->gather [nh={nh},16]:        {t:8.2f} ms")

    def g_barrier(a, b, perm):
        tab = jax.lax.optimization_barrier(jnp.concatenate([a, b]))
        return tab[perm]

    t, _ = timeit(jax.jit(g_barrier), a, b, perm)
    print(f"(a) barrier(concat)->gather:            {t:8.2f} ms")

    def g_two(a, b, perm):
        lo = a[jnp.minimum(perm, n - 1)]
        hi = b[jnp.clip(perm - n, 0, f - 1)]
        return jnp.where((perm < n)[:, None], lo, hi)

    t, _ = timeit(jax.jit(g_two), a, b, perm)
    print(f"(a) two gathers + select:               {t:8.2f} ms")


def _sec_b(rng, nt):
    pfull = jnp.asarray(rng.permutation(nt).astype(np.int32))

    t, _ = timeit(jax.jit(
        lambda p: jnp.zeros((nt,), jnp.int32).at[p].set(
            jnp.arange(nt, dtype=jnp.int32))), pfull)
    print(f"(b) scatter-set inv nt={nt}:        {t:8.2f} ms")

    t, _ = timeit(jax.jit(
        lambda p: jnp.zeros((nt,), jnp.int32).at[p].set(
            jnp.arange(nt, dtype=jnp.int32), unique_indices=True,
            mode="promise_in_bounds")), pfull)
    print(f"(b) scatter-set unique+inbounds:        {t:8.2f} ms")

    t, _ = timeit(jax.jit(lambda p: jax.lax.sort(
        (p, jnp.arange(nt, dtype=jnp.int32)), num_keys=1,
        is_stable=False)[1]), pfull)
    print(f"(b) 1-key sort inverse:                 {t:8.2f} ms")


def _sec_c(rng):
    S = 24_330_240
    keys = jnp.asarray(rng.integers(0, 8161, S, dtype=np.int32))
    dep = jnp.asarray(rng.integers(0, 1 << 30, S, dtype=np.int32))
    pid = jnp.arange(S, dtype=jnp.int32)

    t, _ = timeit(jax.jit(lambda k, d, p: jax.lax.sort(
        (k, d, p), num_keys=3, is_stable=False)), keys, dep, pid,
        reps=3)
    print(f"(c) 1D 3-key sort S={S}:           {t:8.2f} ms")

    for R, C in ((68, 357_376), (128, 190_080), (256, 95_040),
                 (512, 47_488), (64, 380_160)):
        k2 = keys[: R * C].reshape(R, C)
        d2 = dep[: R * C].reshape(R, C)
        p2 = pid[: R * C].reshape(R, C)
        t, _ = timeit(jax.jit(lambda k, d, p: jax.lax.sort(
            (k, d, p), dimension=1, num_keys=3, is_stable=False)),
            k2, d2, p2, reps=3)
        print(f"(c) 2D 3-key sort [{R},{C}] ({R*C/1e6:.1f}M): {t:8.2f} ms"
              f"  ({t*1e6/(R*C):.2f} ns/elem)")


def _sec_d(rng, n, f):
    r_idx = jnp.asarray(rng.integers(0, n, f, dtype=np.int32))
    tab1 = jnp.asarray(rng.integers(0, n, n + 1, dtype=np.int32))
    t, _ = timeit(jax.jit(lambda tab, r: tab[r]), tab1, r_idx)
    print(f"(d) 1-col i32 gather [F={f}]:       {t:8.2f} ms")

    base = jnp.sort(jnp.asarray(rng.integers(0, f, n, dtype=np.int32)))
    ids = jnp.arange(n, dtype=jnp.int32)

    def cummax_fill(base, ids):
        init = jnp.full((f,), -1, jnp.int32).at[base].max(
            ids, mode="drop", unique_indices=False)
        return jax.lax.associative_scan(jnp.maximum, init)

    t, _ = timeit(jax.jit(cummax_fill), base, ids)
    print(f"(d) scatter-max + cummax fill [F={f}]: {t:8.2f} ms")


if __name__ == "__main__":
    main()
