"""Measure an XLA bitonic MERGE of two sorted (key, pid) streams vs
lax.sort, on bench-scale sizes.

The stream backend's pair stream is the 9-way merge of 9 ALREADY-sorted
class streams (each class's (tile,depth) keys ascend with home row), so
a merge tree (log m stages per level) could replace the global
lax.sort (comparison network, effectively log^2). This probe times the
building block: one full bitonic merge of two sorted halves, with the
exact (key, pid) lexicographic comparator the canonical order needs.

Usage: python tools/probe_merge.py [--m 10800000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bitonic_merge(keys, pids):
    """keys/pids [m]: first half ascending, second half ascending.
    Returns fully sorted (keys, pids) by (key, pid) lex order.
    m must be a power of two."""
    m = keys.shape[0]
    # make bitonic: reverse the second half
    k = jnp.concatenate([keys[: m // 2], keys[m // 2 :][::-1]])
    p = jnp.concatenate([pids[: m // 2], pids[m // 2 :][::-1]])
    d = m // 2
    while d >= 1:
        k2 = k.reshape(-1, 2, d)
        p2 = p.reshape(-1, 2, d)
        klo, khi = k2[:, 0], k2[:, 1]
        plo, phi = p2[:, 0], p2[:, 1]
        swap = (klo > khi) | ((klo == khi) & (plo > phi))
        nlo_k = jnp.where(swap, khi, klo)
        nhi_k = jnp.where(swap, klo, khi)
        nlo_p = jnp.where(swap, phi, plo)
        nhi_p = jnp.where(swap, plo, phi)
        k = jnp.stack([nlo_k, nhi_k], axis=1).reshape(m)
        p = jnp.stack([nlo_p, nhi_p], axis=1).reshape(m)
        d //= 2
    return k, p


def _sync(x):
    jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


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
    ap.add_argument("--m", type=int, default=10_800_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    m = 1 << (args.m - 1).bit_length()  # next pow2
    print(f"m = {m} ({m/1e6:.1f}M)")

    rng = np.random.default_rng(0)
    half = np.sort(rng.integers(0, 2**31, (2, m // 2), dtype=np.int64))
    keys = jnp.asarray(np.concatenate(half).astype(np.int32))
    pids = jnp.asarray(np.arange(m, dtype=np.int32))

    f_merge = jax.jit(bitonic_merge)
    t, (ks, ps) = timeit(f_merge, keys, pids, reps=args.reps)
    ok = bool(jnp.all(ks[1:] >= ks[:-1]))
    print(f"bitonic merge : {t:8.2f} ms   sorted={ok}")

    f_sort = jax.jit(
        lambda k, p: jax.lax.sort((k, p), num_keys=2, is_stable=False)
    )
    t, _ = timeit(f_sort, keys, pids, reps=args.reps)
    print(f"lax.sort      : {t:8.2f} ms")


if __name__ == "__main__":
    main()
