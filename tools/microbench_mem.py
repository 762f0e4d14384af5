"""Microbenchmarks of the TPU data-movement primitives the renderer is
built from (gathers / scatters / sorts), to pick layouts from measurement
rather than folklore. Run on the real chip:

  python tools/microbench_mem.py [--m 8000000] [--n 1200000] [--reps 5]
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
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8_000_000, help="index count")
    ap.add_argument("--n", type=int, default=1_200_000, help="table rows")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    M, N = args.m, args.n
    rng = np.random.default_rng(0)

    idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
    idx_sorted = jnp.sort(idx)
    # per-128-chunk sorted (the structure a depth-ordered att table gives us)
    idx_chunk_sorted = jnp.asarray(
        np.sort(np.asarray(idx).reshape(-1, 128), axis=1).reshape(-1)
    )
    tab9 = jnp.asarray(rng.normal(size=(N, 9)), jnp.float32)
    tab16 = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)
    tab128 = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    tab1 = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    tab9_bf = tab9.astype(jnp.bfloat16)

    def report(name, ms, rows):
        print(f"{name:34s}: {ms:9.2f} ms   {ms * 1e6 / rows:7.2f} ns/row")

    f = jax.jit(lambda t, i: t[i])
    report("row gather [N,9] rand", timeit(f, tab9, idx, reps=args.reps), M)
    report("row gather [N,16] rand", timeit(f, tab16, idx, reps=args.reps), M)
    report("row gather [N,128] rand", timeit(f, tab128, idx, reps=args.reps), M)
    report("row gather [N,9] bf16 rand", timeit(f, tab9_bf, idx, reps=args.reps), M)
    report("row gather [N,9] sorted", timeit(f, tab9, idx_sorted, reps=args.reps), M)
    report(
        "row gather [N,9] chunk128-sorted",
        timeit(f, tab9, idx_chunk_sorted, reps=args.reps),
        M,
    )
    report("1-D gather [N] rand", timeit(f, tab1, idx, reps=args.reps), M)
    f9 = jax.jit(lambda t, i: jnp.stack([t[:, k][i] for k in range(9)], -1))
    report("9x 1-D gathers rand", timeit(f9, tab9, idx, reps=args.reps), 9 * M)

    # one-hot matmul gather: idx→rows via [M,N] @ [N,9]? infeasible at size;
    # skipped.

    src9 = jnp.asarray(rng.normal(size=(M, 9)), jnp.float32)
    src1 = jnp.asarray(rng.normal(size=(M,)), jnp.float32)
    fsa = jax.jit(lambda s, i: jnp.zeros((N, 9), jnp.float32).at[i].add(s))
    report("row scatter-add [M,9]→[N,9]", timeit(fsa, src9, idx, reps=2), M)
    fss = jax.jit(
        lambda s, i: jnp.zeros((N,), jnp.float32).at[i].set(s, mode="drop")
    )
    report("1-D scatter-set [M]→[N]", timeit(fss, src1, idx, reps=args.reps), M)
    fsa1 = jax.jit(
        lambda s, i: jnp.zeros((N,), jnp.float32).at[i].add(s, mode="drop")
    )
    report("1-D scatter-add [M]→[N]", timeit(fsa1, src1, idx, reps=2), M)

    keys = jnp.asarray(rng.integers(0, 2**31, M), jnp.uint32)
    pay = jnp.arange(M, dtype=jnp.int32)
    fs = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True))
    report("sort (u32,i32)", timeit(fs, keys, pay, reps=args.reps), M)
    fs2 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0])
    report("sort u32 keys only", timeit(fs2, keys, reps=args.reps), M)
    pays = [jnp.asarray(rng.normal(size=(M,)), jnp.float32) for _ in range(9)]
    fsp = jax.jit(
        lambda k, *ps: jax.lax.sort((k, *ps), num_keys=1, is_stable=True)
    )
    report("sort (u32 + 9×f32 payload)", timeit(fsp, keys, *pays, reps=2), M)

    # segment-ish: cumsum at M
    fc = jax.jit(lambda x: jnp.cumsum(x))
    report("cumsum [M] f32", timeit(fc, src1, reps=args.reps), M)
    fam = jax.jit(lambda x: jnp.argmax(x))
    report("argmax [M] (reduce floor)", timeit(fam, src1, reps=args.reps), M)


if __name__ == "__main__":
    main()
