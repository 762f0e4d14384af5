"""Probe XLA lax.sort cost structure on TPU — informs the pair-sort
replacement (render/DESIGN.md roadmap #2).

Questions:
  1. scaling exponent of lax.sort with n (bitonic => n log^2 n)
  2. row-segmented [R, C] sort (axis=-1): is per-element cost ~log^2(C)?
  3. 1-key vs 2-key vs wider payloads
  4. scatter-set + 2-level cumsum costs at 10.8M (the counting-partition
     building blocks)

Usage: python tools/probe_sort.py
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


def main():
    key = jax.random.PRNGKey(0)

    # dispatch floor
    noop = jax.jit(lambda x: x + 1)
    floor = timeit(noop, jnp.zeros((8, 128), jnp.int32))
    print(f"dispatch floor       : {floor:7.2f} ms")

    # 1) scaling with n (1D, 2-key u32+i32 unstable — the production sort)
    for n in (1_350_000, 2_700_000, 5_400_000, 10_800_000):
        k = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32).view(jnp.uint32)
        p = jnp.arange(n, dtype=jnp.int32)
        f = jax.jit(
            lambda k, p: jax.lax.sort((k, p), num_keys=2, is_stable=False)
        )
        t = timeit(f, k, p) - floor
        print(f"1D 2-key sort n={n:>9}: {t:7.2f} ms   {t * 1e6 / n:6.2f} ns/elem")

    # 2) row-segmented [R, C] sorts, same total 10.8M
    for r, c in ((8, 1_350_000), (68, 158_824), (128, 84_375), (512, 21_094)):
        c = -(-c // 128) * 128
        k = jax.random.randint(key, (r, c), 0, 1 << 30, jnp.int32).view(jnp.uint32)
        p = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (r, c))
        f = jax.jit(
            lambda k, p: jax.lax.sort((k, p), num_keys=2, is_stable=False, dimension=1)
        )
        t = timeit(f, k, jnp.asarray(p)) - floor
        tot = r * c
        print(f"2D [{r:>4},{c:>8}] sort : {t:7.2f} ms   {t * 1e6 / tot:6.2f} ns/elem")

    # 3) key/payload variants at 10.8M
    n = 10_800_000
    k = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32).view(jnp.uint32)
    p = jnp.arange(n, dtype=jnp.int32)
    f1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False))
    t = timeit(f1, k) - floor
    print(f"1-key no-payload     : {t:7.2f} ms")
    f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False))
    t = timeit(f2, k, p) - floor
    print(f"1-key +payload unstab: {t:7.2f} ms")
    f3 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True))
    t = timeit(f3, k, p) - floor
    print(f"1-key +payload stable: {t:7.2f} ms")

    # splat-count sort (the S3 option's global depth sort)
    n2 = 1_200_000
    k2 = jax.random.randint(key, (n2,), 0, 1 << 30, jnp.int32).view(jnp.uint32)
    p2 = jnp.arange(n2, dtype=jnp.int32)
    f4 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=2, is_stable=False))
    t = timeit(f4, k2, p2) - floor
    print(f"1.2M 2-key sort      : {t:7.2f} ms")

    # 4) counting-partition building blocks at 10.8M
    n = 10_800_000
    dest = jax.random.permutation(key, n).astype(jnp.int32)
    vals = jnp.arange(n, dtype=jnp.int32)
    fsc = jax.jit(
        lambda d, v: jnp.zeros((n,), jnp.int32).at[d].set(v, mode="drop")
    )
    t = timeit(fsc, dest, vals) - floor
    print(f"scatter-set 10.8M    : {t:7.2f} ms   ({t * 1e6 / n:5.2f} ns/elem)")

    # gather 10.8M (random)
    fg = jax.jit(lambda d, v: v[d])
    t = timeit(fg, dest, vals) - floor
    print(f"gather 10.8M 1D      : {t:7.2f} ms   ({t * 1e6 / n:5.2f} ns/elem)")

    # plain XLA cumsum at 10.8M
    x = jnp.ones((n,), jnp.int32)
    fc = jax.jit(lambda x: jnp.cumsum(x))
    t = timeit(fc, x) - floor
    print(f"xla cumsum 10.8M     : {t:7.2f} ms")

    # 2-level cumsum (rows of 2048): exclusive prefix via row sums
    rows = n // 2048
    x2 = jnp.ones((rows, 2048), jnp.int32)

    def cum2(x):
        rs = jnp.sum(x, axis=1)
        base = jnp.cumsum(rs) - rs
        return jnp.cumsum(x, axis=1) + base[:, None]

    fc2 = jax.jit(cum2)
    t = timeit(fc2, x2) - floor
    print(f"2-level cumsum 10.8M : {t:7.2f} ms")


if __name__ == "__main__":
    main()
