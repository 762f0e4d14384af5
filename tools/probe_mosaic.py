"""Probe Mosaic support for the primitives the streamv2 kernel needs:
  1. dynamic lane roll on [8, 2048] i32 and [1, 2176] i32
  2. dynamic sublane-index slice [1, 128] out of [8, 2048]
  3. [1, 128] -> [128, 1] swapaxes
  4. while_loop with vector-reduce scalar condition
  5. dynamic leading-index write into a [8, R, C] output block
  6. lex-compare bitonic substage ops (roll/select/compare)
Run on the real TPU: python tools/probe_mosaic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 2048


def kernel(x_ref, o_ref, s_ref, scr_ref):
    x = x_ref[...]  # [8, CAP] i32
    # 1. dynamic lane roll by a traced amount
    amt = x[0, 0] % 1024
    y = pltpu.roll(x, amt, 1)
    # 2. static-sublane, dynamic-lane slice via a VMEM scratch ref
    # (the 8-tile block loop is Python-unrolled, so the sublane is static)
    t = 3
    k = x[0, 2] % (CAP // 128)
    scr_ref[...] = y
    row = scr_ref[t : t + 1, pl.ds(pl.multiple_of(k * 128, 128), 128)]
    # 3. transpose to sublane vector
    col = jnp.swapaxes(row, 0, 1)  # [128, 1]
    # 4. while loop with vector-reduce condition
    def cond(c):
        i, acc = c
        return jnp.logical_and(i < 4, jnp.max(acc) < 10**9)

    def body(c):
        i, acc = c
        return i + 1, acc + col
    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), col))
    # 6. bitonic substage ops: partner via two rolls + select
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, CAP), 1)
    j = jnp.int32(16)
    # negative shifts crash apply_vector_layout — rotate by (CAP - j) instead
    pk = jnp.where(
        (iota & j) == 0, pltpu.roll(y, CAP - j, 1), pltpu.roll(y, j, 1)
    )
    gt = (y > pk) | ((y == pk) & (iota > pltpu.roll(iota, CAP - j, 1)))
    z = jnp.where(gt, pk, y)
    # 5. static leading-index write
    o_ref[t : t + 1] = z[0:1, 0:128] + acc[0:1, 0] + jnp.sum(z[1:2, :])
    s_ref[0] = jnp.sum(z)


def main():
    x = jnp.arange(8 * CAP, dtype=jnp.int32).reshape(8, CAP)
    out, s = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, CAP), jnp.int32)],
    )(x)
    print("probe ok:", np.asarray(out).sum(), int(s[0]))


if __name__ == "__main__":
    main()
