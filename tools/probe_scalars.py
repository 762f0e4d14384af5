"""Probe the per-grid-step cost of the three ways a stream-kernel chunk
can obtain its one-hot window bounds as scalars:

  reduce : 6 masked cross-sublane min/max reduces of a [chunk, 1] vector
           (what pallas_stream._decode_windows does today)
  vmem   : 6 scalar reads from fixed lanes of the slot's VMEM row block
           (bounds precomputed XLA-side, stashed in pidwin slack lanes)
  smem   : 6 scalar reads from a scalar-prefetch SMEM table

Each variant runs a G-step grid doing only that work (+ a trivial write
so nothing folds); the deltas vs the `base` no-op variant give the
per-step cost. Run on the real TPU:  python tools/probe_scalars.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
LANES = 256
G = 8192


def _mk(variant):
    def kernel(stab_ref, rows_ref, o_ref):
        j = pl.program_id(0)
        acc = jnp.int32(0)
        if variant == "reduce":
            raw = rows_ref[0]  # [CHUNK, ...]? use [1, LANES] row
            rows = jnp.swapaxes(raw[:, :CHUNK], 0, 1)  # [CHUNK, 1]
            big = jnp.int32(2**30)
            for r in range(3):
                m = (rows % 3) == r
                rmin = jnp.min(jnp.where(m, rows, big))
                rmax = jnp.max(jnp.where(m, rows, -1))
                acc += rmin + rmax
        elif variant == "vmem":
            for i in range(6):
                acc += rows_ref[0, 248 + i]
        elif variant == "smem":
            for i in range(6):
                acc += stab_ref[j * 6 + i]
        o_ref[0, 0] = acc

    return kernel


def run(variant):
    stab = jnp.arange(G * 6, dtype=jnp.int32)
    rows = jnp.tile(jnp.arange(LANES, dtype=jnp.int32)[None], (G, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda j, st: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda j, st: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda s, r: pl.pallas_call(
            _mk(variant),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        )(s, r)
    )
    out = f(stab, rows)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(stab, rows)
    jax.device_get(out.ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {variant:7s}: {ms:7.3f} ms  ({ms / G * 1e6:6.1f} ns/step)")
    return ms


if __name__ == "__main__":
    base = None
    for v in ["smem", "vmem", "reduce"]:
        run(v)
