"""Cost-model probe for the planned pair expand-cull-compact kernel
(render/DESIGN.md roadmap: replace the padded 12M-slot pair sort input
with a compacted live stream).

Per 128-lane input subgroup the kernel plan does, for each of 9 classes:
  2 staircase compares [128, W] -> one-hot, a 7-step lane prefix,
  one [8,128]@[128,W] f32-HIGHEST dot, and an RMW add into a staging
  window. This probe times exactly that op mix at bench scale (without
  correctness plumbing) to validate the ~<20 ms budget, plus the
  ring-flush DMA rate.

Usage: python tools/probe_compact.py [--nh 2400000]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


R = 2048  # input rows per grid step
W = 256  # one-hot window lanes
STG = 32768  # staging ring lanes
FLUSH = 8192  # flush granule


def _prefix_lanes(x):
    """Inclusive prefix sum across the 128 lanes of [1, 128] int32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    s = 1
    while s < 128:
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, 1), 0)
        s *= 2
    return x


def _kernel(mask_ref, vals_ref, out_any, stage_ref, cur_ref, sem, *, classes):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        cur_ref[0] = 0  # global write base (aligned)
        cur_ref[1] = 0  # staged fill

    for sg in range(R // 128):
        m = mask_ref[0:1, pl.ds(sg * 128, 128)]  # [1,128] i32 bitmask
        v = vals_ref[:, pl.ds(sg * 128, 128)]  # [8,128] f32
        for c in range(classes):
            alive = ((m >> c) & 1).astype(jnp.int32)
            pref = _prefix_lanes(alive)  # inclusive
            total = jnp.max(pref)
            fill = cur_ref[1]
            # staircase one-hot: output position (fill + pref-1) within
            # a W window starting at the aligned floor of fill
            start = (fill // 128) * 128
            pos = fill + pref - 1 - start  # [1,128] in [0, W)
            # the real kernel builds oh[i, j] = (j == pos_i) & alive_i as
            # a [128, W] compare:
            posT = jnp.broadcast_to(pos.reshape(128, 1), (128, W))
            ohT = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (128, W), 1) == posT)
                & (jnp.broadcast_to(alive.reshape(128, 1), (128, W)) > 0),
                1.0,
                0.0,
            ).astype(jnp.float32)
            upd = jax.lax.dot_general(
                v,
                ohT,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [8, W]
            sl = pl.ds(
                pl.multiple_of(jnp.minimum(start % STG, STG - W), 128), W
            )
            stage_ref[:, sl] = stage_ref[:, sl] + upd
            cur_ref[1] = fill + total

        # flush full granules
        @pl.when(cur_ref[1] - cur_ref[0] >= FLUSH)
        def _():
            base = cur_ref[0]
            cp = pltpu.make_async_copy(
                stage_ref.at[:, pl.ds(pl.multiple_of(base % STG, 128), FLUSH)],
                out_any.at[:, pl.ds(pl.multiple_of(base % (4 * STG - FLUSH) // 128 * 128, 128), FLUSH)],
                sem,
            )
            cp.start()
            cp.wait()
            cur_ref[0] = base + FLUSH


def run(nh, classes):
    steps = nh // R
    mask = jnp.ones((1, nh), jnp.int32) * 0x1B5  # ~6/9 classes alive
    vals = jnp.ones((8, nh), jnp.float32)
    out_shape = jax.ShapeDtypeStruct((8, 4 * STG), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, STG), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    f = pl.pallas_call(
        functools.partial(_kernel, classes=classes),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(lambda m, v: f(m, v))
    t = timeit(jf, mask, vals, reps=3)
    slots = nh * classes
    print(
        f"classes={classes}: {t:8.2f} ms   {t * 1e6 / slots:6.3f} ns/slot "
        f"({t * 1e6 / (nh // 128 * classes):7.1f} ns per subgroup-class)"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nh", type=int, default=2_400_000)
    args = ap.parse_args()
    nh = args.nh // R * R
    for classes in (1, 3, 9):
        run(nh, classes)


if __name__ == "__main__":
    main()
