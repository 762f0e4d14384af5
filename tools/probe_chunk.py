"""Per-op cost attribution for one stream-kernel chunk, measured clean.

tools/ablate_stream.py stubs stages inside the real kernel, but any stub
that changes alpha/transmittance changes the early-termination live set,
so its deltas conflate stage cost with workload change. Here each sub-op
runs alone in a synthetic G-step grid on realistic shapes
([chunk=128, n_px=256]); the delta vs the `base` variant is the op's
per-step cost. Run on the real TPU:  python tools/probe_chunk.py
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
N_PX = 256
LANES = 256
WINW = 128
G = 4096


def _out(o_ref, v):
    o_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32) + v.astype(jnp.float32)


def _mk(variant):
    def kernel(rows_ref, band_ref, o_ref, scr_ref):
        srow = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        if variant == "base":
            _out(o_ref, jnp.int32(pl.program_id(0)))
            return
        if variant == "roll":
            sh = rows_ref[0, 0] % 64
            raw = pltpu.roll(rows_ref[0:1, :], LANES - sh, 1)
            _out(o_ref, raw[0, 0].astype(jnp.float32))
            return
        if variant == "swapaxes":
            rows = jnp.swapaxes(rows_ref[0:1, :CHUNK], 0, 1)  # [CHUNK, 1]
            _out(o_ref, jnp.int32(rows[0, 0]))
            return
        if variant == "decode":  # roll + swap + div/mod chain
            sh = rows_ref[0, 0] % 64
            raw = pltpu.roll(rows_ref[0:1, :], LANES - sh, 1)
            rows = jnp.swapaxes(raw[:, :CHUNK], 0, 1)
            sid = rows // 9
            cls = rows - sid * 9
            crow = jnp.where(srow < 100, cls // 3, -1)
            _out(o_ref, jnp.int32(sid[0, 0] + crow[5, 0]))
            return
        # the remaining variants consume a decoded sid/crow pair
        rows = jnp.swapaxes(rows_ref[0:1, :CHUNK], 0, 1)
        sid = rows // 9
        crow = (rows - sid * 9) // 3
        if variant == "onehot3":  # 3 band rows x (one-hot + MXU gather dot)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINW), 1)
            acc = jnp.zeros((CHUNK, 32), jnp.float32)
            for r in range(3):
                ids = (sid[r, 0] // WINW) * WINW + lane
                oh = jnp.where(
                    jnp.logical_and(crow == r, sid == ids), 1.0, 0.0
                ).astype(jnp.bfloat16)
                w = band_ref[0:32, pl.ds(pl.multiple_of(r * WINW, WINW), WINW)]
                acc = acc + jax.lax.dot_general(
                    oh, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            _out(o_ref, acc[0, 0])
            return
        if variant == "scatter3":  # 3 x (one-hot + transposed MXU + RMW)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINW), 1)
            dhl = jnp.ones((CHUNK, 32), jnp.bfloat16)
            for r in range(3):
                ids = (sid[r, 0] // WINW) * WINW + lane
                oh = jnp.where(
                    jnp.logical_and(crow == r, sid == ids), 1.0, 0.0
                ).astype(jnp.bfloat16)
                u2 = jax.lax.dot_general(
                    dhl, oh, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                upd = u2[0:16] + u2[16:]
                sl = pl.ds(pl.multiple_of(r * WINW, WINW), WINW)
                scr_ref[:, sl] = scr_ref[:, sl] + upd
            _out(o_ref, scr_ref[0, 0])
            return
        if variant == "fori0":  # 3 dynamic fori_loops with ZERO iterations
            nr = rows_ref[0, 1] % 1  # data-dependent 0

            def body(w_i, acc):
                return acc + jnp.float32(w_i)

            acc = jnp.zeros((), jnp.float32)
            for _ in range(3):
                acc = jax.lax.fori_loop(1, 1 + nr, body, acc)
            _out(o_ref, acc)
            return
        if variant == "when_f":  # 3 pl.when branches that never run
            nr = rows_ref[0, 1] % 1

            for _ in range(3):

                @pl.when(nr > 0)
                def _():
                    scr_ref[0:1, 0:128] = jnp.zeros((1, 128), jnp.float32)

            _out(o_ref, jnp.int32(nr))
            return
        if variant == "banddyn":  # 3 dynamic-lane-offset band reads + dot
            oh = jnp.ones((CHUNK, WINW), jnp.bfloat16)
            acc = jnp.zeros((CHUNK, 32), jnp.float32)
            for r in range(3):
                start = (rows_ref[0, r] % 3) * WINW  # dynamic, 128-aligned
                w = band_ref[0:32, pl.ds(pl.multiple_of(start, WINW), WINW)]
                acc = acc + jax.lax.dot_general(
                    oh, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            _out(o_ref, acc[0, 0])
            return
        if variant == "gatherreal":  # full _gather_att shape: dynamic
            # offsets + masked one-hot + empty extra-window fori, x3 rows
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINW), 1)
            acc = jnp.zeros((CHUNK, 32), jnp.float32)
            for r in range(3):
                lo_r = (rows_ref[0, r] % 3) * WINW
                off_r = lo_r
                end_r = rows_ref[0, 3] % 512 + 512
                nr_r = rows_ref[0, 4] % 1 + 1  # data-dependent 1
                mrow = crow == r

                def body(w_i, acc, lo_r=lo_r, off_r=off_r, end_r=end_r,
                         mrow=mrow):
                    ids = lo_r + w_i * WINW + lane
                    ok = off_r + w_i * WINW + WINW <= end_r
                    oh = jnp.where(
                        jnp.logical_and(mrow, sid == ids),
                        jnp.where(ok, 1.0, 0.0),
                        0.0,
                    ).astype(jnp.bfloat16)
                    start = jnp.clip(off_r + w_i * WINW, 0, 512 - WINW)
                    w = band_ref[0:32, pl.ds(pl.multiple_of(start, WINW), WINW)]
                    return acc + jax.lax.dot_general(
                        oh, w, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                acc = body(0, acc)
                acc = jax.lax.fori_loop(1, nr_r, body, acc)
            _out(o_ref, acc[0, 0])
            return
        if variant == "dynread":  # fori over 10 dynamic-lane scalar reads
            nd = rows_ref[0, 1] % 1 + 10  # data-dependent 10

            def body(i, acc):
                return acc + rows_ref[0, 128 + i]

            acc = jax.lax.fori_loop(0, nd, body, jnp.int32(0))
            _out(o_ref, acc)
            return
        if variant == "flatgather":  # ONE fori over 10 descriptor rounds
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINW), 1)
            nd = rows_ref[0, 1] % 1 + 10

            def body(i, acc):
                desc = rows_ref[0, 128 + i]
                cls_s = desc & 15
                lo = (desc >> 4) * WINW
                off = lo % 256  # stand-in for the threshold translation
                ids = lo + lane
                ok = off + WINW <= 512
                oh = jnp.where(
                    jnp.logical_and(crow == cls_s, sid == ids),
                    jnp.where(ok, 1.0, 0.0),
                    0.0,
                ).astype(jnp.bfloat16)
                start = jnp.clip(off, 0, 512 - WINW)
                w = band_ref[0:32, pl.ds(pl.multiple_of(start, WINW), WINW)]
                return acc + jax.lax.dot_general(
                    oh, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc = jax.lax.fori_loop(
                0, nd, body, jnp.zeros((CHUNK, 32), jnp.float32)
            )
            _out(o_ref, acc[0, 0])
            return
        if variant == "maskwalk":  # one fori walking 3 occupancy masks
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINW), 1)
            # 3 data-dependent masks with 3 set bits each (9 rounds)
            m0 = (rows_ref[0, 1] % 1) | 0x13
            m1 = (rows_ref[0, 2] % 1) | 0x0B
            m2 = (rows_ref[0, 3] % 1) | 0x26
            los = [rows_ref[0, r] % 2 * WINW for r in range(3)]
            nr = rows_ref[0, 4] % 1 + 9

            def ctz(x):  # x a power of two; 5 constant-mask selects
                p = jnp.int32(0)
                p += jnp.where((x & jnp.int32(0x0000FFFF)) == 0, 16, 0)
                p += jnp.where((x & jnp.int32(0x00FF00FF)) == 0, 8, 0)
                p += jnp.where((x & jnp.int32(0x0F0F0F0F)) == 0, 4, 0)
                p += jnp.where((x & jnp.int32(0x33333333)) == 0, 2, 0)
                p += jnp.where((x & jnp.int32(0x55555555)) == 0, 1, 0)
                return p

            def body(i, c):
                m0, m1, m2, acc = c
                r0 = m0 != 0
                r1 = jnp.logical_and(jnp.logical_not(r0), m1 != 0)
                m = jnp.where(r0, m0, jnp.where(r1, m1, m2))
                lo = jnp.where(r0, los[0], jnp.where(r1, los[1], los[2]))
                r_cur = jnp.where(r0, 0, jnp.where(r1, 1, 2))
                mrow = crow == r_cur
                low = m & -m
                pos = ctz(low)
                ids = lo + pos * WINW + lane
                oh = jnp.where(
                    jnp.logical_and(mrow, sid == ids), 1.0, 0.0
                ).astype(jnp.bfloat16)
                start = (lo + pos * WINW) % 256
                w = band_ref[0:32, pl.ds(pl.multiple_of(start, WINW), WINW)]
                acc = acc + jax.lax.dot_general(
                    oh, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ms = m & (m - 1)
                m0 = jnp.where(r0, ms, m0)
                m1 = jnp.where(r1, ms, m1)
                m2 = jnp.where(jnp.logical_or(r0, r1), m2, ms)
                return (m0, m1, m2, acc)

            _, _, _, acc = jax.lax.fori_loop(
                0, nr, body, (m0, m1, m2, jnp.zeros((CHUNK, 32), jnp.float32))
            )
            _out(o_ref, acc[0, 0])
            return
        # pixel-space ops on [CHUNK, N_PX]
        att = band_ref[0:CHUNK, 0:N_PX].astype(jnp.float32)
        if variant == "alpha":  # dx/dy/power/fexp/alpha chain
            from gsjax.render.fastmath import fexp

            px = jax.lax.broadcasted_iota(jnp.int32, (1, N_PX), 1).astype(
                jnp.float32
            )
            mx = att[:, 0:1]
            dx = px - mx
            power = -0.5 * (att[:, 1:2] * dx * dx + att[:, 2:3] * dx) - dx
            Gv = fexp(power)
            alpha = jnp.minimum(0.99, att[:, 3:4] * Gv)
            _out(o_ref, alpha[0, 0])
            return
        if variant == "hs_prod":
            f = 1.0 - att[:, 0:N_PX] * 1e-6
            incl = f
            s = 1
            while s < CHUNK:
                incl = incl * jnp.where(
                    srow >= s, pltpu.roll(incl, s, 0), 1.0
                )
                s *= 2
            _out(o_ref, incl[0, 0])
            return
        if variant == "dots":  # img accumulate + lane-reduce liveness
            w = att[:, 0:N_PX]
            img = jax.lax.dot_general(
                band_ref[0:CHUNK, 0:3].astype(jnp.float32), w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            _out(o_ref, img[0, 0] + jnp.max(w))
            return
        if variant == "bwdsums":  # the 6 lane-reductions of the bwd chain
            dpow = att[:, 0:N_PX]
            dx = att[:, 0:N_PX] * 0.5
            acc = jnp.zeros((CHUNK, 1), jnp.float32)
            for _ in range(3):
                acc += jnp.sum(dpow * dx, axis=1, keepdims=True)
                acc += jnp.sum(dpow * dx * dx, axis=1, keepdims=True)
            _out(o_ref, acc[0, 0])
            return
        raise ValueError(variant)

    return kernel


def run(variant, base_ms=0.0):
    rows = jnp.tile(
        jnp.arange(LANES, dtype=jnp.int32)[None] * 7 % 1152, (8, 1)
    )
    band = jnp.ones((CHUNK, 512), jnp.bfloat16)
    f = jax.jit(
        lambda r, b: pl.pallas_call(
            _mk(variant),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((8, LANES), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 512), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32)],
        )(r, b)
    )
    out = f(rows, band)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = f(rows, band)
    jax.device_get(out.ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(
        f"  {variant:9s}: {ms:7.3f} ms total, "
        f"{(ms - base_ms) / G * 1e6:7.1f} ns/step over base"
    )
    return ms


if __name__ == "__main__":
    import sys

    vs = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else [
            "roll", "swapaxes", "decode", "onehot3", "scatter3", "alpha",
            "hs_prod", "dots", "bwdsums", "fori0", "when_f", "banddyn",
            "gatherreal",
        ]
    )
    base = run("base")
    for v in vs:
        run(v, base)
