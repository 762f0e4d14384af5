"""Fast elementwise math for the blend kernels.

`jnp.exp` measures ~2.8e10/s on a v5e VPU (see render/DESIGN.md) and is
the dominant per-pair-pixel cost of the tile blend. `fexp` evaluates
exp(x) for x ≤ 0 as 2^(x·log2 e) with the exponent assembled by integer
bit-twiddling and a degree-5 minimax polynomial for the fraction
(Cephes exp2 coefficients; measured max relative error vs jnp.exp is
8e-6 over [-87, 0] — far below the 1/255 alpha quantum, so every
backend uses it unconditionally and still matches the oracle).

Works both inside Pallas kernels (Mosaic supports the integer ops and
the bitcast) and in plain jnp code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2E = 1.4426950408889634
# Cephes 2^f on [0, 1), degree 5, Horner order (constant term last)
_C5 = 1.53720378e-4
_C4 = 1.33903821e-3
_C3 = 9.61817999e-3
_C2 = 5.55036562e-2
_C1 = 2.40226507e-1
_C0 = 6.93147182e-1


@jax.custom_jvp
def fexp(x):
    """exp(x) for x ≤ 0 (clamped to [-87, 0]), max relative error ~8e-6.

    Carries the exact derivative d/dx exp = exp (the floor/bitcast inside
    would otherwise zero out autodiff), so it is safe in autodiff'd code
    (composite.blend_padded) as well as in hand-VJP'd kernels."""
    y = jnp.maximum(x, -87.0) * _LOG2E  # ∈ [-126, 0]
    n = jnp.floor(y)
    f = y - n  # ∈ [0, 1)
    p = _C5
    p = p * f + _C4
    p = p * f + _C3
    p = p * f + _C2
    p = p * f + _C1
    p = p * f + _C0
    poly = p * f + 1.0
    # 2^n via exponent-field assembly; n ∈ [-126, 0] so no denormal edge
    two_n = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return poly * two_n


@fexp.defjvp
def _fexp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = fexp(x)
    return y, y * dx
