"""SH evaluation tests against closed-form values."""

import numpy as np
import jax.numpy as jnp
import pytest

from gsjax.render.sh import SH_C0, SH_C1, eval_sh, sh_basis


def test_degree0_constant():
    dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    b = np.asarray(sh_basis(dirs, 1))
    np.testing.assert_allclose(b, SH_C0, atol=1e-7)


def test_degree1_axes():
    dirs = jnp.eye(3)
    b = np.asarray(sh_basis(dirs, 4))
    # basis order: [C0, -C1·y, C1·z, -C1·x]
    np.testing.assert_allclose(b[0], [SH_C0, 0, 0, -SH_C1], atol=1e-7)  # +x
    np.testing.assert_allclose(b[1], [SH_C0, -SH_C1, 0, 0], atol=1e-7)  # +y
    np.testing.assert_allclose(b[2], [SH_C0, 0, SH_C1, 0], atol=1e-7)  # +z


def test_basis_orthonormality(rng):
    """Monte-Carlo orthonormality of the real SH basis over the sphere:
    ∫ Y_i Y_j dΩ = δ_ij (catches any wrong constant or sign)."""
    v = rng.normal(size=(200_000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    B = np.asarray(sh_basis(jnp.asarray(v), 16))  # [S, 16]
    G = 4 * np.pi * (B.T @ B) / v.shape[0]
    np.testing.assert_allclose(G, np.eye(16), atol=0.05)


def test_eval_sh_clamps_at_zero():
    sh = jnp.zeros((1, 1, 3)).at[0, 0].set(jnp.array([-10.0, 0.0, 10.0]))
    rgb = np.asarray(eval_sh(sh, jnp.array([[0.0, 0.0, 1.0]])))
    assert rgb[0, 0] == 0.0  # clamped below
    assert rgb[0, 1] == pytest.approx(0.5)
    assert rgb[0, 2] == pytest.approx(0.5 + 10 * SH_C0)


def test_zero_padded_higher_orders_are_inert(rng):
    """Mixed per-splat degree via zero padding: padded coeffs contribute
    exactly 0 (replaces the reference's u_bandIndex logic)."""
    sh1 = rng.normal(size=(8, 4, 3)).astype(np.float32)
    sh2 = np.zeros((8, 16, 3), np.float32)
    sh2[:, :4] = sh1
    dirs = rng.normal(size=(8, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    a = np.asarray(eval_sh(jnp.asarray(sh1), jnp.asarray(dirs)))
    b = np.asarray(eval_sh(jnp.asarray(sh2), jnp.asarray(dirs)))
    np.testing.assert_allclose(a, b, atol=1e-7)
