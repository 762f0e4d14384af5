"""Rendering tests: analytic checks of the oracle, oracle↔xla backend
agreement, and gradient checks (SURVEY §4: the oracle is the in-repo
ground truth; fast backends must match it)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsjax import Camera, Gaussians, RenderConfig, render, render_oracle
from conftest import make_random_scene

ORACLE = RenderConfig(backend="oracle")
XLA = RenderConfig(backend="xla", tile_list_cap=256, chunk=64)


def _one_splat(z=5.0, scale=0.1, opacity=0.8, rgb=(1.0, 0.2, 0.1), xy=(0.0, 0.0)):
    return Gaussians.from_activated(
        means=np.array([[xy[0], xy[1], z]]),
        scales=np.full((1, 3), scale),
        quats=np.array([[1.0, 0, 0, 0]]),
        opacities=np.array([opacity]),
        rgb=np.array([rgb]),
    )


def test_single_splat_center_alpha(default_camera):
    """A splat on the optical axis: center pixel alpha ≈ opacity (the
    low-pass widens the footprint only), color = rgb·alpha over black."""
    g = _one_splat(opacity=0.8, rgb=(1.0, 0.5, 0.25))
    img = np.asarray(render_oracle(g, default_camera, ORACLE))
    # mean2d = ((W-1)/2, (H-1)/2) = (31.5, 23.5): the four center pixels
    # are 0.5px away; conic from σ_px = scale·fx/z = 2px (+0.3 lowpass)
    var = (0.1 * 100 / 5.0) ** 2 + 0.3
    w = np.exp(-0.5 * (0.5**2 + 0.5**2) / var)
    expect = 0.8 * w
    assert img[23, 31, 0] == pytest.approx(expect, rel=1e-4)
    assert img[23, 31, 1] == pytest.approx(0.5 * expect, rel=1e-4)
    assert img[23, 31, 2] == pytest.approx(0.25 * expect, rel=1e-4)
    # symmetric footprint
    np.testing.assert_allclose(img[23, 31], img[24, 32], rtol=1e-4)


def test_two_splats_front_to_back_compositing(default_camera):
    """Front red over back green: C = α_f·red + (1-α_f)·α_b·green."""
    front = _one_splat(z=4.0, opacity=0.6, rgb=(1, 0, 0))
    back = _one_splat(z=8.0, opacity=0.9, rgb=(0, 1, 0))
    both = front.concat(back)
    img_f = np.asarray(render_oracle(front, default_camera, ORACLE))
    img_b = np.asarray(render_oracle(back, default_camera, ORACLE))
    img = np.asarray(render_oracle(both, default_camera, ORACLE))
    alpha_f = img_f[:, :, 0]  # red channel = α_f·w per pixel
    expect = img_f + (1 - alpha_f)[:, :, None] * img_b
    np.testing.assert_allclose(img, expect, atol=1e-5)
    # order independence of the input array (sorted by depth internally)
    img_rev = np.asarray(render_oracle(back.concat(front), default_camera, ORACLE))
    np.testing.assert_allclose(img, img_rev, atol=1e-6)


def test_background_through_transparency(default_camera):
    cfg = dataclasses.replace(ORACLE, background=(0.2, 0.4, 0.6))
    g = _one_splat(opacity=0.5)
    img, aux = render_oracle(g, default_camera, cfg, return_aux=True)
    img = np.asarray(img)
    # far corner: no splat coverage → pure background
    np.testing.assert_allclose(img[0, 0], [0.2, 0.4, 0.6], atol=1e-6)
    T = np.asarray(aux["transmittance"])
    assert T[0, 0] == pytest.approx(1.0)
    assert T[23, 31] < 0.7


def test_opacity_floor_and_clamp(default_camera):
    # opacity below 1/255 ⇒ culled entirely
    g = _one_splat(opacity=1.0 / 300.0)
    img = np.asarray(render_oracle(g, default_camera, ORACLE))
    assert np.all(img == 0)


def test_oracle_matches_xla_backend(rng, default_camera):
    g = make_random_scene(rng, n=200, sh_degree=0)
    img_o = np.asarray(render(g, default_camera, ORACLE))
    img_x = np.asarray(render(g, default_camera, XLA))
    np.testing.assert_allclose(img_x, img_o, atol=2e-5)


def test_oracle_matches_xla_backend_sh3(rng, default_camera):
    g = make_random_scene(rng, n=150, sh_degree=3)
    img_o = np.asarray(render(g, default_camera, ORACLE))
    img_x = np.asarray(render(g, default_camera, XLA))
    np.testing.assert_allclose(img_x, img_o, atol=2e-5)


def test_xla_backend_aux_counts(rng, default_camera):
    g = make_random_scene(rng, n=100)
    img, aux = render(g, default_camera, XLA, return_aux=True)
    assert int(aux["n_tile_overflow"]) == 0
    assert int(aux["n_pairs"]) > 0
    assert np.asarray(aux["transmittance"]).shape == (48, 64)


def test_dense_occlusion_terminates(rng, default_camera):
    """Many opaque splats stacked: transmittance hits the 1e-4 floor and
    backends still agree (exercises the termination rule)."""
    n = 40
    g = Gaussians.from_activated(
        means=np.concatenate(
            [rng.normal(0, 0.01, (n, 2)), np.linspace(4, 6, n)[:, None]], axis=1
        ),
        scales=np.full((n, 3), 0.2),
        quats=np.tile(np.array([1.0, 0, 0, 0]), (n, 1)),
        opacities=np.full(n, 0.97),
        rgb=rng.uniform(0, 1, (n, 3)),
    )
    img_o, aux = render_oracle(g, default_camera, ORACLE, return_aux=True)
    assert float(jnp.min(aux["transmittance"])) < 1e-3
    img_x = np.asarray(render(g, default_camera, XLA))
    np.testing.assert_allclose(img_x, np.asarray(img_o), atol=2e-5)


def test_jit_and_grad(rng, default_camera):
    g = make_random_scene(rng, n=50)
    target = jnp.zeros((48, 64, 3))

    def loss(g, cfg):
        img = render(g, default_camera, cfg)
        return jnp.mean((img - target) ** 2)

    lx = jax.jit(lambda g: loss(g, XLA))
    val, grads = jax.value_and_grad(lx)(g)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # gradients of the two backends agree
    _, go = jax.value_and_grad(lambda g: loss(g, ORACLE))(g)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_gradcheck_finite_differences(default_camera):
    """Finite-difference gradcheck on a 64×48 crop (BASELINE config 2).

    The production renderer is discontinuous by design (the 1/255 alpha
    floor, the 1e-4 termination, and tile-granular support all move *sets*
    — gradients ignore set motion, exactly like graphdeco). FD is checked
    against a smoothed config: no floors, 5σ support so rect-boundary
    alphas are ≈e⁻¹²·⁵. The discontinuous parts are covered by the
    oracle-vs-xla gradient agreement test above.
    """
    smooth = dataclasses.replace(
        XLA, alpha_min=0.0, transmittance_eps=0.0, radius_sigma=5.0
    )
    g = _one_splat(z=5.0, scale=0.15, opacity=0.7, rgb=(0.8, 0.3, 0.5), xy=(0.1, -0.05))
    target = jnp.full((48, 64, 3), 0.25)

    @jax.jit
    def loss_from(means, log_scales, quats, sh, op):
        gg = Gaussians(means, log_scales, quats, sh, op)
        return jnp.mean((render(gg, default_camera, smooth) - target) ** 2)

    args = (g.means, g.log_scales, g.quats, g.sh, g.opacity_logits)
    grads = jax.grad(loss_from, argnums=(0, 1, 2, 3, 4))(*args)
    eps = 1e-3
    for ai, ga in enumerate(grads):
        a = np.asarray(args[ai], np.float64)
        ga = np.asarray(ga)
        it = np.nditer(a, flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            ap = [np.array(x, np.float64) for x in args]
            ap[ai][idx] += eps
            am = [np.array(x, np.float64) for x in args]
            am[ai][idx] -= eps
            fd = (
                float(loss_from(*[jnp.asarray(x, jnp.float32) for x in ap]))
                - float(loss_from(*[jnp.asarray(x, jnp.float32) for x in am]))
            ) / (2 * eps)
            assert ga[idx] == pytest.approx(fd, abs=2e-4, rel=2e-2), (ai, idx)
