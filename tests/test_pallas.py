"""Pallas tile-blend kernel tests (interpret mode on CPU; the same kernel
compiles via Mosaic on TPU — exactness there is checked by
tools/smoke_render.py --pallas and the TPU-marked test)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsjax import Camera, RenderConfig, render
from conftest import make_random_scene

XLA = RenderConfig(backend="xla", tile_list_cap=256, chunk=64)
PAL = RenderConfig(backend="pallas", tile_list_cap=256, chunk=64)


def test_pallas_matches_xla(rng, default_camera):
    g = make_random_scene(rng, n=200)
    ix = np.asarray(render(g, default_camera, XLA))
    ip = np.asarray(render(g, default_camera, PAL))
    np.testing.assert_allclose(ip, ix, atol=1e-6)


def test_pallas_early_exit_semantics(rng, default_camera):
    """Dense occluders: the kernel's early exit must not change results."""
    n = 48
    from gsjax import Gaussians

    g = Gaussians.from_activated(
        means=np.concatenate(
            [rng.normal(0, 0.01, (n, 2)), np.linspace(4, 6, n)[:, None]], axis=1
        ),
        scales=np.full((n, 3), 0.2),
        quats=np.tile(np.array([1.0, 0, 0, 0]), (n, 1)),
        opacities=np.full(n, 0.97),
        rgb=rng.uniform(0, 1, (n, 3)),
    )
    cfg_bg = dataclasses.replace(PAL, background=(0.3, 0.2, 0.1))
    cfg_bg_x = dataclasses.replace(XLA, background=(0.3, 0.2, 0.1))
    ip, auxp = render(g, default_camera, cfg_bg, return_aux=True)
    ix, auxx = render(g, default_camera, cfg_bg_x, return_aux=True)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ix), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(auxp["transmittance"]), np.asarray(auxx["transmittance"]), atol=1e-6
    )


def test_pallas_gradients_match_xla(rng, default_camera):
    g = make_random_scene(rng, n=100)

    def loss(g, cfg):
        return jnp.mean(render(g, default_camera, cfg) ** 2)

    gx = jax.grad(lambda g: loss(g, XLA))(g)
    gp = jax.grad(lambda g: loss(g, PAL))(g)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
