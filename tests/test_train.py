"""Training-loop tests: loss decreases, checkpoint round-trips."""

import dataclasses

import numpy as np
import jax
import pytest

from gsjax import Camera, RenderConfig, render
from gsjax.train import (
    TrainState,
    default_optimizer,
    fit,
    load_checkpoint,
    save_checkpoint,
)
from conftest import make_random_scene

CFG = RenderConfig(backend="xla", tile_list_cap=128, chunk=32)


def test_fit_recovers_perturbation(rng):
    g = make_random_scene(rng, n=60)
    cams = [Camera.create(fx=90, fy=90, width=64, height=48)]
    targets = [np.asarray(render(g, c, CFG)) for c in cams]
    g0 = dataclasses.replace(g, means=g.means + 0.02)
    import optax

    state, losses = fit(
        g0, cams, targets, CFG, steps=60, optimizer=optax.adam(3e-4)
    )
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_checkpoint_roundtrip(rng, tmp_path):
    g = make_random_scene(rng, n=20)
    opt = default_optimizer()
    state = TrainState(g, opt.init(g), step=7)
    save_checkpoint(tmp_path / "ckpt", state)
    g2 = dataclasses.replace(g, means=g.means * 0.0)
    ref = TrainState(g2, opt.init(g2), step=0)
    restored = load_checkpoint(tmp_path / "ckpt", ref)
    assert restored.step == 7
    np.testing.assert_allclose(
        np.asarray(restored.gaussians.means), np.asarray(g.means), atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
