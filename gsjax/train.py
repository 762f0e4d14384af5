"""Training: fit Gaussians to target images by gradient descent.

The reference is a pure viewer — differentiability and training are the
capabilities this framework adds on top (BASELINE north star). This
module provides the standard 3DGS-style fitting loop over posed target
images: render → L2/SSIM-free photometric loss → Adam on the raw
parameter pytree, single-chip or tile-sharded over a mesh
(gsjax.parallel).

Checkpoint/resume uses orbax (SURVEY §5.4: the reference's only
persistence is scene→.splat and camera→JSON; those round-trips live in
gsjax.io / gsjax.camera.json_io — this adds optimizer-state checkpoints
for long training runs).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsjax.core.camera import Camera
from gsjax.core.config import RenderConfig
from gsjax.core.gaussians import Gaussians
from gsjax.render.pipeline import render


@dataclasses.dataclass
class TrainState:
    gaussians: Gaussians
    opt_state: object
    step: int = 0


def default_optimizer(
    lr_means: float = 1.6e-4,
    lr_scales: float = 5e-3,
    lr_quats: float = 1e-3,
    lr_sh: float = 2.5e-3,
    lr_opacity: float = 5e-2,
):
    """Per-parameter Adam, 3DGS-style learning-rate split."""
    labels = Gaussians(
        means="means",
        log_scales="log_scales",
        quats="quats",
        sh="sh",
        opacity_logits="opacity_logits",
    )
    return optax.multi_transform(
        {
            "means": optax.adam(lr_means),
            "log_scales": optax.adam(lr_scales),
            "quats": optax.adam(lr_quats),
            "sh": optax.adam(lr_sh),
            "opacity_logits": optax.adam(lr_opacity),
        },
        labels,
    )


def make_step_fn(cam: Camera, cfg: RenderConfig, optimizer):
    """Single-chip jitted train step: (state, target) → (state, loss).

    Params and optimizer state are donated: the step consumes and
    replaces them, and the dead copies are ~2.4 GB at 5M-splat scale."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(g, opt_state, target):
        def loss_fn(g):
            img = render(g, cam, cfg)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(g)
        updates, opt_state = optimizer.update(grads, opt_state, g)
        g = optax.apply_updates(g, updates)
        return g, opt_state, loss

    return step


def fit(
    g: Gaussians,
    cameras,
    targets,
    cfg: RenderConfig = RenderConfig(),
    steps: int = 100,
    optimizer=None,
    mesh=None,
    log_every: int = 0,
):
    """Fit `g` to (cameras[i], targets[i]) pairs, cycling through views.

    With `mesh`, uses the tile-sharded training step (all cameras must
    share width/height).

    NOTE: the single-chip step donates its input buffers, so the
    caller's `g` (and any aliases of its leaves) must not be used after
    calling fit on an accelerator backend — read the fitted parameters
    from the returned TrainState."""
    optimizer = optimizer or default_optimizer()
    opt_state = optimizer.init(g)
    losses = []

    if mesh is not None:
        from gsjax.parallel.render_sharded import make_train_step, pad_target

        n_dev = mesh.shape["tiles"]
        steps_fns = {}
        padded = [
            pad_target(cfg, cameras[i], targets[i], n_dev)
            for i in range(len(cameras))
        ]
        for i, cam in enumerate(cameras):
            key = (cam.width, cam.height)
            if key not in steps_fns:
                steps_fns[key] = make_train_step(cam, cfg, mesh, optimizer)
        for s in range(steps):
            i = s % len(cameras)
            cam = cameras[i]
            g, opt_state, loss, _aux = steps_fns[(cam.width, cam.height)](
                g, opt_state, padded[i]
            )
            losses.append(float(loss))
            if log_every and s % log_every == 0:
                print(f"step {s}: loss {losses[-1]:.6f}")
        return TrainState(g, opt_state, steps), losses

    step_fns = {}
    tgts = [jnp.asarray(t, jnp.float32) for t in targets]
    for s in range(steps):
        i = s % len(cameras)
        cam = cameras[i]
        key = (cam.width, cam.height)
        if key not in step_fns:
            step_fns[key] = make_step_fn(cam, cfg, optimizer)
        g, opt_state, loss = step_fns[key](g, opt_state, tgts[i])
        losses.append(float(loss))
        if log_every and s % log_every == 0:
            print(f"step {s}: loss {losses[-1]:.6f}")
    return TrainState(g, opt_state, steps), losses


# -- checkpointing ----------------------------------------------------------


def save_checkpoint(path, state: TrainState):
    """Orbax checkpoint of params + optimizer state + step."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(
        path,
        {
            "gaussians": dataclasses.asdict(state.gaussians),
            "opt_state": state.opt_state,
            "step": state.step,
        },
        force=True,
    )


def load_checkpoint(path, reference: TrainState) -> TrainState:
    """Restore a checkpoint written by save_checkpoint; `reference`
    provides the pytree structure (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(
        path,
        item={
            "gaussians": dataclasses.asdict(reference.gaussians),
            "opt_state": reference.opt_state,
            "step": reference.step,
        },
    )
    return TrainState(
        gaussians=Gaussians(**restored["gaussians"]),
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
