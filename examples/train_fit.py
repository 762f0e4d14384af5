"""Differentiable fitting: perturb a scene, then recover it by gradient
descent on rendered targets — the capability the reference (a pure
viewer) lacks and BASELINE's north star adds."""

import jax
import jax.numpy as jnp
import numpy as np
from _common import demo_scene, out_path

from gsjax import Camera, RenderConfig, render
from gsjax.camera.orbit import OrbitCamera
from gsjax.train import default_optimizer, fit
from gsjax.utils.image import write_png


def main():
    cfg = RenderConfig(backend="auto")
    g_true = demo_scene(n=400, sh_degree=0)
    cams = OrbitCamera(radius=5.0, target=(0, 0, 4.0), beta=0.2).trajectory(
        4, width=128, height=96, fx=120.0, fy=120.0
    )
    targets = [render(g_true, c, cfg) for c in cams]

    # perturb the scene and fit it back
    key = jax.random.PRNGKey(1)
    import dataclasses

    g0 = dataclasses.replace(
        g_true,
        means=g_true.means + 0.03 * jax.random.normal(key, g_true.means.shape),
        sh=g_true.sh * 0.5,
    )
    loss0 = float(jnp.mean((render(g0, cams[0], cfg) - targets[0]) ** 2))
    # note: this is a tiny deterministic full-batch problem — Adam's
    # usual 3DGS learning rates (default_optimizer) overshoot here; a
    # small uniform rate descends cleanly
    import optax

    state, losses = fit(
        g0, cams, targets, cfg, steps=150,
        optimizer=optax.adam(2e-4), log_every=50,
    )
    g_fit = state.gaussians
    # fit() cycles the 4 orbit views, so per-step losses are not
    # comparable across steps — evaluate before/after on the SAME view
    loss1 = float(jnp.mean((render(g_fit, cams[0], cfg) - targets[0]) ** 2))
    print(f"view-0 loss {loss0:.3e} → {loss1:.3e} after {len(losses)} steps")
    assert loss1 < loss0, (loss0, loss1)
    write_png(out_path("fit_target.png"), targets[0])
    write_png(out_path("fit_result.png"), render(g_fit, cams[0], cfg))


if __name__ == "__main__":
    main()
