"""Bench-scale drift of the lazy path vs the per-frame-exact path
(DESIGN.md r5: the bound the lazy headline stands on).

Protocol: 1080p bench camera, bonsai 1.2M, targets rendered from the
clean scene, training a perturbed copy (the stationary-workload setup of
bench.py). The exact trajectory (full resort every step) is the
reference; lazy runs at K ∈ {1, 4, 16} resort cadence. Reported per K:
max relative per-step loss drift, final-loss ratio, post-sync exact
rendered loss, and max parameter drift relative to leaf scale.

  python tools/probe_lazy_drift.py [--n 1200000] [--steps 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--wh", default="1920x1080")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--ks", type=int, nargs="*", default=[1, 4, 16])
    ap.add_argument("--fold-moments", default="primary",
                    choices=["primary", "mean"])
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    from gsjax.utils.compile_cache import enable as _cc

    _cc()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from functools import partial

    from gsjax import RenderConfig, render
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.core.autotune import derive_caps
    from gsjax.render.lazy import LazyTrainer

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    from bench import perturb

    cam = bench_camera(width=W, height=H)
    g0 = bonsai_like(n=args.n, sh_degree=0)
    cfg = derive_caps(g0, cam, RenderConfig(backend="stream"))
    target = jax.jit(lambda g: render(g, cam, cfg))(g0)
    g = perturb(g0)
    opt = optax.adam(1e-3)

    # no donation: `g` is reused as the lazy runs' starting point
    @jax.jit
    def exact_step(g, s, target):
        def lf(g):
            return jnp.mean((render(g, cam, cfg) - target) ** 2)

        loss, grads = jax.value_and_grad(lf)(g)
        u, s = opt.update(grads, s, g)
        return optax.apply_updates(g, u), s, loss

    eloss_j = jax.jit(lambda g: jnp.mean((render(g, cam, cfg) - target) ** 2))

    t0 = time.perf_counter()
    ge, se = g, opt.init(g)
    el = []
    for _ in range(args.steps):
        ge, se, loss = exact_step(ge, se, target)
        el.append(float(jax.device_get(loss)))
    print(f"# exact {args.steps} steps in {time.perf_counter()-t0:.1f}s "
          f"loss {el[0]:.3e} -> {el[-1]:.3e}", flush=True)
    el = np.asarray(el)

    for K in args.ks:
        tr = LazyTrainer(g, cfg, opt, fold_moments=args.fold_moments)
        ll = []
        t0 = time.perf_counter()
        for s in range(args.steps):
            if s % K == 0:
                tr.resort(cam)
            ll.append(float(jax.device_get(tr.step(target, cam))))
        gl = tr.sync()
        dt = time.perf_counter() - t0
        ll = np.asarray(ll)
        rel = np.abs(ll - el) / np.maximum(np.abs(el), 1e-12)
        le = float(jax.device_get(eloss_j(gl)))
        lee = float(jax.device_get(eloss_j(ge)))
        pd = {}
        for f in ("means", "log_scales", "quats", "sh", "opacity_logits"):
            a = np.asarray(getattr(ge, f))
            b = np.asarray(getattr(gl, f))
            pd[f] = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
        psnr = lambda x: -10.0 * np.log10(max(x, 1e-12))
        print(
            f"K={K:3d}: max step-loss drift {rel.max()*100:6.2f}%  "
            f"final lazy/exact {ll[-1]/el[-1]:6.3f}  "
            f"post-sync exact-rendered loss {le:.3e} (exact path {lee:.3e})  "
            f"max param drift {max(pd.values())*100:.2f}% "
            f"({max(pd, key=pd.get)})  [{dt:.1f}s]\n"
            f"       PSNR vs target: start {psnr(el[0]):.1f} dB → exact "
            f"{psnr(lee):.1f} dB, lazy in-window {psnr(ll[-1]):.1f} dB, "
            f"lazy post-sync {psnr(le):.1f} dB",
            flush=True,
        )


if __name__ == "__main__":
    main()
