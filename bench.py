"""Headline benchmark (BASELINE config 3): 1080p ORBIT trajectory,
forward+backward training steps on a Bonsai-scale scene (1.2M splats),
single chip.

The headline mode drives a real 30-view orbit (camera sweeping ~1°/view
— interactive-rate motion, ≙ the reference's rAF orbit loop,
/root/reference/examples/simple-server/src/main.ts:21-26) through the
LAZY path (render/lazy.py): at each view the layout is rebuilt (a
"resort": the fold-back + full prologue + re-extract), then
`--steps-per-view` training steps reuse it with fresh attributes — the
reference's own stale-permutation amortization (Worker.ts:45-57) made
explicit. Every static budget is autotuned for the TRAJECTORY's worst
view and every resort's overflow counters are gated.

Prints ONE JSON line:
  {"metric": "1080p_fwd_bwd_ms_per_frame", "value": <ms>, "unit": "ms",
   "vs_baseline": <8.0 / ms>, "mode": ..., ...}

vs_baseline is relative to the BASELINE.json north star (<8 ms/frame on
one v5p chip): >1.0 means the target is beaten. The Bonsai scene itself
is not downloadable in this environment (zero egress); the synthetic
scene matches its splat count and footprint statistics
(gsjax/bench/synth.py).

Modes (--mode):
  orbit        (default) lazy steps along the orbit, resort per view
  orbit-exact  the per-frame-exact pipeline at every orbit view
               (config 3 at its strictest: full sort+bin+blend per frame)
  fixed        r4-compatible fixed-camera exact bench (--frames steps)
  fixed-lazy   fixed camera, lazy with resort every --resort-every steps

Usage: python bench.py [--quick] [--mode M] [--views 30]
                       [--steps-per-view 16] [--scene bonsai|garden]
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 8.0


def perturb(g, seed: int = 7):
    """Small parameter noise for the training benches: the trained
    params start displaced from the scene that rendered the targets, so
    every step carries real gradient signal while the workload stays
    statistically the scene itself. (A black target is NOT usable for a
    long bench: hundreds of steps legitimately fade the scene to black
    and the kernels' early-termination makes the tail of the run
    fake-fast — measured: the 480-step orbit run's final loss hit 0.)"""
    import dataclasses as dc

    import numpy as np

    rng = np.random.default_rng(seed)
    return dc.replace(
        g,
        means=g.means + rng.normal(0, 2e-3, g.means.shape).astype("float32"),
        sh=g.sh + rng.normal(0, 2e-2, g.sh.shape).astype("float32"),
        opacity_logits=g.opacity_logits
        + rng.normal(0, 5e-2, g.opacity_logits.shape).astype("float32"),
    )


def orbit_cameras(views: int, width: int, height: int,
                  sweep_deg: float = 30.0):
    """`views` cameras sweeping `sweep_deg` of azimuth around the scene,
    starting at the fixed bench pose (so view 0's loss matches the fixed
    bench bit-for-bit). ~1°/view is display-rate orbit motion."""
    import numpy as np

    from gsjax.camera.orbit import OrbitCamera

    r = float(np.hypot(4.0, 0.6))
    beta = float(np.arcsin(-0.6 / r))
    oc = OrbitCamera(alpha=float(np.pi), beta=beta, radius=r,
                     target=(0.0, 0.0, 0.0))
    return oc.trajectory(
        views, alpha_end=float(np.deg2rad(sweep_deg)),
        fx=1600.0, fy=1600.0, width=width, height=height,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small scene smoke run")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument(
        "--mode",
        default="orbit",
        choices=["orbit", "orbit-exact", "fixed", "fixed-lazy"],
    )
    ap.add_argument("--views", type=int, default=30,
                    help="orbit views (BASELINE config 3: 30)")
    ap.add_argument("--steps-per-view", type=int, default=16,
                    help="lazy training steps per orbit view (layout "
                    "resorted at each view change)")
    ap.add_argument("--sweep-deg", type=float, default=30.0,
                    help="total orbit sweep; default ~1°/view")
    ap.add_argument("--frames", type=int, default=10,
                    help="steps for the fixed/fixed-lazy modes")
    ap.add_argument("--resort-every", type=int, default=16,
                    help="fixed-lazy: resort cadence K")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--forward-only", action="store_true",
                    help="fixed mode: time forward only")
    ap.add_argument(
        "--scene",
        default="bonsai",
        choices=["bonsai", "garden"],
        help="bonsai: 1.2M-splat headline scene (BASELINE config 3); "
        "garden: 5M-splat outdoor scan, sh degree 3 (config 4 scale)",
    )
    ap.add_argument(
        "--pair-cap",
        type=int,
        default=None,
        help="static pair budget override (default: measured by the "
        "occupancy pre-pass, core/autotune.py). Overflow is counted in "
        "aux and must be 0 for an honest run",
    )
    ap.add_argument(
        "--oh-cache",
        action="store_true",
        help="stream_oh_cache=True: the backward scatter reuses the "
        "gather rounds' one-hot matrices from a VMEM cache",
    )
    ap.add_argument(
        "--no-autotune",
        action="store_true",
        help="skip the occupancy pre-pass (use raw config defaults)",
    )
    ap.add_argument(
        "--exact",
        action="store_true",
        help="stream_exact_table=True: bit-exact f32 attributes through "
        "the blend (3-part bf16 split; ~1.5x band DMA)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gsjax.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()  # 57 s first compile → ~11 s on re-runs

    from gsjax import RenderConfig, render
    from gsjax.bench.synth import bench_camera, bonsai_like, garden_like

    backend = args.backend or ("stream" if jax.default_backend() == "tpu" else "xla")
    try:
        if backend in ("pallas", "stream"):
            from gsjax.render import pallas_flat  # noqa: F401
    except ImportError:
        backend = "xla"

    if args.quick:
        n = args.n or 50_000
        width, height = 640, 480
        cfg = RenderConfig(
            backend=backend, tile_list_cap=512, chunk=128,
            stream_exact_table=args.exact,
        )
    else:
        n = args.n or 1_200_000
        width, height = args.width, args.height
        cfg = RenderConfig(
            backend=backend,
            tile_list_cap=1024,
            chunk=128,
            pair_cap=args.pair_cap or None,
            stream_exact_table=args.exact,
            stream_oh_cache=args.oh_cache,
        )

    if args.scene == "garden":
        n = args.n or 5_000_000
        g = garden_like(n=n)
    else:
        g = bonsai_like(n=n, sh_degree=0)

    orbit = args.mode in ("orbit", "orbit-exact") and not args.quick
    if orbit:
        cams = orbit_cameras(args.views, width, height, args.sweep_deg)
    else:
        cams = [bench_camera(width=width, height=height)]

    # occupancy pre-pass: size every static budget (band scratch, fat
    # caps, pair budget, repack grid) for the WORST view of the
    # trajectory — one measured pass per view through one compiled
    # program (core/autotune.py)
    if backend == "stream" and not args.quick and not args.no_autotune:
        from gsjax.core.autotune import derive_caps

        t0 = time.perf_counter()
        cfg = derive_caps(g, cams, cfg)
        print(
            f"# autotune {(time.perf_counter() - t0):.1f}s over "
            f"{len(cams)} view(s): pair_cap={cfg.pair_cap} "
            f"repack_w={cfg.repack_w} "
            f"repack_rows={cfg.repack_rows} band_cap={cfg.stream_band_cap} "
            f"blkw={cfg.stream_block_tiles} fat_cap={cfg.fat_cap} "
            f"live_cap={cfg.fat_live_cap}",
            file=sys.stderr,
        )
    if args.pair_cap:
        cfg = dataclasses.replace(cfg, pair_cap=args.pair_cap)

    opt = optax.adam(1e-3)
    extra = {"mode": args.mode, "scene": args.scene}

    lazy_mode = args.mode in ("orbit", "fixed-lazy") and not args.quick
    if args.mode == "fixed" or args.quick:
        # r4-comparable: fixed camera, black target, few frames (the
        # scene cannot decay meaningfully in 10 steps)
        targets = [jnp.zeros((height, width, 3), jnp.float32)]
        g_train = g
    else:
        # long training runs: render each view's target from the clean
        # scene and train a perturbed copy toward it — real gradients,
        # stationary workload (see perturb())
        import numpy as np

        render_t = jax.jit(lambda g, cam: render(g, cam, cfg))
        t0 = time.perf_counter()
        # garden cannot keep 30 device targets + the 5M-splat home state
        # resident: store its targets HOST-side as bf16 and upload one
        # per view (~12 MB/view, amortized over steps_per_view); bonsai
        # keeps them on device
        host_targets = args.scene == "garden"
        targets = []
        for cam in cams:
            t = render_t(g, cam)
            if host_targets:
                t = np.asarray(jax.device_get(t), np.float32).astype(
                    jnp.bfloat16
                )
            targets.append(t)
        if not host_targets:
            jax.device_get(targets[-1].ravel()[0])
        black = float(jnp.mean(jnp.asarray(targets[0], jnp.float32) ** 2))
        print(
            f"# targets: {len(targets)} view renders in "
            f"{time.perf_counter() - t0:.1f}s; black-target loss of view 0 "
            f"= {black:.5f} (r4 fixed-bench continuity)",
            file=sys.stderr,
        )
        extra["black_loss0"] = round(black, 5)
        g_train = perturb(g)
        g = None  # the clean scene's buffers are no longer needed

    if lazy_mode:
        ms, extra2 = run_lazy(args, g_train, cams, cfg, opt, targets, jax,
                              jnp)
    else:
        ms, extra2 = run_exact(args, g_train, cams, cfg, opt, targets,
                               backend, jax, jnp, render)
    extra.update(extra2)

    print(
        json.dumps(
            {
                "metric": "1080p_fwd_bwd_ms_per_frame",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 4),
                **extra,
            }
        )
    )


def run_exact(args, g, cams, cfg, opt, targets, backend, jax, jnp, render):
    """Per-frame-exact step (full sort+bin+blend each frame). Camera is a
    TRACED argument: one compile covers every orbit view."""
    import optax

    target = jnp.asarray(targets[0])

    if args.forward_only:

        @jax.jit
        def step(g, opt_state, target, cam):
            return g, opt_state, jnp.mean(render(g, cam, cfg))

    else:
        # donate params + opt state: the step consumes and replaces them,
        # and the dead copies are ~2.4 GB at garden scale (5M splats)
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(g, opt_state, target, cam):
            def loss_fn(g):
                img = render(g, cam, cfg)
                return jnp.mean((img - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(g)
            updates, opt_state2 = opt.update(grads, opt_state, g)
            g2 = optax.apply_updates(g, updates)
            return g2, opt_state2, loss

    # honesty gate on EVERY view: the static budgets must not truncate
    # any frame of the trajectory — a nonzero overflow means silently
    # dropped work, so fail rather than report
    aux_fn = jax.jit(lambda g, cam: render(g, cam, cfg, return_aux=True)[1])
    ovf_keys = ("n_pair_overflow", "n_band_overflow", "n_tile_overflow",
                "n_fat_overflow", "n_clamped")
    auxes = [aux_fn(g, cam) for cam in cams]
    _gate_overflow(
        [{k: a[k] for k in ovf_keys if k in a} for a in auxes], jax
    )

    opt_state = opt.init(g)
    # compile + warmup
    t0 = time.perf_counter()
    g1, opt_state1, loss = step(g, opt_state, target, cams[0])
    jax.device_get(loss)  # block_until_ready does not block through axon
    compile_s = time.perf_counter() - t0
    loss0 = float(loss)
    print(
        f"# mode={args.mode} backend={backend} n={g.means.shape[0]} "
        f"{cams[0].width}x{cams[0].height} compile={compile_s:.1f}s "
        f"loss0={loss0:.5f}",
        file=sys.stderr,
    )

    if args.mode == "orbit-exact":
        # one fwd+bwd step at every orbit view
        t0 = time.perf_counter()
        for i, cam in enumerate(cams):
            g1, opt_state1, loss = step(
                g1, opt_state1, jnp.asarray(targets[i]), cam
            )
        jax.device_get(loss)
        ms = (time.perf_counter() - t0) / len(cams) * 1e3
        return ms, {"views": len(cams), "loss0": round(loss0, 5),
                    "sweep_deg": args.sweep_deg,
                    "final_loss": round(float(loss), 5)}

    # fixed camera: K frames, re-feeding the updated params
    t0 = time.perf_counter()
    for _ in range(args.frames):
        g1, opt_state1, loss = step(g1, opt_state1, target, cams[0])
    jax.device_get(loss)
    ms = (time.perf_counter() - t0) / args.frames * 1e3
    return ms, {"frames": args.frames, "loss0": round(loss0, 5)}


def run_lazy(args, g, cams, cfg, opt, targets, jax, jnp):
    """Lazy modes: resort (fold + full prologue + extract) at each view
    change (orbit) or every K steps (fixed-lazy); steps in between reuse
    the layout with fresh attributes (render/lazy.py)."""
    from gsjax.render.lazy import LazyTrainer

    if cfg.backend != "stream":
        raise SystemExit("# lazy modes need the stream backend (TPU)")

    # garden cannot afford the packed [NH, C] resort snapshot (~3.9 GB);
    # the fold re-derives it from the master instead
    snap = args.scene != "garden"
    tr = LazyTrainer(g, cfg, opt, snapshot=snap)
    # warm every compile path (plan, extract, step, fold) without
    # counting it; loss0 of the very first step is the exact-path loss
    # (the post-resort step IS exact)
    t0 = time.perf_counter()
    tgt0 = jnp.asarray(targets[0])
    tr.resort(cams[0])
    loss0 = float(jax.device_get(tr.step(tgt0, cams[0])))
    tr.resort(cams[0])  # compiles the fold
    tr.step(tgt0, cams[0])
    jax.device_get(jax.tree.leaves(tr.hp)[0].ravel()[0])
    compile_s = time.perf_counter() - t0
    print(
        f"# mode={args.mode} backend=stream n={g.means.shape[0]} "
        f"{cams[0].width}x{cams[0].height} compile={compile_s:.1f}s "
        f"loss0={loss0:.5f}",
        file=sys.stderr,
    )

    # fresh trainer for the timed run (jits are module-level: warm)
    tr = LazyTrainer(g, cfg, opt, snapshot=snap)
    ovfs = []
    if args.mode == "orbit":
        spv = args.steps_per_view
        # throttle the async dispatch stream: unsynced, the host races
        # views ahead and the queued computations' buffers stack up
        # (measured: garden OOMs mid-orbit). But each sync also exposes
        # the host's dispatch latency that otherwise hides under device
        # compute (measured: +25 ms/step on bonsai at sync-every-view),
        # so sync only as often as memory requires: every view when
        # targets are host-resident (garden), every 8 views otherwise.
        import numpy as _np

        sync_every = 1 if isinstance(targets[0], _np.ndarray) else 8
        t0 = time.perf_counter()
        for i, cam in enumerate(cams):
            tgt = jnp.asarray(targets[i])  # uploads host targets once/view
            tr.resort(cam)
            ovfs.append(tr.plan.ovf)
            for _ in range(spv):
                loss = tr.step(tgt, cam)
            if i % sync_every == sync_every - 1:
                jax.device_get(loss)
        tr.sync()
        jax.device_get(jax.tree.leaves(tr.g)[0].ravel()[0])
        n_steps = len(cams) * spv
        ms = (time.perf_counter() - t0) / n_steps * 1e3
        extra = {"views": len(cams), "steps_per_view": spv,
                 "sweep_deg": args.sweep_deg, "loss0": round(loss0, 5),
                 "resorts": len(cams)}
    else:  # fixed-lazy
        K = args.resort_every
        n_steps = args.frames
        cam = cams[0]
        t0 = time.perf_counter()
        for s in range(n_steps):
            if s % K == 0:
                tr.resort(cam)
                ovfs.append(tr.plan.ovf)
                jax.device_get(tr.plan.ty0)  # dispatch throttle (see orbit)
            loss = tr.step(tgt0, cam)
        tr.sync()
        jax.device_get(jax.tree.leaves(tr.g)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / n_steps * 1e3
        extra = {"frames": n_steps, "resort_every": K,
                 "loss0": round(loss0, 5)}

    _gate_overflow(ovfs, jax)
    extra["final_loss"] = round(float(jax.device_get(loss)), 5)
    return ms, extra


def _gate_overflow(ovfs, jax):
    """All resorts/views must be overflow-free or the run FAILS (the
    timing would not measure the claimed semantics)."""
    bad = 0
    tot = {}
    for o in ovfs:
        o = {k: int(v) for k, v in jax.device_get(o).items()}
        for k, v in o.items():
            if k.startswith("n_") and k != "n_pairs":
                tot[k] = tot.get(k, 0) + v
                bad += v
    print(f"# overflow over {len(ovfs)} view(s): {bad} (must be 0) {tot}",
          file=sys.stderr)
    if bad:
        print(
            "# FAIL: overflow counters nonzero — a frame truncated work; "
            "raise the corresponding budget (see core/config.py) and re-run",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
