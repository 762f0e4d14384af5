"""Lazy tile-sharded scaling on the one real chip (BASELINE config 5
follow-up to tools/bench_scaling.py --band-subset).

Simulates each device of a D-device equal-content mesh: per band, build
the band's frame plan (the per-device RESORT: prefilter → home layout →
slice → band streams), extract band-home params, and time the lazy
steps — project(band share) + band kernels + adam, no sort or gather.
The r4 analysis pinned the 48% efficiency ceiling on the ~35 ms/device
replicated prologue; the lazy step amortizes exactly that prologue over
the resort period, so this measures what rung 1 buys config 5.

Worst device = step time; amortized adds the band resort / K.

  python tools/bench_scaling_lazy.py [--n 1200000] [--devices 1 8]
                                     [--steps 10] [--resort-every 16]
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--resort-every", type=int, default=16)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 8])
    ap.add_argument(
        "--row-weight", type=float, default=None,
        help="skip the equal-cand run + fit iterations and cut directly "
        "with this row_weight (cand/row; the r5 fitted value is ~322892)",
    )
    ap.add_argument(
        "--band-caps", action="store_true",
        help="final variant derives PER-BAND prefilter/slice/pair caps "
        "(derive_shard_caps on the single band) on top of per-band "
        "block widths — cuts the candidate-independent base "
        "(project+table+adam over the shared worst-band slice cap) for "
        "the sparse edge bands; one compile per distinct cap tuple",
    )
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    from gsjax.utils.compile_cache import enable as _cc

    _cc()

    import jax
    import jax.numpy as jnp
    import optax

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like
    from gsjax.core.autotune import (
        derive_caps,
        derive_row_cuts,
        derive_shard_caps,
        measure_occupancy,
    )
    from gsjax.render.lazy import (
        build_band_plan,
        build_frame_plan,
        extract_home,
        make_lazy_step,
    )

    cam = bench_camera(width=W, height=H)
    g = bonsai_like(n=args.n, sh_degree=0)
    base_cfg = RenderConfig(backend="stream")
    m = measure_occupancy(g, cam, base_cfg)
    base_cfg = derive_caps(g, cam, base_cfg, ms=[m])
    tiles_y = base_cfg.tiles_y(H)
    ts = base_cfg.tile_size
    opt = optax.adam(1e-3)
    ex = jax.jit(extract_home)

    def sync(x):
        jax.device_get(jax.tree.leaves(x)[0].ravel()[0])

    def time_steps(cfg, plans, band_rows):
        """Per-plan lazy-step ms + steady resort ms (one compile for
        all plans of this cfg — shapes match)."""
        step = make_lazy_step(cfg, opt)
        # full-image plans crop to the viewport; band plans keep the
        # band-padded height
        hrows = H if band_rows >= tiles_y else band_rows * ts
        target = jnp.zeros((hrows, W, 3), jnp.float32)
        out = []
        for mk in plans:
            plan = mk()
            hp, hopt = ex((g, opt.init(g)), plan)
            hp, hopt, loss = step(hp, hopt, target, cam, plan)  # warm
            jax.device_get(loss)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                hp, hopt, loss = step(hp, hopt, target, cam, plan)
            jax.device_get(loss)
            ms = (time.perf_counter() - t0) / args.steps * 1e3
            ovf = {k: int(v) for k, v in jax.device_get(plan.ovf).items()}
            assert (
                ovf["n_pair_overflow"] == 0
                and ovf["n_band_overflow"] == 0
                and ovf["n_fat_overflow"] == 0
            ), ovf
            # steady resort (plan rebuild; extract rides along) — min of
            # 2 reps (the first re-dispatch through the tunnel is noisy)
            rs = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                plan = mk()
                hp2, _ = ex((g, opt.init(g)), plan)
                sync(hp2)
                rs = min(rs, (time.perf_counter() - t0) * 1e3)
            out.append((ms, rs))
        return out

    import numpy as np

    def run_equalized(d, row_weight, dmach=None, label="",
                      per_band_blkw=False, per_band_caps=False):
        import dataclasses

        from gsjax.core.autotune import _band_worst_block, _round_up

        cuts = derive_row_cuts(g, cam, base_cfg, d, m=m,
                               row_weight=row_weight)
        rows_d = [cuts[i + 1] - cuts[i] for i in range(d)]
        band_max = max(rows_d)
        bands = list(zip(cuts[:-1], rows_d))
        cfg_e = derive_shard_caps(g, cam, base_cfg, bands=bands, m=m)
        if dmach:
            cfg_e = dataclasses.replace(cfg_e, stream_dma_chunk=dmach)
        print(f"# D={d}{label} cuts={cuts} caps: "
              f"prefilter={cfg_e.shard_prefilter_cap} "
              f"slice={cfg_e.shard_slice_cap} pairs={cfg_e.pair_cap} "
              f"dmach={cfg_e.stream_dma_chunk}",
              flush=True)
        if not per_band_blkw:
            plans = [
                (lambda t=t, r=r: build_band_plan(
                    g, cam, cfg_e, t, band_max, r))
                for t, r in bands
            ]
            return rows_d, time_steps(cfg_e, plans, band_max)
        # per-band block widths: the row-proportional step cost is the
        # per-touched-block band DMA/flush, so a sparse band can take a
        # WIDE block (fewer blocks/row) while the dense band keeps the
        # narrow one that fits VMEM. Per-band cfg → per-band compiles.
        import numpy as np_

        seg = m["seg"]
        tiles_x, tiles_y = m["tiles_x"], m["tiles_y"]
        dmc = cfg_e.stream_dma_chunk
        cap_budget = (25 * 2**19) // (32 * 2 + 2 * 16 * 4)
        cap_budget = (cap_budget // dmc) * dmc
        res = []
        for ty0, rows in bands:
            cfg_band = cfg_e
            if per_band_caps:
                # this band's OWN prefilter/slice/pair caps: the lazy
                # step's candidate-independent base (project + table +
                # adam) runs over the static slice cap, which the shared
                # worst-band cap sets ~2× too big for the sparse edge
                # bands — exactly the bands the row-weighted cuts made
                # worst-device
                cfg_band = derive_shard_caps(
                    g, cam, base_cfg, bands=[(ty0, rows)], m=m
                )
                if dmach:
                    cfg_band = dataclasses.replace(
                        cfg_band, stream_dma_chunk=dmach
                    )
                print(f"#   band ty0={ty0} caps: "
                      f"prefilter={cfg_band.shard_prefilter_cap} "
                      f"slice={cfg_band.shard_slice_cap} "
                      f"pairs={cfg_band.pair_cap}", flush=True)
            # band-local worst block pre-screen (full-image occupancy:
            # an ESTIMATE — it measured ~30% short on one band), then
            # gate on the ACTUAL plan's overflow counter, falling back
            # to narrower blocks
            r0, r1 = max(ty0 - 1, 0), min(ty0 + rows + 1, tiles_y)
            segb = seg.copy()
            segb[: r0 * tiles_x] = seg[r0 * tiles_x]
            segb[r1 * tiles_x :] = seg[r1 * tiles_x]
            base_w = cfg_band.stream_block_tiles
            cands = [
                w for w in (14, 12, 10, 8)
                if w > base_w
                and _round_up(
                    int(_band_worst_block(segb, tiles_x, tiles_y, w, dmc)),
                    dmc,
                ) <= cap_budget
            ] + [base_w]
            for blkw in cands:
                cfg_b = dataclasses.replace(
                    cfg_band,
                    stream_block_tiles=blkw,
                    # fixed budget-max cap: bands sharing a blkw share
                    # one compiled program
                    stream_band_cap=cap_budget,
                )
                plan = build_band_plan(g, cam, cfg_b, ty0, band_max, rows)
                ovfb = int(jax.device_get(plan.ovf["n_band_overflow"]))
                if ovfb == 0:
                    break
                print(f"#   band ty0={ty0}: blkw={blkw} overflows "
                      f"{ovfb} rows — narrowing", flush=True)
            print(f"#   band ty0={ty0} rows={rows}: blkw={blkw}",
                  flush=True)
            res += time_steps(
                cfg_b,
                [lambda t=ty0, r=rows, c=cfg_b: build_band_plan(
                    g, cam, c, t, band_max, r)],
                band_max,
            )
        return rows_d, res

    def report(d, res, label=""):
        ms = [r[0] for r in res]
        rs = [r[1] for r in res]
        worst = max(ms)
        worst_am = max(s + r / K for s, r in res)
        print(
            f"D={d}{label}: worst-device step {worst:7.1f} ms "
            f"(eff {base / worst / d * 100:4.0f}%)   amortized K={K} "
            f"{worst_am:7.1f} ms (eff {base_am / worst_am / d * 100:4.0f}%)"
            f"   per-band step " + " ".join(f"{x:.0f}" for x in ms)
            + "   resort " + " ".join(f"{x:.0f}" for x in rs),
            flush=True,
        )
        return worst

    base = base_am = None
    K = args.resort_every
    for d in args.devices:
        if d == 1:
            plans = [lambda: build_frame_plan(g, cam, base_cfg)]
            res = time_steps(base_cfg, plans, tiles_y)
            ms0, rs0 = res[0]
            base, base_am = ms0, ms0 + rs0 / K
            report(d, res)
            continue
        if args.row_weight is not None:
            rw = args.row_weight
            _, res4 = run_equalized(
                d, rw,
                label=" rw+band-blkw" + ("+caps" if args.band_caps else ""),
                per_band_blkw=True, per_band_caps=args.band_caps,
            )
            report(d, res4,
                   " rw+band-blkw" + ("+caps" if args.band_caps else ""))
            continue
        rows_d, res = run_equalized(d, 0.0)
        report(d, res, " equal-cand")
        # fit step ≈ a·cand_share + b·rows from the measured bands and
        # re-cut with row_weight = b/a (candidate-units per row): sparse
        # many-row bands pay the dmach-rounded per-block band DMA/flush
        # regardless of content, so pure candidate cuts are row-bound.
        # Iterate the fit on its own measurement once (the first round's
        # equal-cand bands only probe the extremes of the rows axis).
        # A dmach=512 variant measured WORSE (26.8 vs 23.7 ms worst: the
        # band-load fori overhead exceeds the rounding saved) — dead end.
        rw = 0.0
        total = float(m["cand"].sum())
        for it in range(2):
            ms = np.asarray([r[0] for r in res])
            rows = np.asarray(rows_d, np.float64)
            A = np.stack([np.ones_like(rows), rows], axis=1)
            c0, b = np.linalg.lstsq(A, ms, rcond=None)[0]
            a = max(c0, 1e-3) / (total / d)
            rw = max(b, 0.0) / a if b > 0 else rw
            print(f"# D={d} it{it} fitted step ≈ {c0:.1f} + {b:.2f}·rows "
                  f"ms → row_weight {rw:,.0f} cand/row", flush=True)
            rows_d, res = run_equalized(d, rw, label=f" row-weighted it{it}")
            report(d, res, f" row-weighted it{it}")
        # per-band block widths on the final cuts (sparse bands take
        # wide blocks → fewer per-row DMA/flush fixed costs)
        _, res4 = run_equalized(d, rw, label=" rw+band-blkw",
                                per_band_blkw=True)
        report(d, res4, " rw+band-blkw")


if __name__ == "__main__":
    main()
