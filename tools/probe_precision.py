"""Headline-precision measurement (VERDICT r3 weak #4 / next-round #6).

The default stream table stores attributes as a bf16 hi+mid split (~16+
mantissa bits, ~2^-17 relative); stream_exact_table=True adds a third
part making the one-hot MXU reconstruction exact for every f32. This
probe renders the 1080p bench scene both ways ON THE REAL CHIP and
reports the pixel error of the default mode against the bit-exact one —
the number BASELINE's allclose metric needs recorded for the headline.

Usage: python tools/probe_precision.py [--n 1200000] [--scene bonsai]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--wh", default="1920x1080")
    ap.add_argument("--scene", default="bonsai", choices=["bonsai", "garden"])
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    from gsjax import RenderConfig, render
    from gsjax.bench.synth import bench_camera, bonsai_like, garden_like
    from gsjax.core.autotune import derive_caps

    if args.scene == "garden":
        g = garden_like(n=args.n if args.n != 1_200_000 else 5_000_000)
    else:
        g = bonsai_like(n=args.n, sh_degree=0)
    cam = bench_camera(width=W, height=H)
    cfg = derive_caps(g, cam, RenderConfig(backend="stream"))

    imgs = {}
    for exact in (True, False):
        c = dataclasses.replace(cfg, stream_exact_table=exact)
        img, aux = jax.jit(
            lambda g, c=c: render(g, cam, c, return_aux=True)
        )(g)
        img = np.asarray(jax.device_get(img))
        ovf = sum(
            int(aux[k])
            for k in ("n_pair_overflow", "n_band_overflow", "n_fat_overflow")
        )
        print(f"# exact={exact} overflow={ovf}")
        assert ovf == 0, "overflow would invalidate the comparison"
        imgs[exact] = img

    d = np.abs(imgs[True] - imgs[False])
    print(
        f"default (hi+mid bf16 split) vs bit-exact table @ {W}x{H} "
        f"{args.scene}:"
    )
    print(f"  max |err|        : {d.max():.3e}")
    print(f"  mean |err|       : {d.mean():.3e}")
    print(f"  frac > 1/255     : {(d > 1 / 255).mean():.3e}")
    print(f"  frac > 5e-4      : {(d > 5e-4).mean():.3e}")


if __name__ == "__main__":
    main()
