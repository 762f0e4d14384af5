"""Band-scratch occupancy at the bench scene: what stream_band_cap must be.

Root-causes the r2 bench's n_band_overflow=3705 (BENCH_r02.json): for each
(stream_block_tiles, stream_dma_chunk) combination, computes the EXACT
per-block scratch requirement — sum over the block's 3 runs of the
dmach-rounded run length, exactly the arithmetic of
pallas_stream.band_blocks — and reports the worst block. The required
cap = worst block requirement (rounded up to a dmach multiple).

Usage: python tools/probe_band_occupancy.py [--n 1200000] [--scene bonsai]
"""

import argparse
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

    from gsjax import RenderConfig
    from gsjax.bench.synth import bench_camera, bonsai_like, garden_like
    from gsjax.render.homesort import build_home_layout
    from gsjax.render.project import project

    cfg = RenderConfig(backend="stream")
    if args.scene == "garden":
        g = garden_like(n=args.n if args.n != 1_200_000 else 5_000_000)
    else:
        g = bonsai_like(n=args.n, sh_degree=0)
    cam = bench_camera(width=W, height=H)

    p = jax.jit(lambda g: project(g, cam, cfg))(g)
    _, layout = jax.jit(lambda p: build_home_layout(p, cam, cfg))(p)
    seg = np.asarray(layout.seg_starts)
    tiles_x, tiles_y = layout.tiles_x, layout.tiles_y
    print(f"# scene={args.scene} n={g.means.shape[0]} tiles={tiles_x}x{tiles_y} "
          f"NH={int(seg[-2])} live rows (seg_starts[-2])")

    # per-tile-row home-row counts (for the skew picture)
    row_n = seg[np.arange(1, tiles_y + 1) * tiles_x] - seg[
        np.arange(tiles_y) * tiles_x
    ]
    print(f"# per-tile-row home rows: mean={row_n.mean():.0f} "
          f"p95={np.percentile(row_n, 95):.0f} max={row_n.max()}")

    for blkw in (4, 6, 8):
        nbx = -(-tiles_x // blkw)
        for dmach in (512, 1024, 2048, 4096):
            worst = 0
            worst_exact = 0
            for y in range(tiles_y):
                for bx in range(nbx):
                    c0 = min(max(bx * blkw - 1, 0), tiles_x)
                    c1 = min(bx * blkw + blkw + 1, tiles_x)
                    need = 0
                    exact = 0
                    prev_end = 0
                    for r in range(3):
                        row = y - 1 + r
                        if row < 0 or row >= tiles_y:
                            continue
                        s = int(seg[row * tiles_x + c0])
                        e = int(seg[row * tiles_x + c1])
                        exact += e - s
                        st = max((s // dmach) * dmach, prev_end)
                        en = max(st, -(-e // dmach) * dmach)
                        prev_end = en
                        need += en - st
                    worst = max(worst, need)
                    worst_exact = max(worst_exact, exact)
            print(f"blkw={blkw} dmach={dmach:5d}: worst block exact={worst_exact:6d} "
                  f"rounded={worst:6d}  (cap must be >= rounded; "
                  f"VMEM bwd 3 bufs = {3 * worst * 64 / 2**20:.1f} MB)")


if __name__ == "__main__":
    main()
