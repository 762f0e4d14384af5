"""Home-tile splat layout for the stream backend.

The stream backend (render/pallas_stream.py) eliminates every per-pair
HBM gather of the flat backend (measured ~7.4 ns/row on v5e — the
dominant frame cost, see render/DESIGN.md) by re-laying the splats out
ONCE per frame in (home_tile, depth) order:

  * a splat's *home tile* is the tile containing its 2D mean;
  * with the span-3 clamp (common.clamp_rect_to_span), every pair's tile
    is one of the 3×3 tiles centered on its splat's home tile, so the
    pairs of tile t all come from the 9 *contiguous* home segments of
    t's neighborhood — the blend kernel DMAs those segments to VMEM and
    turns per-pair attribute access into an MXU one-hot matmul;
  * gradients flow back the same way: the kernel accumulates per-row
    gradients into the home layout, and a single inverse-permutation
    row gather (with a custom gather-for-gather VJP, never a scatter)
    returns them to the caller's splat order.

This generalizes the reference's single global depth sort
(/root/reference/wasm/wasm.cpp:33-51) into the (home tile, depth) order
that makes tile rasterization gather-free on a TPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.core.camera import Camera
from gsjax.core.config import RenderConfig
from gsjax.core.gaussians import Gaussians
from gsjax.render.common import DEPTH_BITS, depth_key


@partial(jax.custom_vjp, nondiff_argnums=())
def permute_rows(x, perm, inv):
    """x[perm] with a gather-for-gather VJP: XLA's transpose of a gather
    is a scatter-add (~103 ns/row, microbench_mem.py); for a bijective
    permutation the cotangent is just the inverse gather (~7.4 ns/row)."""
    return x[perm]


def _permute_fwd(x, perm, inv):
    return x[perm], (perm, inv)


def _permute_bwd(res, d):
    perm, inv = res
    return (d[inv], None, None)


permute_rows.defvjp(_permute_fwd, _permute_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["perm", "inv", "seg_starts", "n_valid"],
    meta_fields=["tiles_x", "tiles_y"],
)
@dataclasses.dataclass(frozen=True)
class HomeLayout:
    """perm [N] i32: home row i holds original splat perm[i];
    inv [N] i32: original splat j sits at home row inv[j];
    seg_starts [T+2] i32: home rows of tile t are
    [seg_starts[t], seg_starts[t+1]); segment T holds culled splats;
    n_valid: scalar count of uncluded splats."""

    perm: jax.Array
    inv: jax.Array
    seg_starts: jax.Array
    n_valid: jax.Array
    tiles_x: int
    tiles_y: int


def _home_keys(g: Gaussians, cam: Camera, cfg: RenderConfig):
    """Cheap (home_tile | depth) u32 sort keys — the geometric subset of
    render/project.py (no conic, no SH), under stop_gradient: the
    permutation is order information, not a differentiable quantity."""
    means = jax.lax.stop_gradient(g.means)
    view = cam.view_matrix()
    W = view[:3, :3]
    t_cam = jnp.sum(means[:, None, :] * W[None, :, :], axis=-1) + view[:3, 3]
    z = t_cam[:, 2]
    in_front = z > cfg.near_cull
    zc = jnp.where(in_front, z, 1.0)
    inv_z = 1.0 / zc
    cx = (cam.width - 1.0) * 0.5
    cy = (cam.height - 1.0) * 0.5
    mx = cam.fx * t_cam[:, 0] * inv_z + cx
    my = cam.fy * t_cam[:, 1] * inv_z + cy

    tiles_x = cfg.tiles_x(cam.width)
    tiles_y = cfg.tiles_y(cam.height)
    htx = jnp.clip(
        jnp.floor(mx / cfg.tile_size).astype(jnp.int32), 0, tiles_x - 1
    )
    hty = jnp.clip(
        jnp.floor(my / cfg.tile_size).astype(jnp.int32), 0, tiles_y - 1
    )
    home = hty * tiles_x + htx
    # off-image/behind splats go to the trailing sentinel segment; the
    # precise cull happens in projection+binning exactly as for the other
    # backends (splats with home on-screen but footprint off remain valid)
    on = (
        in_front
        & (mx >= -cfg.tile_size * 2)
        & (mx < cam.width + cfg.tile_size * 2)
        & (my >= -cfg.tile_size * 2)
        & (my < cam.height + cfg.tile_size * 2)
    )
    # NOTE: splats within 2 tiles outside the viewport keep a CLIPPED
    # home tile so their in-image pairs stay renderable (home clipping
    # shifts their class offsets by at most the clip distance, which the
    # span window absorbs for ≤1-tile clips; beyond that their footprint
    # cannot reach the image interior for radius < 2 tiles).
    home = jnp.where(on, home, tiles_x * tiles_y)
    key = (
        home.astype(jnp.uint32) << jnp.uint32(DEPTH_BITS)
    ) | depth_key(jnp.where(in_front, z, 1.0))
    return key, on


def build_home_layout(g: Gaussians, cam: Camera, cfg: RenderConfig):
    """Sort the scene by (home tile, depth). Returns (g_home, HomeLayout).

    The param re-layout is one packed row gather through permute_rows, so
    both the forward and its cotangent cost one N-row gather."""
    n = g.n
    tiles_x = cfg.tiles_x(cam.width)
    tiles_y = cfg.tiles_y(cam.height)
    key, on = _home_keys(g, cam, cfg)
    # 2-key UNSTABLE sorts ≡ the stable single-key sorts (the second
    # operand is distinct and stability's tie order IS ascending index)
    key_sorted, perm = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    # inverse permutation via a second sort (3.45 ns/elem beats the
    # 5.3 ns/elem scatter-set — microbench_mem.py)
    _, inv = jax.lax.sort(
        (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    home_sorted = (key_sorted >> jnp.uint32(DEPTH_BITS)).astype(jnp.int32)
    seg_starts = jnp.searchsorted(
        home_sorted,
        jnp.arange(tiles_x * tiles_y + 2, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    k3 = g.sh.shape[1] * 3
    packed = jnp.concatenate(
        [
            g.means,
            g.log_scales,
            g.quats,
            g.opacity_logits[:, None],
            g.sh.reshape(n, k3),
        ],
        axis=-1,
    )
    ph = permute_rows(packed, perm, inv)
    g_home = Gaussians(
        means=ph[:, 0:3],
        log_scales=ph[:, 3:6],
        quats=ph[:, 6:10],
        opacity_logits=ph[:, 10],
        sh=ph[:, 11 : 11 + k3].reshape(n, g.sh.shape[1], 3),
    )
    layout = HomeLayout(
        perm=perm,
        inv=inv,
        seg_starts=seg_starts,
        n_valid=jnp.sum(on.astype(jnp.int32)),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )
    return g_home, layout
