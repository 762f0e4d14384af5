"""Home-tile splat layout for the stream backend.

The stream backend (render/pallas_stream.py) eliminates every per-pair
HBM gather of the flat backend (measured ~7.4 ns/row on v5e — the
dominant frame cost, see render/DESIGN.md) by re-laying the *projected*
splats out ONCE per frame in (home_tile, depth) order:

  * a splat's *home tile* is the center of the 3×3-tile block of its
    footprint rect it is responsible for, so every pair's tile is one of
    the 9 fixed class offsets from its home — the blend kernel DMAs the
    home segments of a tile's neighborhood to VMEM and turns per-pair
    attribute access into an MXU one-hot matmul;
  * EXACT footprints (cfg.footprint_clamp=False, the default): a splat
    whose rect spans more than one 3×3-tile block is *split* — extra
    home rows are appended, one per additional block, each a copy of the
    parent's projected attributes homed at that block's center tile and
    windowed to block ∩ rect. The blocks partition the rect, so the
    merged (tile, depth) pair stream is identical to an unclamped
    enumeration and compositing is exact (≙ the reference's up-to-1024-px
    screen axes, vertex.glsl.ts:173-175 — the budget clamp of round 1 is
    gone). Budget overflow (fat_splats_cap / fat_max_blocks / fat_cap)
    is truncated far-blocks-first and counted, never silent.
  * LEGACY span budget (cfg.footprint_clamp=True): home = the splat's
    mean tile, rects clamped to tile_span×tile_span (round-1 semantics,
    kept for the budgeted mode and the anchor-equivalence property).
  * gradients flow back the same way: the kernel accumulates per-row
    gradients into the home layout and one inverse-permutation row
    gather (plus a fat_cap-row scatter-add summing copy rows onto their
    parents) returns them to the caller's splat order — never a full
    scatter.

Sorting PROJECTED splats (11 f32 columns) instead of raw parameters
(59 columns with SH) keeps the relayout gather small; projection runs
once, in the caller's splat order, and copies are row-repeats.

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
from gsjax.render.common import depth_bits, tile_rect
from gsjax.render.project import ProjectedSplats

PCOLS = 11  # mean2d(2) + depth(1) + conic(3) + radius(1) + rgb(3) + opacity(1)


@partial(jax.custom_vjp, nondiff_argnums=())
def permute_split(x, src, inv, inv_tail, tail_parent):
    """x[src] with a gather-for-gather VJP. `src` maps home rows to
    original splat ids (the fat-splat tail repeats parents); the
    cotangent is the inverse gather over the N primary rows plus a
    fat_cap-row scatter-add of the copy rows onto their parents —
    XLA's generic gather transpose would scatter-add ALL rows
    (~100 ns/row, microbench_mem.py)."""
    return x[src]


def _psplit_fwd(x, src, inv, inv_tail, tail_parent):
    return x[src], (inv, inv_tail, tail_parent)


def _psplit_bwd(res, d):
    inv, inv_tail, tail_parent = res
    dx = d[inv]  # primary rows, bijective
    if inv_tail.shape[0]:
        dx = dx.at[tail_parent].add(d[inv_tail])
    return (dx, None, None, None, None)


permute_split.defvjp(_psplit_fwd, _psplit_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "perm",
        "src",
        "inv",
        "inv_tail",
        "tail_parent",
        "seg_starts",
        "home_x",
        "home_y",
        "win",
        "n_valid",
        "n_fat_overflow",
    ],
    meta_fields=["tiles_x", "tiles_y"],
)
@dataclasses.dataclass(frozen=True)
class HomeLayout:
    """perm [NH] i32: home row i holds pre-sort entry perm[i] (entries
    ≥ N are fat-splat copies); src [NH]: original splat id per home row;
    inv [N]: original splat j's primary home row; inv_tail [fat_cap]:
    home row of copy slot j; tail_parent [fat_cap]: its parent;
    seg_starts [T+2]: home rows of tile t are [seg_starts[t],
    seg_starts[t+1]) (segment T holds culled rows); home_x/home_y [NH]:
    home tile coords per row; win [NH, 4] i32 (wx0, wx1, wy0, wy1):
    the row's tile window = its block ∩ rect (exact mode) — binning
    enumerates pairs strictly inside it; n_fat_overflow: footprint tiles
    lost to the fat budgets (0 ⇒ the frame is exactly unclamped)."""

    perm: jax.Array
    src: jax.Array
    inv: jax.Array
    inv_tail: jax.Array
    tail_parent: jax.Array
    seg_starts: jax.Array
    home_x: jax.Array
    home_y: jax.Array
    win: jax.Array
    n_valid: jax.Array
    n_fat_overflow: jax.Array
    tiles_x: int
    tiles_y: int


def resolve_fat_caps(n: int, cfg: RenderConfig):
    """Static fat-split budgets. None-configured caps scale with the
    scene: plenty for realistic footprint distributions (overflow is
    counted either way), without padding tiny test scenes to huge NH."""
    fsc = cfg.fat_splats_cap
    if fsc is None:
        fsc = min(8192, max(256, n // 16))
    fat_cap = cfg.fat_cap
    if fat_cap is None:
        fat_cap = min(131072, max(1024, n // 4))
    return fsc, fat_cap


def _legacy_home(p, tiles_x, tiles_y, cfg):
    """Round-1 semantics: home = the mean's tile, window = the span-3
    rect clamp (applied later in binning via clamp_rect_to_span)."""
    mx, my = p.mean2d[:, 0], p.mean2d[:, 1]
    htx = jnp.clip(
        jnp.floor(mx / cfg.tile_size).astype(jnp.int32), 0, tiles_x - 1
    )
    hty = jnp.clip(
        jnp.floor(my / cfg.tile_size).astype(jnp.int32), 0, tiles_y - 1
    )
    # splats within 2 tiles outside the viewport keep a CLIPPED home tile
    # so their in-image pairs stay renderable; farther ones go to the
    # sentinel segment (their span-clamped rect cannot reach the image)
    on = (
        p.valid
        & (mx >= -cfg.tile_size * 2)
        & (mx < tiles_x * cfg.tile_size + cfg.tile_size * 2)
        & (my >= -cfg.tile_size * 2)
        & (my < tiles_y * cfg.tile_size + cfg.tile_size * 2)
    )
    # window sentinel: legacy binning recomputes the clamped rect itself
    win = jnp.zeros((p.depth.shape[0], 4), jnp.int32)
    return htx, hty, on, win, jnp.zeros((), jnp.int32)


def build_home_layout(p: ProjectedSplats, cam: Camera, cfg: RenderConfig):
    """Sort the PROJECTED scene by (home tile, depth), splitting fat
    splats into per-block copies in exact mode. Returns
    (p_home: ProjectedSplats [NH], HomeLayout); NH = N + cfg.fat_cap
    (exact mode) or N (legacy). All key/geometry math runs under
    stop_gradient — the permutation is order information."""
    n = p.depth.shape[0]
    tiles_x = cfg.tiles_x(cam.width)
    tiles_y = cfg.tiles_y(cam.height)
    span = cfg.tile_span
    sg = jax.lax.stop_gradient
    mean2d, radius, depth, valid = (
        sg(p.mean2d), sg(p.radius), sg(p.depth), p.valid,
    )
    t_sent = jnp.int32(tiles_x * tiles_y)

    if cfg.footprint_clamp:
        htx, hty, on, win, n_ovf = _legacy_home(p, tiles_x, tiles_y, cfg)
        home_key = jnp.where(on, hty * tiles_x + htx, t_sent)
        dkey = depth_bits(jnp.where(valid, depth, 1.0))
        src_pre = jnp.arange(n, dtype=jnp.int32)
        fat_cap = 0
        tail_parent = jnp.zeros((0,), jnp.int32)
        home_pre_x, home_pre_y, win_pre = htx, hty, win
    else:
        x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y, cfg.tile_size)
        on = valid & (x1 > x0) & (y1 > y0)
        nbx = -(-(x1 - x0) // span)  # blocks per axis (≥1 when on)
        nby = -(-(y1 - y0) // span)
        n_blocks = jnp.where(on, nbx * nby, 1)
        # primary row = block (0, 0); home = block center, clipped into
        # the image (the window below still ⊆ home±1 after the clip)
        h = span // 2
        phx = jnp.minimum(x0 + h, tiles_x - 1)
        phy = jnp.minimum(y0 + h, tiles_y - 1)
        pwin = jnp.stack(
            [x0, jnp.minimum(x0 + span, x1), y0, jnp.minimum(y0 + span, y1)],
            axis=-1,
        )

        # fat splats: compact ids, enumerate extra blocks, place copies
        fsc, fat_cap = resolve_fat_caps(n, cfg)
        maxb = cfg.fat_max_blocks
        is_fat = on & (n_blocks > 1)
        fat_rank = jnp.cumsum(is_fat.astype(jnp.int32)) - 1
        slot = jnp.where(is_fat & (fat_rank < fsc), fat_rank, fsc)
        fat_id = (
            jnp.full((fsc + 1,), n, jnp.int32)
            .at[slot]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )[:fsc]
        fat_ok = fat_id < n
        fid = jnp.minimum(fat_id, n - 1)
        fx0, fy0 = x0[fid], y0[fid]
        fx1, fy1 = x1[fid], y1[fid]
        fnbx = nbx[fid]
        fnb = jnp.where(fat_ok, n_blocks[fid], 1)
        fnb_cap = jnp.minimum(fnb, maxb)
        # copies base offsets into the tail (block 0 stays the primary)
        n_ex = fnb_cap - 1
        base = jnp.cumsum(n_ex) - n_ex  # [FSC]
        b = jnp.arange(1, maxb, dtype=jnp.int32)[None, :]  # [1, MAXB-1]
        keep = fat_ok[:, None] & (b < fnb_cap[:, None])
        dest = jnp.where(keep, base[:, None] + b - 1, fat_cap)  # drop pad
        bx = b % fnbx[:, None]
        by = b // fnbx[:, None]
        chx = jnp.minimum(fx0[:, None] + span * bx + h, tiles_x - 1)
        chy = jnp.minimum(fy0[:, None] + span * by + h, tiles_y - 1)
        cw = jnp.stack(
            [
                fx0[:, None] + span * bx,
                jnp.minimum(fx0[:, None] + span * bx + span, fx1[:, None]),
                fy0[:, None] + span * by,
                jnp.minimum(fy0[:, None] + span * by + span, fy1[:, None]),
            ],
            axis=-1,
        )  # [FSC, MAXB-1, 4]

        tail_parent = (
            jnp.zeros((fat_cap + 1,), jnp.int32)
            .at[dest]
            .set(jnp.broadcast_to(fid[:, None], dest.shape), mode="drop")
        )[:fat_cap]
        tail_hx = (
            jnp.zeros((fat_cap + 1,), jnp.int32).at[dest].set(chx, mode="drop")
        )[:fat_cap]
        tail_hy = (
            jnp.zeros((fat_cap + 1,), jnp.int32).at[dest].set(chy, mode="drop")
        )[:fat_cap]
        tail_win = (
            jnp.zeros((fat_cap + 1, 4), jnp.int32)
            .at[dest]
            .set(cw, mode="drop")
        )[:fat_cap]
        n_copies = jnp.sum(jnp.where(fat_ok, n_ex, 0))
        lanes = jnp.arange(fat_cap, dtype=jnp.int32)
        tail_ok = lanes < n_copies
        # overflow: blocks beyond fat_max_blocks, splats beyond
        # fat_splats_cap (their extra blocks), copies beyond fat_cap
        n_ovf = (
            jnp.sum(jnp.where(fat_ok, fnb - fnb_cap, 0))
            + jnp.sum(
                jnp.where(is_fat & (fat_rank >= fsc), n_blocks - 1, 0)
            )
            + jnp.maximum(n_copies - fat_cap, 0)
        ).astype(jnp.int32)

        home_pre_x = jnp.concatenate([phx, tail_hx])
        home_pre_y = jnp.concatenate([phy, tail_hy])
        win_pre = jnp.concatenate([pwin, tail_win], axis=0)
        on_ext = jnp.concatenate([on, tail_ok])
        depth_ext = jnp.concatenate(
            [depth, jnp.where(tail_ok, depth[tail_parent], 1.0)]
        )
        home_key = jnp.where(
            on_ext, home_pre_y * tiles_x + home_pre_x, t_sent
        )
        dkey = depth_bits(depth_ext)
        src_pre = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), tail_parent]
        )
        on = on_ext

    nh = home_key.shape[0]
    # full f32 depth resolution (graphdeco semantics): 3-operand radix
    # sort (home, depth_bits, idx); idx as a third KEY makes tie order
    # ascending-index deterministically
    home_sorted, _, perm = jax.lax.sort(
        (home_key, dkey, jnp.arange(nh, dtype=jnp.int32)),
        num_keys=3,
        is_stable=False,
    )
    _, inv_ext = jax.lax.sort(
        (perm, jnp.arange(nh, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    seg_starts = jnp.searchsorted(
        home_sorted,
        jnp.arange(tiles_x * tiles_y + 2, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    src = src_pre[perm]
    packed = jnp.concatenate(
        [
            p.mean2d,
            p.depth[:, None],
            p.conic,
            p.radius[:, None],
            p.rgb,
            p.opacity[:, None],
        ],
        axis=-1,
    )
    ph = permute_split(
        packed, src, inv_ext[:n], inv_ext[n:], tail_parent
    )
    hs = jnp.minimum(home_sorted, t_sent - 1)
    p_home = ProjectedSplats(
        mean2d=ph[:, 0:2],
        depth=ph[:, 2],
        conic=ph[:, 3:6],
        radius=ph[:, 6],
        rgb=ph[:, 7:10],
        opacity=ph[:, 10],
        valid=on[perm],
    )
    layout = HomeLayout(
        perm=perm,
        src=src,
        inv=inv_ext[:n],
        inv_tail=inv_ext[n:],
        tail_parent=tail_parent,
        seg_starts=seg_starts,
        home_x=hs % tiles_x,
        home_y=hs // tiles_x,
        win=win_pre[perm],
        n_valid=jnp.sum(on.astype(jnp.int32)),
        n_fat_overflow=jnp.asarray(n_ovf, jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )
    return p_home, layout
