"""Pallas slot-stream kernels: forward tile blend + hand-derived backward.

The pair stream is laid out in *chunk-aligned slots*: slot j holds `chunk`
consecutive sorted pairs of exactly one tile (tile segments are padded up
to a chunk multiple), so every kernel access is a statically-shaped block
at a leading-dim index — Mosaic's tiling rules (lane offsets must be
128-aligned) never bite, and the Pallas pipeline double-buffers the
attribute blocks automatically.

Kernel arrays are *transposed*: pairs on sublanes, pixels on lanes
([chunk, n_px]), which makes the gathered attribute blocks
([NCB, chunk, 9]) consumable with no XLA- or kernel-side transpose at
all (a 425 MB XLA transpose cost ~60 ms in the row-major layout).

Gradient routing: the attribute gather is wrapped in its own custom VJP
(`gather_pair_attrs`) whose backward scatter-*sets* pair gradients at
their unique pair ids and K-reduces — measured ~0.9 ns/elem, vs the
100+ ns/row of the scatter-add XLA generates for a gather transpose
(1.2 s/frame at 1080p).

Kernels run on a grid over slots. Consecutive slots of one tile revisit
the same output block, which Pallas keeps resident in VMEM — the
per-tile compositing state (virtual transmittance C, actual T, rgb)
lives in the output block itself. Early termination skips a slot's
compute (its DMA still streams; ~1 ms/frame, irrelevant).

Forward semantics match composite.blend_padded / the oracle exactly
(virtual-cumprod termination; render/oracle.py). The backward kernel is
the hand-derived VJP (SURVEY §7 M3), graphdeco-style: slots replay in
reverse, the virtual transmittance is reconstructed by division from the
forward's exit state, and

  dL/dα_i = v_i·T_i − (U_i + ct_T·T_act)/(1−α_i)
  v_i = Σ_c ct_c·rgb_ic                  (MXU)
  U_i = Σ_{j>i} v_j w_j                  (reverse Hillis-Steele suffix sum)

chains to mean2d/conic/rgb/opacity per pair. Near the T≈eps termination
boundary the reconstructed include set can differ by one splat per pixel
from the forward's (the loss is discontinuous there) — identical to
graphdeco's backward behavior.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.core.config import RenderConfig
from gsjax.render.fastmath import fexp

# Profiling-only kernel ablations (tools/ablate_stream.py) — see
# pallas_stream._ABLATE. Read once at import (= trace) time.
_ABLATE = frozenset(
    s for s in os.environ.get("GSJAX_ABLATE", "").split(",") if s
)

ATT_COLS = 9  # mean2(2) + conic(3) + rgb(3) + opacity(1)
FWD_ROWS = 8  # img(3), T_act, C, n_done, spare(2)


def _pixel_grid(t, ty0, tiles_x, ts, n_px):
    """Pixel coordinates as [1, n_px] lane vectors."""
    org_x = (t % tiles_x) * ts
    org_y = (t // tiles_x + ty0) * ts
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    px = (org_x + pix % ts).astype(jnp.float32)
    py = (org_y + pix // ts).astype(jnp.float32)
    return px, py


def _chunk_quantities(att, px, py, srow, base, count, alpha_clamp, alpha_min):
    """att [chunk, 9]; px/py [1, n_px]; srow [chunk, 1] sublane iota.
    All outputs [chunk, n_px]."""
    mx, my = att[:, 0:1], att[:, 1:2]
    ca, cb, cc = att[:, 2:3], att[:, 3:4], att[:, 4:5]
    op = att[:, 8:9]
    dx = px - mx  # [chunk, n_px]
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = (0.3 + 0.001 * power) if "exp" in _ABLATE else fexp(power)
    raw = op * G
    alpha = jnp.minimum(alpha_clamp, raw)
    valid = (base + srow) < count  # [chunk, 1]
    eligible = jnp.logical_and(
        valid, jnp.logical_and(alpha >= alpha_min, power <= 0.0)
    )
    f = jnp.where(eligible, 1.0 - alpha, 1.0)
    unclamped = raw < alpha_clamp
    return alpha, eligible, f, G, dx, dy, unclamped


def _hs_prod_sublanes(f, srow, chunk):
    """Inclusive running product down the sublane axis."""
    incl = f
    s = 1
    while s < chunk:
        incl = incl * jnp.where(srow >= s, pltpu.roll(incl, s, 0), 1.0)
        s *= 2
    return incl


def _hs_suffix_sum_sublanes(x, srow, chunk):
    sfx = x
    s = 1
    while s < chunk:
        sfx = sfx + jnp.where(srow < chunk - s, pltpu.roll(sfx, chunk - s, 0), 0.0)
        s *= 2
    return sfx


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(
    starts_ref,  # [T+2] i32 (scalar prefetch)
    cbase_ref,  # [T+1] i32
    tof_ref,  # [NCB] i32 (sentinel n_tiles for dead slots)
    meta_ref,  # [2] i32 (ty0, tiles_x)
    att_ref,  # [1, chunk, 9] f32 block
    out_ref,  # [1, FWD_ROWS, n_px] f32 block, revisited per tile
    *,
    ts: int,
    chunk: int,
    n_tiles: int,
    alpha_clamp: float,
    alpha_min: float,
    eps_T: float,
):
    n_px = ts * ts
    j = pl.program_id(0)
    t = tof_ref[j]
    dead = t == n_tiles
    tc = jnp.minimum(t, n_tiles - 1)
    k = j - cbase_ref[tc]
    count = starts_ref[tc + 1] - starts_ref[tc]
    px, py = _pixel_grid(tc, meta_ref[0], meta_ref[1], ts, n_px)
    srow = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    @pl.when(k == 0)
    def _():
        # rows: img(0:3)=0, T_act(3)=1, C(4)=1, rest 0
        out_ref[0] = jnp.concatenate(
            [
                jnp.zeros((3, n_px), jnp.float32),
                jnp.ones((2, n_px), jnp.float32),
                jnp.zeros((FWD_ROWS - 5, n_px), jnp.float32),
            ],
            axis=0,
        )

    C = out_ref[0, 4:5, :]  # [1, n_px]

    @pl.when(jnp.logical_and(jnp.logical_not(dead), jnp.max(C) >= eps_T))
    def _():
        att = att_ref[0]  # [chunk, 9]
        alpha, eligible, f, _G, _dx, _dy, _uc = _chunk_quantities(
            att, px, py, srow, k * chunk, count, alpha_clamp, alpha_min
        )
        incl = _hs_prod_sublanes(f, srow, chunk)
        excl = jnp.where(srow >= 1, pltpu.roll(incl, 1, 0), 1.0)
        Cc = C * incl  # [chunk, n_px]
        include = jnp.logical_and(eligible, Cc >= eps_T)
        w = jnp.where(include, C * excl * alpha, 0.0)

        img = out_ref[0, 0:3, :] + jax.lax.dot_general(
            att[:, 5:8],  # rgb [chunk, 3]
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3, n_px]
        t_min = jnp.min(jnp.where(include, Cc, 2.0), axis=0, keepdims=True)
        T_act = out_ref[0, 3:4, :]
        T_act = jnp.where(t_min > 1.5, T_act, t_min)
        n_done = jnp.full((1, n_px), k + 1, jnp.float32)
        pad = jnp.zeros((FWD_ROWS - 6, n_px), jnp.float32)
        out_ref[0] = jnp.concatenate(
            [img, T_act, Cc[-1:, :], n_done, pad], axis=0
        )


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(
    starts_ref,
    cbase_ref,
    tof_rev_ref,  # [NCB] i32: tile of slot NCB-1-j
    meta_ref,
    att_ref,  # [1, chunk, 9] block of slot NCB-1-j
    ct_ref,  # [1, 4, n_px] block of tile t (ct_img rows 0:3, ct_T row 3)
    fwd_ref,  # [1, FWD_ROWS, n_px] block of tile t
    datt_ref,  # out [1, chunk, 9] block of slot NCB-1-j
    state_ref,  # out [1, 8, n_px] per-tile state (C_exit row 0, S_carry row 1)
    *,
    ts: int,
    chunk: int,
    n_tiles: int,
    alpha_clamp: float,
    alpha_min: float,
    eps_T: float,
):
    n_px = ts * ts
    j = pl.program_id(0)
    t = tof_rev_ref[j]
    dead = t == n_tiles
    tc = jnp.minimum(t, n_tiles - 1)
    slot = pl.num_programs(0) - 1 - j
    k = slot - cbase_ref[tc]
    nslots_t = cbase_ref[tc + 1] - cbase_ref[tc]
    count = starts_ref[tc + 1] - starts_ref[tc]
    px, py = _pixel_grid(tc, meta_ref[0], meta_ref[1], ts, n_px)
    srow = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    @pl.when(jnp.logical_and(k == nslots_t - 1, jnp.logical_not(dead)))
    def _():
        state_ref[0] = jnp.concatenate(
            [fwd_ref[0, 4:5, :], jnp.zeros((7, n_px), jnp.float32)], axis=0
        )

    n_done = fwd_ref[0, 5, 0].astype(jnp.int32)
    live = jnp.logical_and(jnp.logical_not(dead), k < n_done)

    datt_ref[0] = jnp.zeros((chunk, ATT_COLS), jnp.float32)

    @pl.when(live)
    def _():
        att = att_ref[0]  # [chunk, 9]
        ct_img = ct_ref[0, 0:3, :]  # [3, n_px]
        ct_T = ct_ref[0, 3:4, :]  # [1, n_px]
        T_act = fwd_ref[0, 3:4, :]
        C_exit = state_ref[0, 0:1, :]  # [1, n_px]
        S_carry = state_ref[0, 1:2, :]

        alpha, eligible, f, G, dx, dy, unclamped = _chunk_quantities(
            att, px, py, srow, k * chunk, count, alpha_clamp, alpha_min
        )
        incl = _hs_prod_sublanes(f, srow, chunk)
        excl = jnp.where(srow >= 1, pltpu.roll(incl, 1, 0), 1.0)
        C_entry = C_exit / jnp.maximum(incl[-1:, :], 1e-30)
        Cc = C_entry * incl
        include = jnp.logical_and(eligible, Cc >= eps_T)
        T_i = C_entry * excl
        w = jnp.where(include, T_i * alpha, 0.0)  # [chunk, n_px]

        v = jax.lax.dot_general(
            att[:, 5:8],  # rgb [chunk, 3]
            ct_img,  # [3, n_px]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [chunk, n_px]

        vw = v * w
        sfx = _hs_suffix_sum_sublanes(vw, srow, chunk)
        U = S_carry + (sfx - vw)

        inv_f = 1.0 / f
        ctT_Tact = ct_T * T_act  # [1, n_px]
        dalpha = jnp.where(include, v * T_i - (U + ctT_Tact) * inv_f, 0.0)

        dpow = jnp.where(unclamped, dalpha * alpha, 0.0)
        ca, cb, cc = att[:, 2:3], att[:, 3:4], att[:, 4:5]
        dmx = jnp.sum(dpow * (ca * dx + cb * dy), axis=1, keepdims=True)
        dmy = jnp.sum(dpow * (cb * dx + cc * dy), axis=1, keepdims=True)
        dca = jnp.sum(dpow * (-0.5 * dx * dx), axis=1, keepdims=True)
        dcb = jnp.sum(dpow * (-dx * dy), axis=1, keepdims=True)
        dcc = jnp.sum(dpow * (-0.5 * dy * dy), axis=1, keepdims=True)
        dop = jnp.sum(
            jnp.where(unclamped, dalpha * G, 0.0), axis=1, keepdims=True
        )
        drgb = jax.lax.dot_general(
            w,
            ct_img,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [chunk, 3]

        datt_ref[0] = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, drgb, dop], axis=1
        )  # [chunk, 9]

        state_ref[0] = jnp.concatenate(
            [C_entry, S_carry + sfx[0:1, :], jnp.zeros((6, n_px), jnp.float32)],
            axis=0,
        )


# --------------------------------------------------------------------------
# host-side slot tables, gather with scatter-set VJP, wrappers
# --------------------------------------------------------------------------


def _slot_tables(starts, chunk, ncb, unroll: int = 1):
    """Per-slot tile ids and pair-window starts. With `unroll` > 1 each
    tile's slot count pads to an unroll multiple, so unroll-sized slot
    groups never span a tile (the stream kernels process one group per
    grid step to amortize the per-step overhead); padded slots lie beyond
    the tile's pair count and every consumer masks on that."""
    counts = starts[1:] - starts[:-1]
    nch = -(-counts // chunk)
    if unroll > 1:
        nch = -(-nch // unroll) * unroll
    cbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch).astype(jnp.int32)]
    )
    n_tiles = counts.shape[0]
    marks = jnp.zeros((ncb + 1,), jnp.int32).at[cbase[:-1]].add(1, mode="drop")
    tile_of = (jnp.cumsum(marks[:ncb]) - 1).astype(jnp.int32)
    n_used = cbase[-1]
    slot_ids = jnp.arange(ncb, dtype=jnp.int32)
    tile_of = jnp.where(slot_ids < n_used, tile_of, n_tiles)
    toc = jnp.minimum(tile_of, n_tiles - 1)
    shift = starts[:-1] - cbase[:-1] * chunk  # [T]
    win = slot_ids * chunk + shift[toc]
    win = jnp.clip(win, 0, jnp.maximum(starts[-1] - 1, 0))
    # per-slot lane-validity bound: lanes < valid_count are real pairs
    valid_count = jnp.clip(starts[toc + 1] - win, 0, chunk)
    valid_count = jnp.where(tile_of < n_tiles, valid_count, 0)
    return tile_of, win, cbase, valid_count


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_pair_attrs(att_rows_pad, pid_al, k_slots):
    """att_rows_pad [N+1, 9] (last row = dummy), pid_al [NCB, chunk] pair
    ids with sentinel N·k_slots for dead lanes → [NCB, chunk, 9]."""
    sid = jnp.minimum(pid_al // k_slots, att_rows_pad.shape[0] - 1)
    return att_rows_pad[sid]


def _gather_fwd(att_rows_pad, pid_al, k_slots):
    return gather_pair_attrs(att_rows_pad, pid_al, k_slots), (
        att_rows_pad.shape[0] - 1,
        pid_al,
    )


def _gather_bwd(k_slots, res, d):
    n, pid_al = res
    # Scattering gradient ROWS is ~100 ns/row in XLA; instead invert the
    # pair permutation with a 1-D scatter-set (~1 ns/elem) and use a fast
    # row-GATHER (~6 ns/row): inv[pid] = flat slot position; pids never
    # emitted (culled) point at a zero pad row.
    nk = n * k_slots
    flat = d.reshape(-1, ATT_COLS)
    pad_pos = jnp.int32(flat.shape[0])
    inv = (
        jnp.full((nk + 1,), pad_pos, jnp.int32)
        .at[pid_al.reshape(-1)]
        .set(jnp.arange(flat.shape[0], dtype=jnp.int32), mode="drop")
    )
    flat_pad = jnp.concatenate([flat, jnp.zeros((1, ATT_COLS), jnp.float32)])
    d_pairs = flat_pad[inv[:nk]]  # [N·K, 9] row gather
    d_rows = d_pairs.reshape(n, k_slots, ATT_COLS).sum(axis=1)
    d_rows = jnp.concatenate([d_rows, jnp.zeros((1, ATT_COLS), jnp.float32)])
    return (d_rows, None)


gather_pair_attrs.defvjp(_gather_fwd, _gather_bwd)


def chunked_pair_attrs(att_rows, pid_sorted, starts, cfg: RenderConfig, k_slots: int):
    """Build the chunk-aligned slot stream.

    att_rows [N, 9]; pid_sorted [S] sorted pair ids; starts [T+1].
    Returns (att_al [NCB, chunk, 9], tile_of [NCB], cbase [T+1])."""
    chunk = cfg.chunk
    S = pid_sorted.shape[0]
    n = att_rows.shape[0]
    n_tiles = starts.shape[0] - 1
    ncb = S // chunk + n_tiles + 1
    tile_of, win, cbase, valid_count = _slot_tables(starts, chunk, ncb)

    pid_pad = jnp.concatenate(
        [pid_sorted, jnp.zeros((chunk,), pid_sorted.dtype)]
    )
    pid_al = jax.vmap(
        lambda s: jax.lax.dynamic_slice(pid_pad, (s,), (chunk,))
    )(win)  # [NCB, chunk]
    lane = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    sentinel = jnp.int32(n * k_slots)
    pid_al = jnp.where(lane < valid_count[:, None], pid_al, sentinel)

    att_rows_pad = jnp.concatenate(
        [att_rows, jnp.zeros((1, ATT_COLS), att_rows.dtype)]
    )
    att_al = gather_pair_attrs(att_rows_pad, pid_al, k_slots)
    return att_al, tile_of, cbase


def _fwd_call(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg):
    ts = cfg.tile_size
    n_px = ts * ts
    n_tiles = tiles_x * band_rows
    ncb = att_al.shape[0]
    starts_pad = jnp.concatenate([starts, starts[-1:]])
    meta = jnp.stack(
        [jnp.asarray(ty0, jnp.int32), jnp.asarray(tiles_x, jnp.int32)]
    )
    kernel = partial(
        _fwd_kernel,
        ts=ts,
        chunk=cfg.chunk,
        n_tiles=n_tiles,
        alpha_clamp=cfg.alpha_clamp,
        alpha_min=cfg.alpha_min,
        eps_T=cfg.transmittance_eps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ncb,),
        in_specs=[
            pl.BlockSpec(
                (1, cfg.chunk, ATT_COLS),
                lambda j, st, cb, tof, m: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, FWD_ROWS, n_px),
            lambda j, st, cb, tof, m: (tof[j], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles + 1, FWD_ROWS, n_px), jnp.float32
        ),
        interpret=jax.default_backend() != "tpu",
    )(starts_pad, cbase, tile_of, meta, att_al)
    out = out[:n_tiles]
    # tiles with zero slots never write their block: force (img=0, T=1)
    empty = (starts[1:] == starts[:-1])[:, None, None]
    base = jnp.concatenate(
        [
            jnp.zeros((1, 3, 1), jnp.float32),
            jnp.ones((1, 2, 1), jnp.float32),
            jnp.zeros((1, FWD_ROWS - 5, 1), jnp.float32),
        ],
        axis=1,
    )
    return jnp.where(empty, base, out)


def _bwd_call(
    att_al, starts, cbase, tile_of, ty0, fwd_out, ct_img, ct_T, tiles_x, band_rows, cfg
):
    ts = cfg.tile_size
    n_px = ts * ts
    n_tiles = tiles_x * band_rows
    ncb = att_al.shape[0]
    starts_pad = jnp.concatenate([starts, starts[-1:]])
    meta = jnp.stack(
        [jnp.asarray(ty0, jnp.int32), jnp.asarray(tiles_x, jnp.int32)]
    )
    tof_rev = tile_of[::-1]
    # ct rows: [4, n_px] per tile
    ct = jnp.concatenate([ct_img, ct_T[:, None, :]], axis=1)
    ct = jnp.concatenate([ct, jnp.zeros((1, 4, n_px), jnp.float32)], axis=0)
    fwd_pad = jnp.concatenate(
        [fwd_out, jnp.zeros((1, FWD_ROWS, n_px), jnp.float32)], axis=0
    )
    kernel = partial(
        _bwd_kernel,
        ts=ts,
        chunk=cfg.chunk,
        n_tiles=n_tiles,
        alpha_clamp=cfg.alpha_clamp,
        alpha_min=cfg.alpha_min,
        eps_T=cfg.transmittance_eps,
    )

    def tile_idx(j, st, cb, tofr, m):
        return (tofr[j], 0, 0)

    def slot_idx(j, st, cb, tofr, m):
        return (tofr.shape[0] - 1 - j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ncb,),
        in_specs=[
            pl.BlockSpec(
                (1, cfg.chunk, ATT_COLS), slot_idx, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 4, n_px), tile_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FWD_ROWS, n_px), tile_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, cfg.chunk, ATT_COLS), slot_idx, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 8, n_px), tile_idx, memory_space=pltpu.VMEM),
        ],
    )
    datt, _state = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(att_al.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, 8, n_px), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(starts_pad, cbase, tof_rev, meta, att_al, ct, fwd_pad)
    return datt


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def blend_slots(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg):
    """Slot-stream tile blend. att_al [NCB, chunk, 9].
    Returns (img [T, n_px, 3], T_act [T, n_px])."""
    out = _fwd_call(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg)
    return jnp.swapaxes(out[:, 0:3, :], 1, 2), out[:, 3, :]


def _blend_slots_fwd(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg):
    out = _fwd_call(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg)
    return (jnp.swapaxes(out[:, 0:3, :], 1, 2), out[:, 3, :]), (
        att_al,
        starts,
        cbase,
        tile_of,
        ty0,
        out,
    )


def _blend_slots_bwd(tiles_x, band_rows, cfg, res, cts):
    att_al, starts, cbase, tile_of, ty0, fwd_out = res
    ct_img_t, ct_T = cts  # [T, n_px, 3], [T, n_px]
    ct_img = jnp.swapaxes(ct_img_t, 1, 2)  # [T, 3, n_px]
    datt = _bwd_call(
        att_al,
        starts,
        cbase,
        tile_of,
        ty0,
        fwd_out,
        ct_img,
        ct_T,
        tiles_x,
        band_rows,
        cfg,
    )
    f0 = jax.dtypes.float0
    z = lambda x: np.zeros(jnp.shape(x), f0)
    return (datt, z(starts), z(cbase), z(tile_of), z(ty0))


blend_slots.defvjp(_blend_slots_fwd, _blend_slots_bwd)
