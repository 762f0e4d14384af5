"""Pallas flat-pair kernels: forward tile blend + hand-derived backward.

The pair stream is laid out in *chunk-aligned slots*: slot j holds `chunk`
consecutive sorted pairs of exactly one tile (tile segments are padded up
to a chunk multiple), so every kernel access is a statically-shaped block
at a leading-dim index — Mosaic's tiling rules (lane offsets must be
128-aligned) never bite, and the Pallas pipeline double-buffers the
attribute blocks automatically.

Host-side slot tables (chunked_pair_attrs) are cheap: ~NCB ≈ P/chunk
elements (a scatter+cumsum over slots and windowed slice-gathers at
~6 ns/row); the one real cost is the unavoidable att-table gather of P
rows.

Kernels run on a grid over slots. Consecutive slots of one tile revisit
the same output block, which Pallas keeps resident in VMEM — the
per-tile compositing state (virtual transmittance C, actual T, rgb)
lives in the output block itself. Early termination skips a slot's
compute (its DMA still streams; ~1 ms/frame total, irrelevant).

Forward semantics match composite.blend_padded / the oracle exactly
(virtual-cumprod termination; render/oracle.py). The backward kernel is
the hand-derived VJP (SURVEY §7 M3), graphdeco-style: slots replay in
reverse, the virtual transmittance is reconstructed by division from the
forward's exit state, and

  dL/dα_i = v_i·T_i − (U_i + ct_T·T_act)/(1−α_i)
  v_i = Σ_c ct_c·rgb_ic                  (MXU)
  U_i = Σ_{j>i} v_j w_j                  (reverse Hillis-Steele suffix sum)

chains to mean2d/conic/rgb/opacity per pair. Pair gradients scatter-add
back to splats through the transpose of the slot gather (XLA-side,
outside the custom_vjp boundary). Near the T≈eps termination boundary
the reconstructed include set can differ by one splat per pixel from the
forward's (the loss is discontinuous there) — identical to graphdeco's
backward behavior.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.core.config import RenderConfig

ATT_ROWS = 16  # 9 used (mean2, conic3, rgb3, op) + 7 pad (8-sublane tiling)
FWD_COLS = 8  # rgb(3), T_act, C, n_done, spare(2)


def _pixel_grid(t, ty0, tiles_x, ts, n_px):
    org_x = (t % tiles_x) * ts
    org_y = (t // tiles_x + ty0) * ts
    pix = jax.lax.broadcasted_iota(jnp.int32, (n_px, 1), 0)
    px = (org_x + pix % ts).astype(jnp.float32)
    py = (org_y + pix // ts).astype(jnp.float32)
    return px, py


def _chunk_quantities(att, px, py, lane, base, count, alpha_clamp, alpha_min):
    mx, my = att[0:1], att[1:2]
    ca, cb, cc = att[2:3], att[3:4], att[4:5]
    op = att[8:9]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    raw = op * G
    alpha = jnp.minimum(alpha_clamp, raw)
    valid = (base + lane) < count
    eligible = jnp.logical_and(
        valid, jnp.logical_and(alpha >= alpha_min, power <= 0.0)
    )
    f = jnp.where(eligible, 1.0 - alpha, 1.0)
    unclamped = raw < alpha_clamp
    return alpha, eligible, f, G, dx, dy, unclamped


def _hs_inclusive_prod(f, lane, chunk):
    incl = f
    s = 1
    while s < chunk:
        incl = incl * jnp.where(lane >= s, pltpu.roll(incl, s, 1), 1.0)
        s *= 2
    return incl


def _hs_suffix_sum(x, lane, chunk):
    """Inclusive suffix sum along lanes: out[j] = Σ_{j'≥j} x[j']."""
    sfx = x
    s = 1
    while s < chunk:
        sfx = sfx + jnp.where(lane < chunk - s, pltpu.roll(sfx, chunk - s, 1), 0.0)
        s *= 2
    return sfx


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    starts_ref,  # [T+2] i32 (scalar prefetch; last entry pads sentinel reads)
    cbase_ref,  # [T+1] i32 slot base per tile
    tof_ref,  # [NCB] i32 tile of slot (sentinel n_tiles for dead slots)
    meta_ref,  # [2] i32 (ty0, tiles_x)
    att_ref,  # [1, 16, chunk] f32 block (auto-pipelined)
    out_ref,  # [1, n_px, FWD_COLS] f32 block, revisited per tile
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_px, chunk), 1)

    @pl.when(k == 0)
    def _():
        # cols: img(0:3)=0, T_act(3)=1, C(4)=1, rest 0  (.at[].set would
        # lower to an unsupported scatter)
        out_ref[0] = jnp.concatenate(
            [
                jnp.zeros((n_px, 3), jnp.float32),
                jnp.ones((n_px, 2), jnp.float32),
                jnp.zeros((n_px, FWD_COLS - 5), jnp.float32),
            ],
            axis=1,
        )

    C = out_ref[0, :, 4:5]

    @pl.when(jnp.logical_and(jnp.logical_not(dead), jnp.max(C) >= eps_T))
    def _():
        att = att_ref[0]
        alpha, eligible, f, _G, _dx, _dy, _uc = _chunk_quantities(
            att, px, py, lane, k * chunk, count, alpha_clamp, alpha_min
        )
        incl = _hs_inclusive_prod(f, lane, chunk)
        excl = jnp.where(lane >= 1, pltpu.roll(incl, 1, 1), 1.0)
        Cc = C * incl
        include = jnp.logical_and(eligible, Cc >= eps_T)
        w = jnp.where(include, C * excl * alpha, 0.0)

        img = out_ref[0, :, 0:3] + jax.lax.dot_general(
            w,
            att[5:8],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        t_min = jnp.min(jnp.where(include, Cc, 2.0), axis=1, keepdims=True)
        T_act = out_ref[0, :, 3:4]
        T_act = jnp.where(t_min > 1.5, T_act, t_min)
        n_done = jnp.full((n_px, 1), k + 1, jnp.float32)
        pad = jnp.zeros((n_px, FWD_COLS - 6), jnp.float32)
        out_ref[0] = jnp.concatenate(
            [img, T_act, Cc[:, -1:], n_done, pad], axis=1
        )


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    starts_ref,
    cbase_ref,
    tof_rev_ref,  # [NCB] i32: tile of slot NCB-1-j
    meta_ref,
    att_ref,  # [1, 16, chunk] block of slot NCB-1-j
    ct_ref,  # [1, n_px, 4] block of tile t (ct_img, ct_T)
    fwd_ref,  # [1, n_px, FWD_COLS] block of tile t
    datt_ref,  # out [1, 16, chunk] block of slot NCB-1-j
    state_ref,  # out [1, n_px, 8] per-tile state (C_exit, S_carry)
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
    k = slot - cbase_ref[tc]  # chunk index within tile
    nslots_t = cbase_ref[tc + 1] - cbase_ref[tc]
    count = starts_ref[tc + 1] - starts_ref[tc]
    px, py = _pixel_grid(tc, meta_ref[0], meta_ref[1], ts, n_px)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_px, chunk), 1)

    @pl.when(jnp.logical_and(k == nslots_t - 1, jnp.logical_not(dead)))
    def _():
        state_ref[0] = jnp.concatenate(
            [fwd_ref[0, :, 4:5], jnp.zeros((n_px, 7), jnp.float32)], axis=1
        )

    n_done = fwd_ref[0, 0, 5].astype(jnp.int32)
    live = jnp.logical_and(jnp.logical_not(dead), k < n_done)

    datt_ref[0] = jnp.zeros((ATT_ROWS, chunk), jnp.float32)

    @pl.when(live)
    def _():
        att = att_ref[0]
        ct_img = ct_ref[0, :, 0:3]
        ct_T = ct_ref[0, :, 3:4]
        T_act = fwd_ref[0, :, 3:4]
        C_exit = state_ref[0, :, 0:1]
        S_carry = state_ref[0, :, 1:2]

        alpha, eligible, f, G, dx, dy, unclamped = _chunk_quantities(
            att, px, py, lane, k * chunk, count, alpha_clamp, alpha_min
        )
        incl = _hs_inclusive_prod(f, lane, chunk)
        excl = jnp.where(lane >= 1, pltpu.roll(incl, 1, 1), 1.0)
        C_entry = C_exit / jnp.maximum(incl[:, -1:], 1e-30)
        Cc = C_entry * incl
        include = jnp.logical_and(eligible, Cc >= eps_T)
        T_i = C_entry * excl
        w = jnp.where(include, T_i * alpha, 0.0)

        rgbr = att[5:8]
        v = jax.lax.dot_general(
            ct_img,
            rgbr,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [n_px, chunk]

        vw = v * w
        sfx = _hs_suffix_sum(vw, lane, chunk)
        U = S_carry + (sfx - vw)

        inv_f = 1.0 / f
        ctT_Tact = ct_T * T_act
        dalpha = jnp.where(include, v * T_i - (U + ctT_Tact) * inv_f, 0.0)

        dpow = jnp.where(unclamped, dalpha * alpha, 0.0)
        ca, cb, cc = att[2:3], att[3:4], att[4:5]
        dmx = jnp.sum(dpow * (ca * dx + cb * dy), axis=0, keepdims=True)
        dmy = jnp.sum(dpow * (cb * dx + cc * dy), axis=0, keepdims=True)
        dca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
        dcb = jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True)
        dcc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
        dop = jnp.sum(
            jnp.where(unclamped, dalpha * G, 0.0), axis=0, keepdims=True
        )
        drgb = jax.lax.dot_general(
            ct_img,
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3, chunk]

        zpad = jnp.zeros((ATT_ROWS - 9, chunk), jnp.float32)
        datt_ref[0] = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, drgb, dop, zpad], axis=0
        )

        state_ref[0] = jnp.concatenate(
            [C_entry, S_carry + sfx[:, 0:1], jnp.zeros((n_px, 6), jnp.float32)],
            axis=1,
        )


# --------------------------------------------------------------------------
# host-side slot tables and wrappers
# --------------------------------------------------------------------------


def _slot_tables(starts, chunk, ncb):
    """Per-slot tile ids and pair-window starts.

    starts [T+1] i32. Returns (tile_of [ncb] with sentinel T for dead
    slots, win [ncb] pair index of each slot's first lane, cbase [T+1])."""
    counts = starts[1:] - starts[:-1]
    nch = -(-counts // chunk)
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
    shift = starts[:-1] - cbase[:-1] * chunk  # [T], in (-chunk, 0]... any
    win = slot_ids * chunk + shift[toc]
    win = jnp.clip(win, 0, jnp.maximum(starts[-1] - 1, 0))
    return tile_of, win, cbase


def chunked_pair_attrs(att_row_table, sid_sorted, starts, cfg: RenderConfig):
    """Build the chunk-aligned slot stream.

    att_row_table [N, 9]; sid_sorted [S] sorted pair splat ids; starts
    [T+1]. Returns (att_al [NCB, 16, chunk], sid_al [NCB, chunk],
    tile_of [NCB], cbase [T+1]); NCB is static."""
    chunk = cfg.chunk
    S = sid_sorted.shape[0]
    n_tiles = starts.shape[0] - 1
    ncb = S // chunk + n_tiles + 1
    tile_of, win, cbase = _slot_tables(starts, chunk, ncb)

    # windowed slice-gather: contiguous chunk rows, ~6 ns per row
    sid_pad = jnp.concatenate([sid_sorted, jnp.zeros((chunk,), sid_sorted.dtype)])
    sid_al = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sid_pad, (s,), (chunk,))
    )(win)  # [NCB, chunk]
    att_al = att_row_table[sid_al]  # [NCB, chunk, 9] — THE gather
    att_al = jnp.swapaxes(att_al, 1, 2)  # [NCB, 9, chunk]
    att_al = jnp.pad(att_al, ((0, 0), (0, ATT_ROWS - 9), (0, 0)))
    return att_al, sid_al, tile_of, cbase


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def blend_slots(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg):
    """Slot-stream tile blend. Returns (img [T, n_px, 3], T_act [T, n_px])."""
    out = _fwd_call(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg)
    return out[:, :, 0:3], out[:, :, 3]


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
                (1, ATT_ROWS, cfg.chunk),
                lambda j, st, cb, tof, m: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_px, FWD_COLS),
            # dead slots park on an extra sentinel tile block
            lambda j, st, cb, tof, m: (tof[j], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles + 1, n_px, FWD_COLS), jnp.float32
        ),
        interpret=jax.default_backend() != "tpu",
    )(starts_pad, cbase, tile_of, meta, att_al)
    out = out[:n_tiles]
    # tiles with zero slots never write their block: force (img=0, T=1)
    empty = (starts[1:] == starts[:-1])[:, None, None]
    base = jnp.concatenate(
        [
            jnp.zeros((1, 1, 3), jnp.float32),
            jnp.ones((1, 1, 2), jnp.float32),
            jnp.zeros((1, 1, FWD_COLS - 5), jnp.float32),
        ],
        axis=2,
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
    ct = jnp.concatenate([ct_img, ct_T[..., None]], axis=-1)
    # pad per-tile inputs with the sentinel row
    ct = jnp.concatenate([ct, jnp.zeros((1, n_px, 4), jnp.float32)], axis=0)
    fwd_pad = jnp.concatenate(
        [fwd_out, jnp.zeros((1, n_px, FWD_COLS), jnp.float32)], axis=0
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ncb,),
        in_specs=[
            pl.BlockSpec(
                (1, ATT_ROWS, cfg.chunk),
                lambda j, st, cb, tofr, m: (tofr.shape[0] - 1 - j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n_px, 4), tile_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_px, FWD_COLS), tile_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, ATT_ROWS, cfg.chunk),
                lambda j, st, cb, tofr, m: (tofr.shape[0] - 1 - j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n_px, 8), tile_idx, memory_space=pltpu.VMEM),
        ],
    )
    datt, _state = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(att_al.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, n_px, 8), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(starts_pad, cbase, tof_rev, meta, att_al, ct, fwd_pad)
    return datt


def _blend_slots_fwd(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg):
    out = _fwd_call(att_al, starts, cbase, tile_of, ty0, tiles_x, band_rows, cfg)
    return (out[:, :, 0:3], out[:, :, 3]), (
        att_al,
        starts,
        cbase,
        tile_of,
        ty0,
        out,
    )


def _blend_slots_bwd(tiles_x, band_rows, cfg, res, cts):
    att_al, starts, cbase, tile_of, ty0, fwd_out = res
    ct_img, ct_T = cts
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
