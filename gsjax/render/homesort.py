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
    screen axes, vertex.glsl.ts:173-175). Copy blocks whose window the
    splat's ellipse cannot reach at alpha_min are culled at enumeration
    (exactly the per-tile cull binning applies — a dead block contributes
    zero pairs, so the output is bit-identical). Budget overflow
    (fat_max_blocks / fat_cap / fat_live_cap) is counted, never silent.
  * LEGACY span budget (cfg.footprint_clamp=True): home = the splat's
    mean tile, rects clamped to tile_span×tile_span (round-1 semantics).
  * gradients: the kernel accumulates per-home-row gradients; one
    inverse-permutation row gather returns primaries to the caller's
    splat order, and copy-row gradients reduce onto their parents by a
    contiguous-segment sum (copies of one parent are consecutive
    enumeration slots) — never a large scatter-add.

Copy enumeration is RAGGED: copy slot j finds its parent with a
marks + cumsum rank (one pass over the flat budget), replacing round 1's
dense [fat_splats_cap, fat_max_blocks] scatter grid that cost 51 ms of
frame time at the 1080p bench (tools/probe_homesort.py). Parent
attributes arrive via ONE merged row gather (i32 columns ride as exact
f32 values) — row gathers are priced per ROW (~6 ns) regardless of
width, so column merging is the whole game.

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


# --------------------------------------------------------------------------
# differentiable home gather with cheap transpose
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=())
def home_gather(x, tail_x, perm, inv, inv_tail, seg_base):
    """concat(x [N,C], tail_x [F,C])[perm] with a cheap VJP.

    `tail_x` holds the fat-splat copy rows (each a function of its
    parent's row of `x` — here always an exact copy, so its cotangent
    sums onto the parent). `inv` [N] / `inv_tail` [F]: each pre-sort
    row's position in the OUTPUT (≥ len(perm) ⇒ truncated ⇒ zero grad).
    `seg_base` [N+1]: copies of parent i occupy tail slots
    [seg_base[i], seg_base[i+1]) — contiguous, so the parent reduction
    is a cumsum + boundary-difference instead of a scatter-add (XLA's
    gather transpose scatter-adds at 100+ ns/row)."""
    return jnp.concatenate([x, tail_x])[perm]


def _home_gather_fwd(x, tail_x, perm, inv, inv_tail, seg_base):
    out = home_gather(x, tail_x, perm, inv, inv_tail, seg_base)
    return out, (x.shape[0], tail_x.shape[0], inv, inv_tail, seg_base)


def _home_gather_bwd(res, d):
    n, f, inv, inv_tail, seg_base = res
    nh = d.shape[0]
    dpad = jnp.concatenate([d, jnp.zeros((1,) + d.shape[1:], d.dtype)])
    take = lambda idx: dpad[jnp.where(idx < nh, idx, nh)]
    dx = take(inv)  # primary rows, bijective into the kept window
    if f:
        d_tail = take(inv_tail)  # [F, C] copy-row grads, parent-contiguous
        # Per-parent sums by BLOCK-BOUNDED prefix differencing: a global
        # f32 cumsum's running magnitude grows ~sqrt(F)·|g| and small
        # segments then difference two huge numbers (measured 240x
        # relative error at 1M copy rows, mixed magnitudes). Instead:
        # within-block (B rows) inclusive prefix p + block total T. A
        # segment [a, b) is at most fat_max_blocks < B rows, so it spans
        # <= 2 blocks and its sum is p[b-1] - p[a-1] (+ T[blk(a-1)] when
        # it crosses one block edge) — every difference is within-block
        # magnitude. T rides the SAME boundary gather as extra columns
        # (row gathers are priced per row, not width).
        c = d_tail.shape[1]
        B = 1024  # > fat_max_blocks (enforced in build_home_layout)
        nb = -(-f // B)
        dt = jnp.pad(d_tail.astype(jnp.float32), ((0, nb * B - f), (0, 0)))
        p = jnp.cumsum(dt.reshape(nb, B, c), axis=1)  # [nb, B, C]
        T = p[:, -1:, :]  # [nb, 1, C] block totals
        paug = jnp.concatenate(
            [p, jnp.broadcast_to(T, p.shape)], axis=-1
        ).reshape(nb * B, 2 * c)
        sb = jnp.minimum(seg_base, f)  # [N+1]
        idx = sb - 1
        pb = jnp.where(
            (idx >= 0)[:, None], paug[jnp.maximum(idx, 0)], 0.0
        )  # [N+1, 2C]: within-block prefix at the boundary + its block's T
        blk = jnp.maximum(idx, 0) // B
        cross = (blk[1:] > blk[:-1])[:, None]
        seg = (pb[1:, :c] - pb[:-1, :c]) + jnp.where(cross, pb[:-1, c:], 0.0)
        dx = dx + seg.astype(d.dtype)
    return (dx, None, None, None, None, None)


home_gather.defvjp(_home_gather_fwd, _home_gather_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "perm",
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
    ≥ N are fat-splat copies); seg_starts [T+2]: home rows of tile t are
    [seg_starts[t], seg_starts[t+1]) (segment T holds culled rows);
    home_x/home_y [NH]: home tile coords per row; win [NH, 4] i32
    (wx0, wx1, wy0, wy1): the row's tile window = its block ∩ rect
    (exact mode) — binning enumerates pairs strictly inside it;
    n_fat_overflow: footprint blocks/rows lost to the fat budgets
    (0 ⇒ the frame is exactly unclamped)."""

    perm: jax.Array
    seg_starts: jax.Array
    home_x: jax.Array
    home_y: jax.Array
    win: jax.Array
    n_valid: jax.Array
    n_fat_overflow: jax.Array
    tiles_x: int
    tiles_y: int


def resolve_fat_caps(n: int, cfg: RenderConfig):
    """Static fat-split budgets: (fat_cap, live_cap). fat_cap bounds the
    copy ENUMERATION (pre block-cull); live_cap bounds the copy rows kept
    in the sorted layout (post-cull). None-configured caps scale with the
    scene; overflow is counted either way."""
    fat_cap = cfg.fat_cap
    if fat_cap is None:
        fat_cap = min(4_194_304, max(1024, 2 * n))
    if fat_cap >= 1 << 24:
        # copy-block decoding rides the merged parent gather as f32
        # VALUES (_i2f): `base` up to fat_cap must be exactly
        # representable, or gbase silently corrupts and windows/homes
        # decode wrong with no overflow count
        raise ValueError(
            f"fat_cap={fat_cap} >= 2^24 breaks the f32-exactness "
            "precondition of the merged parent gather (homesort._i2f); "
            "use a smaller cap (overflow is counted, never silent)"
        )
    live_cap = cfg.fat_live_cap
    if live_cap is None:
        live_cap = min(2_097_152, max(1024, n + n // 4))
    return fat_cap, min(live_cap, fat_cap)


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
    return htx, hty, on


def _i2f(x):
    """Integer columns ride row gathers as f32 VALUES (exact below 2^24,
    which every tile/block/slot index here satisfies). NOT a bitcast:
    small-int bit patterns are denormal floats, and the TPU flushes
    denormals to zero in copies/concats — bitcast-encoded windows read
    back as zeros on device (measured: pairs=0 at the 1080p bench)."""
    return x.astype(jnp.float32)


def _f2i(x):
    return x.astype(jnp.int32)


def _block_qmin(mx, my, ca, cb, cc, wx0, wx1, wy0, wy1, ts: float):
    """min of the conic quadratic over the window's pixel rect
    [wx0·ts, wx1·ts − 1] × [wy0·ts, wy1·ts − 1] — the same closed form as
    binning's exact per-tile ellipse cull (render/binning.py), applied at
    block granularity."""
    dxl = wx0.astype(jnp.float32) * ts - mx
    dxr = wx1.astype(jnp.float32) * ts - 1.0 - mx
    dyl = wy0.astype(jnp.float32) * ts - my
    dyr = wy1.astype(jnp.float32) * ts - 1.0 - my
    inside = (dxl <= 0) & (dxr >= 0) & (dyl <= 0) & (dyr >= 0)
    neg_cb_rcc = -cb / cc
    neg_cb_rca = -cb / ca

    def _edge_x(dx):
        dy = jnp.clip(neg_cb_rcc * dx, dyl, dyr)
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    def _edge_y(dy):
        dx = jnp.clip(neg_cb_rca * dy, dxl, dxr)
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    qmin = jnp.minimum(
        jnp.minimum(_edge_x(dxl), _edge_x(dxr)),
        jnp.minimum(_edge_y(dyl), _edge_y(dyr)),
    )
    return jnp.where(inside, 0.0, qmin)


def build_home_layout(p: ProjectedSplats, cam: Camera, cfg: RenderConfig):
    """Sort the PROJECTED scene by (home tile, depth), splitting fat
    splats into per-block copies in exact mode. Returns
    (p_home: ProjectedSplats [NH], HomeLayout); NH = N + live_cap
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
    h = span // 2

    if cfg.footprint_clamp:
        htx, hty, on = _legacy_home(p, tiles_x, tiles_y, cfg)
        home_key = jnp.where(on, hty * tiles_x + htx, t_sent)
        dkey = depth_bits(jnp.where(valid, depth, 1.0))
        nt = n
        nh = n
        fat_cap = 0
        parent = jnp.zeros((0,), jnp.int32)
        seg_base = jnp.zeros((n + 1,), jnp.int32)
        win_n = jnp.zeros((n, 4), jnp.int32)  # sentinel: binning reclamps
        win_tail = jnp.zeros((0, 4), jnp.int32)
        hx_pre = htx
        hy_pre = hty
        on_ext = on
        n_ovf = jnp.zeros((), jnp.int32)
    else:
        if cfg.fat_max_blocks >= 1024:
            # the VJP's block-bounded segment reduction (_home_gather_bwd)
            # requires every parent's copy run to span <= 2 of its
            # 1024-row blocks, i.e. run length < 1024
            raise ValueError(
                f"fat_max_blocks={cfg.fat_max_blocks} must be < 1024"
            )
        x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y, cfg.tile_size)
        on = valid & (x1 > x0) & (y1 > y0)
        sbx = -(-(x1 - x0) // span)  # blocks per axis (≥1 when on)
        sby = -(-(y1 - y0) // span)
        maxb = cfg.fat_max_blocks
        nb_full = jnp.where(on, sbx * sby, 1)
        n_blocks = jnp.minimum(nb_full, maxb)
        # primary row = block (0, 0); home = block center, clipped into
        # the image (the window stays ⊆ home±1 after the clip)
        phx = jnp.minimum(x0 + h, tiles_x - 1)
        phy = jnp.minimum(y0 + h, tiles_y - 1)
        pwin = jnp.stack(
            [x0, jnp.minimum(x0 + span, x1), y0, jnp.minimum(y0 + span, y1)],
            axis=-1,
        )

        fat_cap, live_cap = resolve_fat_caps(n, cfg)
        n_ex = n_blocks - 1  # extra blocks per splat (0 for thin/off)
        is_fat = on & (n_ex > 0)
        n_ex = jnp.where(is_fat, n_ex, 0)
        base = jnp.cumsum(n_ex) - n_ex  # copy slots [base, base+n_ex)
        n_copies = base[-1] + n_ex[-1]
        seg_base = jnp.minimum(
            jnp.concatenate([base, (base[-1] + n_ex[-1])[None]]), fat_cap
        ).astype(jnp.int32)

        # ragged parent resolution: rank r of slot j = #fat parents with
        # base ≤ j (marks + cumsum); prank[rank] = parent splat id
        marks = (
            jnp.zeros((fat_cap + 1,), jnp.int32)
            .at[jnp.where(is_fat, base, fat_cap)]
            .add(1, mode="drop")
        )
        r = jnp.cumsum(marks[:fat_cap]) - 1  # [F]
        fat_rank = jnp.cumsum(is_fat.astype(jnp.int32)) - 1
        prank = (
            jnp.zeros((fat_cap + 1,), jnp.int32)
            .at[jnp.where(is_fat & (base < fat_cap), fat_rank, fat_cap)]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        parent = prank[jnp.clip(r, 0, fat_cap - 1)]  # [F] splat ids

        # ONE merged parent-row gather: i32 columns ride as f32 values.
        # Carries BOTH the enumeration geometry (block math + cull) and
        # the full attribute row (radius/rgb) so the tail rows need no
        # second per-parent gather (row gathers are priced per row).
        pcols = jnp.concatenate(
            [
                _i2f(jnp.stack([base, sbx, x0, y0, x1, y1], axis=-1)),
                mean2d,
                p.conic,
                p.opacity[:, None],
                depth[:, None],
                p.radius[:, None],
                p.rgb,
            ],
            axis=-1,
        )  # [N, 17]
        pg = sg(pcols)[parent]  # [F, 17]
        gi = _f2i(pg[:, 0:6])
        gbase, gsbx = gi[:, 0], jnp.maximum(gi[:, 1], 1)
        gx0, gy0, gx1, gy1 = gi[:, 2], gi[:, 3], gi[:, 4], gi[:, 5]
        lanes = jnp.arange(fat_cap, dtype=jnp.int32)
        b = lanes - gbase + 1  # copy's block index (1..nb-1)
        bx = b % gsbx
        by = b // gsbx
        cwx0 = gx0 + span * bx
        cwx1 = jnp.minimum(cwx0 + span, gx1)
        cwy0 = gy0 + span * by
        cwy1 = jnp.minimum(cwy0 + span, gy1)
        chx = jnp.minimum(cwx0 + h, tiles_x - 1)
        chy = jnp.minimum(cwy0 + h, tiles_y - 1)

        # exact block-level ellipse cull: a block whose window can never
        # reach alpha_min produces zero pairs — drop the copy row now
        # (sorts to the sentinel segment; the pair stream is unchanged)
        gmx, gmy = pg[:, 6], pg[:, 7]
        gca, gcb, gcc = pg[:, 8], pg[:, 9], pg[:, 10]
        gop, gdepth = pg[:, 11], pg[:, 12]
        thr = 2.0 * jnp.log(
            jnp.maximum(gop, cfg.alpha_min) / cfg.alpha_min
        ) + 1e-3
        qmin = _block_qmin(
            gmx, gmy, gca, gcb, gcc, cwx0, cwx1, cwy0, cwy1,
            float(cfg.tile_size),
        )
        tail_ok = (lanes < jnp.minimum(n_copies, fat_cap)) & (qmin <= thr)

        win_n = pwin
        win_tail = jnp.stack([cwx0, cwx1, cwy0, cwy1], axis=-1)
        hx_pre = jnp.concatenate([phx, chx])
        hy_pre = jnp.concatenate([phy, chy])
        on_ext = jnp.concatenate([on, tail_ok])
        depth_ext = jnp.concatenate(
            [depth, jnp.where(tail_ok, gdepth, 1.0)]
        )
        home_key = jnp.where(
            on_ext, hy_pre * tiles_x + hx_pre, t_sent
        )
        dkey = depth_bits(depth_ext)
        nt = n + fat_cap
        nh = n + live_cap
        # overflow: blocks beyond fat_max_blocks + copies beyond fat_cap
        # (live-row truncation beyond nh is added after the sort)
        n_ovf = (
            jnp.sum(jnp.where(on, nb_full - n_blocks, 0))
            + jnp.maximum(n_copies - fat_cap, 0)
        ).astype(jnp.int32)

    # full f32 depth resolution (graphdeco semantics): 3-operand radix
    # sort (home, depth_bits, idx); idx as a third KEY makes tie order
    # ascending-index deterministically
    home_sorted, _, perm_full = jax.lax.sort(
        (home_key, dkey, jnp.arange(nt, dtype=jnp.int32)),
        num_keys=3,
        is_stable=False,
    )
    # perm_full is a permutation (unique keys), so the inverse needs only
    # a 1-KEY sort with the iota as payload — measured 10 ms vs 30 ms for
    # the r2 num_keys=2 variant and 26 ms for a scatter-set at nt=3.6M
    # (tools/probe_reorg.py)
    _, inv_ext = jax.lax.sort(
        (perm_full, jnp.arange(nt, dtype=jnp.int32)),
        num_keys=1,
        is_stable=False,
    )
    perm = perm_full[:nh]
    home_sorted = home_sorted[:nh]
    n_live = jnp.sum(on_ext.astype(jnp.int32))
    n_ovf = n_ovf + jnp.maximum(n_live - nh, 0)

    seg_starts = jnp.searchsorted(
        home_sorted,
        jnp.arange(tiles_x * tiles_y + 2, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    packed_n = jnp.concatenate(
        [
            p.mean2d,
            p.depth[:, None],
            p.conic,
            p.radius[:, None],
            p.rgb,
            p.opacity[:, None],
        ],
        axis=-1,
    )  # [N, 11]
    # tail rows = parent attribute copies (reordered from the pg gather —
    # no second per-parent gather) + per-copy windows + liveness, under
    # stop_gradient: the parent GRADIENT flows through home_gather's
    # contiguous-segment sum onto packed_n, so no gather transpose runs
    if cfg.footprint_clamp:
        tail_full = jnp.zeros((0, PCOLS + 5), packed_n.dtype)
    else:
        tail_packed = jnp.concatenate(
            [
                pg[:, 6:8],    # mean2d
                pg[:, 12:13],  # depth
                pg[:, 8:11],   # conic
                pg[:, 13:14],  # radius
                pg[:, 14:17],  # rgb
                pg[:, 11:12],  # opacity
            ],
            axis=-1,
        )
        tail_full = sg(
            jnp.concatenate(
                [tail_packed, _i2f(win_tail),
                 tail_ok.astype(jnp.float32)[:, None]],
                axis=-1,
            )
        )
    full_n = jnp.concatenate(
        [packed_n, _i2f(win_n), on.astype(jnp.float32)[:, None]], axis=-1
    )
    ph = home_gather(
        full_n, tail_full, perm, inv_ext[:n], inv_ext[n:], seg_base
    )
    win = _f2i(ph[:, PCOLS : PCOLS + 4])
    hs = jnp.minimum(home_sorted, t_sent - 1)
    p_home = ProjectedSplats(
        mean2d=ph[:, 0:2],
        depth=ph[:, 2],
        conic=ph[:, 3:6],
        radius=ph[:, 6],
        rgb=ph[:, 7:10],
        opacity=ph[:, 10],
        valid=ph[:, PCOLS + 4] > 0.5,  # liveness rode the layout gather
    )
    layout = HomeLayout(
        perm=perm,
        seg_starts=seg_starts,
        home_x=hs % tiles_x,
        home_y=hs // tiles_x,
        win=win,
        n_valid=jnp.sum(on_ext.astype(jnp.int32)),
        n_fat_overflow=jnp.asarray(n_ovf, jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )
    return p_home, layout
