"""Lazy frame plans: cross-frame layout reuse + home-resident training
state (render/DESIGN.md speed-of-light memo, rungs 1+2).

The per-frame-exact stream pipeline rebuilds, from scratch every step, a
data layout that barely changes between training steps: the (home tile,
depth) sort, the fat-splat enumeration, the pair expansion + repack
sort, the pid windows — and, in the backward, three inverse row gathers
returning gradients to splat order. Measured at the 1080p bench this
reorganization is ~200 ms of a 377 ms frame, with a per-frame-exact
floor of ~265 ms (DESIGN.md r4). The reference does not pay this tax:
its depth sort is asynchronous and frames draw with a STALE permutation
while only the attributes are fresh
(/root/reference/src/renderers/webgl/utils/Worker.ts:45-57 — the
worker throttles to one sort at a time; WebGLRenderer.ts:269 posts the
fresh camera and draws with the last completed index buffer).

This module makes that trade explicit and bounded:

  * `build_frame_plan` runs the full prologue ONCE (a "resort") and
    captures every order-dependent artifact as a static FramePlan: the
    home permutation's inverse structure, the per-row home tiles, the
    sorted pair stream's pid windows, the DMA block table.
  * Between resorts, parameters AND optimizer state live in HOME ORDER
    (`extract_home`): a lazy step is just project(home rows) → fresh
    attribute table → blend kernels → adam on home rows. No sort, no
    gathers — forward or backward (rung 2: gradients arrive in home
    order and are consumed there).
  * Fat-splat copy rows carry their own parameter copies and train
    independently between resorts; at resort cadence `fold_back`
    reduces each row's parameter/moment DELTA onto its source splat
    (the same block-bounded segment reduction as home_gather's VJP) —
    averaged over a splat's live rows by default, which keeps the
    Adam step magnitude of a many-copy splat at one step's scale
    (summing the per-copy Adam deltas would amplify it by the copy
    count). Exactness: a scene with no fat splats under a
    gradient-linear optimizer folds back EXACTLY; in general the drift
    vs the per-frame-exact path is bounded by K steps of per-row update
    divergence and is measured at the bench (tools/probe_lazy_drift.py).

What is stale between resorts (≙ the reference's stale permutation):
pair membership and order, per-row windows/culls, tile segment
boundaries. What is fresh every step: every rendered ATTRIBUTE
(projection of the current parameters under the current camera) — a
splat that moved slightly renders at its fresh position inside its
stale pair set; a splat culled by the fresh projection is masked to
zero opacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.core.camera import Camera
from gsjax.core.config import RenderConfig
from gsjax.render.binning import build_tile_bins
from gsjax.render.composite import assemble_band, clipped_pair_stream
from gsjax.render.homesort import (
    build_home_layout,
    reduce_home_rows,
)
from gsjax.render.pallas_stream import (
    band_blocks,
    blend_stream,
    packed_pid_windows,
)
from gsjax.render.pipeline import _project_any


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "pidx",
        "inv",
        "inv_tail",
        "seg_base",
        "home_x",
        "home_y",
        "pidwin",
        "tile_of",
        "cbase",
        "starts",
        "blktab",
        "ty0",
        "ovf",
    ],
    meta_fields=["tiles_x", "band_rows", "n"],
)
@dataclasses.dataclass(frozen=True)
class FramePlan:
    """Everything order-dependent about one frame, captured at resort.

    pidx [NH] i32: the SOURCE SPLAT of each home row (primary rows map
    through the permutation, copy rows to their fat parent; dead rows
    to N = an inert zero pad). inv [N] / inv_tail [F] / seg_base [N+1]:
    the inverse structure fold_back reduces deltas through (same
    machinery as home_gather's VJP). home_x/home_y [NH]: per-row home
    tiles (the stream table stores means relative to them). pidwin /
    tile_of / cbase / starts / blktab / ty0: the stream kernels' static
    tables (pallas_stream). ovf: the overflow counters measured at plan
    build — the plan's streams are static, so these are the step's
    counters too."""

    pidx: jax.Array
    inv: jax.Array
    inv_tail: jax.Array
    seg_base: jax.Array
    home_x: jax.Array
    home_y: jax.Array
    pidwin: jax.Array
    tile_of: jax.Array
    cbase: jax.Array
    starts: jax.Array
    blktab: jax.Array
    ty0: jax.Array
    ovf: dict
    tiles_x: int
    band_rows: int
    n: int

    @property
    def nh(self) -> int:
        return self.pidx.shape[0]


@partial(jax.jit, static_argnums=(2,))
def _build_plan_jit(g, cam: Camera, cfg: RenderConfig):
    p = _project_any(g, cam, cfg)
    p, layout, extras = build_home_layout(p, cam, cfg, return_extras=True)
    bins = build_tile_bins(p, cam, cfg, anchor="home", layout=layout)
    pid, starts, n_dropped = clipped_pair_stream(bins, cfg)
    sid_dead = None
    if cfg.pair_repack and not cfg.footprint_clamp:
        from gsjax.render.binning import _EXPAND_R

        nh = p.depth.shape[0]
        sid_dead = -(-nh // _EXPAND_R) * _EXPAND_R
    pidwin, tile_of, cbase = packed_pid_windows(pid, starts, cfg, sid_dead)
    blktab, n_bovf = band_blocks(
        layout.seg_starts, bins.ty0, bins.tiles_x, layout.tiles_y,
        bins.band_rows, cfg, seg_row0=layout.seg_row0,
        rows_present=layout.rows_present,
    )
    n = extras["inv"].shape[0]
    perm = layout.perm
    fat_cap = extras["parent_of_slot"].shape[0]
    if fat_cap:
        src = jnp.where(
            perm < n,
            jnp.minimum(perm, n - 1),
            extras["parent_of_slot"][
                jnp.clip(perm - n, 0, fat_cap - 1)
            ],
        )
    else:
        src = jnp.minimum(perm, n - 1)
    # dead rows (sentinel segment / culled copies) point at the inert pad
    # row N: their extracted params render nothing and receive no grads,
    # so their fold-back delta is exactly zero
    live_row = p.valid
    pidx = jnp.where(live_row, src, n)
    ovf = {
        "n_pair_overflow": jnp.asarray(
            n_dropped + bins.n_repack_overflow, jnp.int32
        ),
        "n_band_overflow": jnp.asarray(n_bovf, jnp.int32),
        "n_fat_overflow": jnp.asarray(layout.n_fat_overflow, jnp.int32),
        "n_tile_overflow": jnp.zeros((), jnp.int32),
        "n_pairs": jnp.asarray(bins.n_pairs, jnp.int32),
    }
    return FramePlan(
        pidx=pidx,
        inv=extras["inv"],
        inv_tail=extras["inv_tail"],
        seg_base=extras["seg_base"],
        home_x=layout.home_x,
        home_y=layout.home_y,
        pidwin=pidwin,
        tile_of=tile_of,
        cbase=cbase,
        starts=starts,
        blktab=blktab,
        ty0=bins.ty0,
        ovf=ovf,
        tiles_x=bins.tiles_x,
        band_rows=bins.band_rows,
        n=n,
    )


def build_frame_plan(g, cam: Camera, cfg: RenderConfig) -> FramePlan:
    """One resort: run the full prologue (project → home layout → pair
    expansion → repack sort → pid windows → DMA block table) at the
    CURRENT params/camera and freeze the result. `cam` is traced — one
    compile covers every view of an orbit. The stream backend's
    exact-footprint path is required (cfg.backend is not consulted;
    the plan is only consumed by the stream kernels)."""
    if cfg.tile_span != 3:
        raise ValueError("frame plans require tile_span == 3 (stream backend)")
    if cfg.footprint_clamp:
        raise ValueError("frame plans require exact footprints "
                         "(footprint_clamp=False)")
    return _build_plan_jit(g, cam, cfg)


# --------------------------------------------------------------------------
# home-resident state
# --------------------------------------------------------------------------


def _is_per_splat(x, n: int):
    return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n


def extract_home(tree, plan: FramePlan):
    """Re-index every per-splat leaf ([N, ...]) of `tree` into home order
    ([NH, ...]) through plan.pidx; other leaves (optimizer step counts)
    pass through. Copies of a fat parent start as identical rows. One
    row gather per leaf — paid at resort cadence only."""
    idx = plan.pidx  # [NH]; value N = the inert zero pad row

    def gt(x):
        if not _is_per_splat(x, plan.n):
            return x
        xp = jnp.concatenate([x, jnp.zeros_like(x[:1])])
        return xp[idx]

    return jax.tree.map(gt, tree)


def fold_back(master, hp, hp0, plan: FramePlan, reduce: str = "mean"):
    """Fold K steps of home-space training back into splat order:
    master + reduce_rows(hp − hp0). Primary rows map bijectively through
    the inverse permutation; copy rows segment-reduce onto their fat
    parent (homesort.reduce_home_rows — the same machinery as
    home_gather's VJP, now paid once per resort instead of every step).

    reduce="mean" divides each splat's summed delta by its live row
    count: per-row Adam steps are lr-scale regardless of how the
    gradient mass splits across a splat's copies, so SUMMING deltas
    would scale a many-copy splat's effective step by its copy count —
    the mean keeps it at one step's scale (and is exact for thin
    splats, where the row count is 1). reduce="sum" is exact for
    gradient-linear optimizers (plain SGD)."""
    n = plan.n
    f = plan.inv_tail.shape[0]

    def red(d2):
        return reduce_home_rows(
            d2, n, f, plan.inv, plan.inv_tail, plan.seg_base
        )

    if reduce not in ("mean", "sum"):
        raise ValueError(f"unknown reduce {reduce!r}")
    # only LIVE rows carry state (dead rows hold the inert pad and
    # receive no grads, but mask anyway so arbitrary deltas — and any
    # numerical junk parked on dead rows — never reach a parent)
    live = (plan.pidx < n).astype(jnp.float32)[:, None]
    cnt = None
    if reduce == "mean":
        cnt = jnp.maximum(red(live), 1.0)  # [N, 1] live rows per splat

    def fold_leaf(x, h, h0):
        if not _is_per_splat(h, plan.nh):
            return h  # scalars (optimizer step count): take the stepped value
        d = (h - h0).reshape(plan.nh, -1) * live
        r = red(d)
        if cnt is not None:
            r = r / cnt
        return x + r.reshape(x.shape).astype(x.dtype)

    return jax.tree.map(fold_leaf, master, hp, hp0)


# --------------------------------------------------------------------------
# the lazy step
# --------------------------------------------------------------------------


def lazy_cols(hp, cam: Camera, cfg: RenderConfig, plan: FramePlan):
    """Fresh per-home-row attribute columns for the blend: project the
    home-resident params under the (fresh) camera. Rows the fresh
    projection culls are masked to zero opacity and sanitized geometry —
    the lazy analogue of a splat leaving the frustum between the
    reference's sorts (it keeps its stale index-buffer slot but draws
    nothing)."""
    p = _project_any(hp, cam, cfg)
    val = p.valid
    op = jnp.where(val, p.opacity, 0.0)
    mx = jnp.where(val, p.mean2d[:, 0], 0.0)
    my = jnp.where(val, p.mean2d[:, 1], 0.0)
    ca = jnp.where(val, p.conic[:, 0], 1.0)
    cb = jnp.where(val, p.conic[:, 1], 0.0)
    cc = jnp.where(val, p.conic[:, 2], 1.0)
    ts = float(cfg.tile_size)
    if not cfg.stream_exact_table:
        # means relative to the row's home-tile origin: the bf16 hi/lo
        # split table's error stays ~1e-4 px at any resolution
        mx = mx - plan.home_x.astype(jnp.float32) * ts
        my = my - plan.home_y.astype(jnp.float32) * ts
    return (mx, my, ca, cb, cc, p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], op)


def lazy_render(hp, cam: Camera, cfg: RenderConfig, plan: FramePlan,
                return_aux: bool = False):
    """Render with the plan's frozen layout and FRESH attributes.
    Differentiable w.r.t. hp (gradients arrive in home order — no
    inverse gathers anywhere in the backward)."""
    cols = lazy_cols(hp, cam, cfg, plan)
    img_t, T_t = blend_stream(
        cols, plan.pidwin, plan.blktab, plan.starts, plan.cbase,
        plan.tile_of, plan.ty0, plan.tiles_x, plan.band_rows, cfg,
    )
    img, T_map = assemble_band(img_t, T_t, plan, cfg)
    img = img[: cam.height, : cam.width]
    if not return_aux:
        return img
    aux = dict(plan.ovf)
    aux["transmittance"] = T_map[: cam.height, : cam.width]
    return img, aux


def make_lazy_step(cfg: RenderConfig, optimizer):
    """Jitted lazy training step over home-resident state:
    (hp, opt_state, target, cam, plan) → (hp, opt_state, loss).
    hp/opt_state are donated (consumed and replaced); cam and plan are
    traced, so one compile covers every view/resort of a trajectory."""
    import optax

    @partial(jax.jit, static_argnums=(), donate_argnums=(0, 1))
    def step(hp, opt_state, target, cam, plan):
        def loss_fn(hp):
            img = lazy_render(hp, cam, cfg, plan)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(hp)
        updates, opt_state = optimizer.update(grads, opt_state, hp)
        hp = optax.apply_updates(hp, updates)
        return hp, opt_state, loss

    return step


# --------------------------------------------------------------------------
# host-side trainer: resort cadence + fold-back bookkeeping
# --------------------------------------------------------------------------


class LazyTrainer:
    """Drives lazy training: master (g, opt_state) in splat order,
    home-resident (hp, hp_opt) between resorts.

        tr = LazyTrainer(g, cfg, optimizer)
        for view in trajectory:
            tr.resort(view)                  # fold back + rebuild plan
            for _ in range(steps_per_view):
                loss = tr.step(target, view)
        g = tr.sync()                        # final fold-back

    The first step after a resort is EXACT (the plan was built at the
    current params); subsequent steps reuse the layout with fresh
    attributes. Resort overflow counters gate via `tr.plan.ovf`."""

    def __init__(self, g, cfg: RenderConfig, optimizer, reduce="mean"):
        self.g = g
        self.cfg = cfg
        self.optimizer = optimizer
        self.reduce = reduce
        self.opt_state = optimizer.init(g)
        self.plan = None
        self.hp = None
        self.hp_opt = None
        self._step = make_lazy_step(cfg, optimizer)
        # hp/hp_opt are donated by the step, so the resort-time snapshot
        # (hp0) is NOT kept as an alias — the fold re-extracts it from
        # the (unchanged) master state instead
        self._fold = jax.jit(
            partial(self._fold_impl, reduce=reduce), donate_argnums=(2, 3)
        )
        self._extract = jax.jit(extract_home)

    @staticmethod
    def _fold_impl(g, opt_state, hp, hp_opt, plan, reduce):
        g2 = fold_back(g, hp, extract_home(g, plan), plan, reduce)
        opt2 = fold_back(
            opt_state, hp_opt, extract_home(opt_state, plan), plan, reduce
        )
        return g2, opt2

    def sync(self):
        """Fold home-space progress back into the master state."""
        if self.plan is not None:
            self.g, self.opt_state = self._fold(
                self.g, self.opt_state, self.hp, self.hp_opt, self.plan
            )
            self.hp = self.hp_opt = None
            self.plan = None
        return self.g

    def resort(self, cam: Camera):
        """Fold back, rebuild the frame plan at the current params and
        this camera, and re-extract home-resident state."""
        self.sync()
        self.plan = build_frame_plan(self.g, cam, self.cfg)
        self.hp = self._extract(self.g, self.plan)
        self.hp_opt = self._extract(self.opt_state, self.plan)
        return self.plan

    def step(self, target, cam: Camera):
        if self.plan is None:
            raise RuntimeError("call resort(cam) before step()")
        self.hp, self.hp_opt, loss = self._step(
            self.hp, self.hp_opt, target, cam, self.plan
        )
        return loss
