"""The oracle renderer: naive O(N·pixels) pure-jnp rasterization.

This is the in-repo ground truth every fast backend is tested against
(SURVEY.md §4: the reference has no tests, so the oracle *is* the test
strategy). It reproduces graphdeco-compatible compositing semantics
exactly, including:

  - tile-granular support (a splat contributes to a pixel iff the pixel's
    tile intersects the splat's radius rect — the same candidate set the
    tile-binned backends see),
  - the 1/255 alpha floor and 0.99 alpha clamp,
  - the front-to-back termination rule: a splat that would push
    transmittance below 1e-4 is excluded and compositing stops
    (sticky per pixel).

Termination is expressed in closed form via the *virtual* cumulative
transmittance C_i = Π_{j≤i, eligible}(1-α_j): C only shrinks, so
"C_i ≥ eps" is exactly graphdeco's sticky `done` flag, and the whole
composite becomes a vectorized cumprod — differentiable by autodiff,
which also makes this the reference *gradient* oracle.

Front-to-back "under" blending here equals the reference's
ONE_MINUS_DST_ALPHA blend state (/root/reference/src/renderers/
WebGLRenderer.ts:141,284 + frag.glsl.ts:13-21) up to the termination rule
the GPU pipeline cannot express (SURVEY §2.3 step 7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsjax.core.camera import Camera
from gsjax.core.config import RenderConfig
from gsjax.core.gaussians import Gaussians
from gsjax.render.common import (
    clamp_rect_to_span,
    gaussian_power,
    tile_rect,
)
from gsjax.render.project import ProjectedSplats, project


def render_oracle(
    g: Gaussians,
    cam: Camera,
    cfg: RenderConfig = RenderConfig(),
    return_aux: bool = False,
):
    """Render [H, W, 3] (+ aux dict) the slow, obviously-correct way."""
    p = project(g, cam, cfg)
    return composite_oracle(p, cam, cfg, return_aux=return_aux)


def composite_oracle(
    p: ProjectedSplats,
    cam: Camera,
    cfg: RenderConfig,
    return_aux: bool = False,
):
    H, W = cam.height, cam.width
    n = p.depth.shape[0]

    # depth order: full f32 depth, stable in original index — identical
    # to the (tile, depth_bits, pid) radix order of the binned backends
    # within a tile (graphdeco's raw-f32-key sort).
    order = jnp.argsort(jnp.where(p.valid, p.depth, jnp.inf), stable=True)
    ps = jax.tree.map(lambda x: x[order], p)

    tiles_x = cfg.tiles_x(W)
    tiles_y = cfg.tiles_y(H)
    x0, y0, x1, y1 = tile_rect(ps.mean2d, ps.radius, tiles_x, tiles_y, cfg.tile_size)
    if cfg.footprint_clamp:
        # legacy span-budget mode: mimic the budgeted backends' clamp so
        # comparisons are bit-close. In exact mode (the default) the full
        # rect renders — the TRUE graphdeco semantics (≙ the reference's
        # 1024-px axis reach, vertex.glsl.ts:173-175).
        x0, y0, x1, y1, _ = clamp_rect_to_span(
            x0, y0, x1, y1, ps.mean2d, cfg.tile_size, cfg.tile_span
        )

    px = jnp.arange(W, dtype=jnp.float32)
    py = jnp.arange(H, dtype=jnp.float32)
    tx = (jnp.arange(W) // cfg.tile_size).astype(jnp.int32)  # [W]
    ty = (jnp.arange(H) // cfg.tile_size).astype(jnp.int32)  # [H]

    # [H, W, N] broadcasting — oracle is for small scenes/crops only.
    dx = px[None, :, None] - ps.mean2d[None, None, :, 0]
    dy = py[:, None, None] - ps.mean2d[None, None, :, 1]
    power = gaussian_power(ps.conic[None, None, :, :], dx, dy)
    alpha = jnp.minimum(cfg.alpha_clamp, ps.opacity[None, None, :] * jnp.exp(power))

    cover = (
        (tx[None, :, None] >= x0[None, None, :])
        & (tx[None, :, None] < x1[None, None, :])
        & (ty[:, None, None] >= y0[None, None, :])
        & (ty[:, None, None] < y1[None, None, :])
    )
    eligible = (
        ps.valid[None, None, :]
        & cover
        & (alpha >= cfg.alpha_min)
        & (power <= 0.0)
    )

    f = jnp.where(eligible, 1.0 - alpha, 1.0)  # per-splat transmittance factor
    C = jnp.cumprod(f, axis=-1)  # virtual inclusive transmittance
    include = eligible & (C >= cfg.transmittance_eps)
    T_excl = C / f  # exclusive transmittance seen by each splat
    w = jnp.where(include, T_excl * alpha, 0.0)  # [H, W, N]

    img = jnp.einsum("hwn,nc->hwc", w, ps.rgb, precision="highest")
    T_final = jnp.prod(jnp.where(include, f, 1.0), axis=-1)  # [H, W]
    bg = jnp.asarray(cfg.background, jnp.float32)
    img = img + T_final[..., None] * bg[None, None, :]

    if not return_aux:
        return img
    aux = {
        "transmittance": T_final,
        "n_contrib": jnp.sum(include, axis=-1),
        "projected": p,
    }
    return img, aux
