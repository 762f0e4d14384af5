"""Render passes — functional equivalents of the reference's shader-pass
plugin hook (/root/reference/src/renderers/webgl/passes/ShaderPass.ts:3-8).

In a pure-functional renderer a "pass" is just a transformation of the
projected splats between projection and compositing; `render(...,
passes=[...])` applies them in order. The one concrete pass the
reference ships is FadeInPass (FadeInPass.ts:4-41 + its consumer
vertex.glsl.ts:216-223): new scenes pop in by growing each splat's
screen-space footprint from 0 to full size, near splats first.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gsjax.render.project import ProjectedSplats


def depth_fade(value: float, near: float = 0.1, far: float = 100.0, width: float = 0.1):
    """The reference's depth-fade schedule (vertex.glsl.ts:216-223):
    returns a pass scaling each splat's footprint by
    clamp((value − (d̂ − w)) / 2w, 0, 1) with d̂ the normalized depth.
    Drive `value` 0→1 over frames (≙ FadeInPass.render stepping
    u_depthFade by speed·0.01 per frame, FadeInPass.ts:29-36)."""

    def apply(p: ProjectedSplats, cam, cfg) -> ProjectedSplats:
        # normalized device depth like the reference computes it
        depth_norm = jnp.clip(p.depth / jnp.maximum(cam.far, 1e-6), 0.0, 1.0)
        nd = (2.0 * near) / (far + near - depth_norm * (far - near))
        start = jnp.maximum(nd - width, 0.0)
        end = jnp.minimum(nd + width, 1.0)
        s = jnp.clip((value - start) / jnp.maximum(end - start, 1e-6), 0.0, 1.0)
        # scaling the footprint = scaling cov2d by s² ⇒ conic by 1/s²,
        # radius by s (reference scales the emitted quad by s)
        s_safe = jnp.maximum(s, 1e-6)
        return dataclasses.replace(
            p,
            conic=p.conic / (s_safe * s_safe)[:, None],
            radius=p.radius * s,
            valid=p.valid & (s > 0.0),
        )

    return apply


def splat_scale(factor: float):
    """Uniformly scale every splat's screen-space footprint."""

    def apply(p: ProjectedSplats, cam, cfg) -> ProjectedSplats:
        f = jnp.float32(factor)
        return dataclasses.replace(
            p,
            conic=p.conic / (f * f),
            radius=p.radius * f,
        )

    return apply
