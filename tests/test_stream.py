"""Stream backend (render/pallas_stream.py) vs the XLA backend.

The stream backend must reproduce the XLA backend bit-closely (same pair
enumeration per binning anchor equivalence, same blend semantics; the
only noise is the bf16 hi/lo attribute split, ~1e-5 relative) — forward
AND gradients, across band-row / column-block configurations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_random_scene

from gsjax import Camera, RenderConfig, render


def _cams(w, h):
    return Camera.create(
        position=(0.0, 0.0, 0.0),
        quat=(1.0, 0.0, 0.0, 0.0),
        fx=80.0,
        fy=80.0,
        width=w,
        height=h,
    )


def _cfgs(chunk=32, **kw):
    cfg_x = RenderConfig(backend="xla", tile_list_cap=256, chunk=chunk)
    cfg_s = RenderConfig(
        backend="stream",
        chunk=chunk,
        stream_band_cap=kw.pop("band_cap", 4096),
        stream_block_tiles=kw.pop("block_tiles", 3),
        stream_dma_chunk=kw.pop("dma_chunk", 256),
    )
    return cfg_x, cfg_s


@pytest.mark.parametrize(
    "w,h",
    [(48, 16), (96, 64)],
    ids=["one-band-row", "multi-band-multi-block"],
)
def test_stream_forward_matches_xla(rng, w, h):
    g = make_random_scene(rng, n=400, sh_degree=1, spread=1.3, z_range=(3.0, 9.0))
    cam = _cams(w, h)
    cfg_x, cfg_s = _cfgs()
    ix = render(g, cam, cfg_x)
    s, aux = render(g, cam, cfg_s, return_aux=True)
    assert int(aux["n_band_overflow"]) == 0
    d = np.abs(np.asarray(ix) - np.asarray(s))
    # the bf16 hi/lo attribute noise (~1e-5) can flip alpha_min /
    # termination inclusion for isolated splat-pixel pairs — a real
    # discontinuity of the renderer, not an error; bound the bulk tightly
    # and the flips loosely
    assert (d > 5e-4).mean() < 0.01, (d > 5e-4).mean()
    assert d.max() < 5e-3, d.max()


def test_stream_forward_fat_splats(rng):
    # footprints spanning many tiles exercise the span clamp + windows
    g = make_random_scene(rng, n=200, spread=1.0, z_range=(2.0, 6.0))
    g = dataclasses.replace(g, log_scales=g.log_scales + 1.2)
    cam = _cams(96, 64)
    cfg_x, cfg_s = _cfgs()
    ix = render(g, cam, cfg_x)
    s = render(g, cam, cfg_s)
    d = np.abs(np.asarray(ix) - np.asarray(s))
    assert np.percentile(d, 99.5) < 5e-4, np.percentile(d, 99.5)
    assert d.max() < 1e-2, d.max()


def test_stream_grads_match_xla(rng):
    g = make_random_scene(rng, n=300, sh_degree=1, spread=1.2, z_range=(3.0, 8.0))
    cam = _cams(96, 64)
    tgt = jnp.asarray(rng.uniform(0, 1, (64, 96, 3)), jnp.float32)
    cfg_x, cfg_s = _cfgs()

    def loss(g, cfg):
        img = render(g, cam, cfg)
        return jnp.mean((img - tgt) ** 2)

    gx = jax.grad(lambda g: loss(g, cfg_x))(g)
    gs = jax.grad(lambda g: loss(g, cfg_s))(g)
    for f in ["means", "log_scales", "quats", "sh", "opacity_logits"]:
        a, b = np.asarray(getattr(gx, f)), np.asarray(getattr(gs, f))
        peak = np.abs(a).max() + 1e-12
        rel = np.abs(a - b) / peak
        # bulk must agree tightly; inclusion-threshold flips change a few
        # splats' gradients discontinuously (same property vs graphdeco)
        assert np.percentile(rel, 99) < 5e-3, (f, np.percentile(rel, 99))
        assert rel.max() < 1e-1, (f, rel.max())


def test_stream_band_overflow_is_counted(rng):
    g = make_random_scene(rng, n=500, spread=0.3, z_range=(3.0, 6.0))
    cam = _cams(48, 32)
    # cap far below the dense center band: must be detected, not silent
    cfg = RenderConfig(
        backend="stream",
        chunk=32,
        stream_band_cap=256,
        stream_block_tiles=3,
        stream_dma_chunk=128,
    )
    _, aux = render(g, cam, cfg, return_aux=True)
    assert int(aux["n_band_overflow"]) > 0


def test_home_anchor_equals_rect_anchor(rng):
    from gsjax.render.binning import build_tile_bins
    from gsjax.render.project import project

    g = make_random_scene(rng, n=800, spread=1.5, z_range=(2.0, 9.0))
    g = dataclasses.replace(g, log_scales=g.log_scales + 1.0)
    cam = _cams(96, 64)
    cfg = RenderConfig()
    p = project(g, cam, cfg)
    br = build_tile_bins(p, cam, cfg, anchor="rect")
    bh = build_tile_bins(p, cam, cfg, anchor="home")
    k = cfg.tile_span**2
    np.testing.assert_array_equal(
        np.asarray(br.tile_starts), np.asarray(bh.tile_starts)
    )
    n = int(br.n_pairs)
    np.testing.assert_array_equal(
        np.asarray(br.pid_sorted[:n]) // k, np.asarray(bh.pid_sorted[:n]) // k
    )
