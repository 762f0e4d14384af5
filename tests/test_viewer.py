"""Viewer / passes / image IO tests."""

import numpy as np
import pytest

from gsjax import RenderConfig
from gsjax.utils.image import read_png, write_png, to_uint8
from conftest import make_random_scene


def test_png_roundtrip(tmp_path, rng):
    img = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    path = tmp_path / "t.png"
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, to_uint8(img))


def test_render_orbit_writes_frames(tmp_path, rng):
    from gsjax.viewer import render_orbit

    g = make_random_scene(rng, n=60, z_range=(-1.0, 1.0))
    frames = render_orbit(
        g,
        n_frames=3,
        radius=5.0,
        cfg=RenderConfig(backend="xla", tile_list_cap=128, chunk=32),
        out_dir=tmp_path,
        fx=80,
        fy=80,
        width=64,
        height=48,
    )
    assert frames.shape == (3, 48, 64, 3)
    assert (tmp_path / "frame_0002.png").exists()
    # frames differ (camera moves)
    assert np.abs(frames[0] - frames[2]).max() > 1e-3


def test_fade_in_pass_grows_scene(rng, default_camera):
    from gsjax.render.passes import depth_fade
    from gsjax import render

    g = make_random_scene(rng, n=50)
    cfg = RenderConfig(backend="xla", tile_list_cap=128, chunk=32)
    full = np.asarray(render(g, default_camera, cfg))
    faded0 = np.asarray(render(g, default_camera, cfg, passes=(depth_fade(0.0),)))
    faded1 = np.asarray(render(g, default_camera, cfg, passes=(depth_fade(1.0),)))
    assert faded0.sum() < full.sum() * 0.2  # fade 0 ⇒ (almost) nothing visible
    np.testing.assert_allclose(faded1, full, atol=1e-5)  # fade 1 ⇒ identity


def test_splat_scale_pass(rng, default_camera):
    from gsjax.render.passes import splat_scale
    from gsjax import render

    g = make_random_scene(rng, n=50)
    cfg = RenderConfig(backend="xla", tile_list_cap=128, chunk=32)
    s1 = np.asarray(render(g, default_camera, cfg, passes=(splat_scale(1.0),)))
    s2 = np.asarray(render(g, default_camera, cfg, passes=(splat_scale(2.0),)))
    base = np.asarray(render(g, default_camera, cfg))
    np.testing.assert_allclose(s1, base, atol=1e-6)
    # doubling footprints increases coverage
    assert (s2 > 0.01).sum() > (base > 0.01).sum()
