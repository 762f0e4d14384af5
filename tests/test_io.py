"""IO tests: .splat round-trip, PLY parsing (numpy + native parity),
SH layout."""

import io
import struct

import numpy as np
import pytest

from gsjax import Gaussians, load_splat, save_splat, load_ply
from gsjax.core.gaussians import SH_C0


def _random_gaussians(rng, n=32):
    q = rng.normal(size=(n, 4))
    return Gaussians.from_activated(
        means=rng.normal(size=(n, 3)).astype(np.float32),
        scales=rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32),
        quats=q / np.linalg.norm(q, axis=-1, keepdims=True),
        opacities=rng.uniform(0.05, 0.95, n),
        rgb=rng.uniform(0, 1, (n, 3)),
    )


def test_splat_roundtrip(rng, tmp_path):
    g = _random_gaussians(rng)
    path = tmp_path / "scene.splat"
    save_splat(g, path)
    g2 = load_splat(path)
    assert g2.n == g.n
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.scales), np.asarray(g.scales), rtol=1e-5)
    # u8 quantization: opacity to 1/255, quats to 1/128
    np.testing.assert_allclose(
        np.asarray(g2.opacities), np.asarray(g.opacities), atol=1 / 255 + 1e-3
    )
    q1 = np.asarray(g.normalized_quats())
    q2 = np.asarray(g2.normalized_quats())
    assert np.max(np.abs(np.abs(np.sum(q1 * q2, -1)) - 1)) < 1e-3
    # degree-0 color round-trips through the SH_C0 encoding
    rgb1 = 0.5 + SH_C0 * np.asarray(g.sh[:, 0])
    rgb2 = 0.5 + SH_C0 * np.asarray(g2.sh[:, 0])
    np.testing.assert_allclose(rgb2, rgb1, atol=1 / 255 + 1e-3)


def test_splat_rejects_bad_length():
    with pytest.raises(ValueError):
        load_splat(b"\x00" * 33)


def _write_ply(rng, n=16, n_rest=45, order_shuffle=False):
    """Synthesize a 3DGS PLY byte buffer."""
    props = (
        ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity", "scale_0", "scale_1", "scale_2", "rot_0", "rot_1", "rot_2", "rot_3"]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    ).encode()
    data = rng.normal(size=(n, len(props))).astype("<f4")
    return header + data.tobytes(), props, data


def test_ply_parse_numpy(rng):
    buf, props, data = _write_ply(rng)
    g = load_ply(buf, use_native=False)
    assert g.n == 16 and g.sh.shape == (16, 16, 3)
    ix = {p: i for i, p in enumerate(props)}
    np.testing.assert_allclose(
        np.asarray(g.means), data[:, [ix["x"], ix["y"], ix["z"]]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g.log_scales),
        data[:, [ix["scale_0"], ix["scale_1"], ix["scale_2"]]],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(g.opacity_logits), data[:, ix["opacity"]], atol=1e-6
    )
    # SH layout: file channel-major → [N, coeff, channel]; check f_rest_17
    # = G channel (c=1), coeff index 1+2
    np.testing.assert_allclose(
        np.asarray(g.sh[:, 3, 1]), data[:, ix["f_rest_17"]], atol=1e-6
    )
    # f_rest_39 must be read (reference bug at PLYLoader.ts:685 not replicated)
    np.testing.assert_allclose(
        np.asarray(g.sh[:, 10, 2]), data[:, ix["f_rest_39"]], atol=1e-6
    )


def test_ply_degree1(rng):
    buf, props, data = _write_ply(rng, n_rest=9)
    g = load_ply(buf, use_native=False)
    assert g.sh.shape == (16, 4, 3)


def test_ply_use_shs_false(rng):
    buf, _, _ = _write_ply(rng)
    g = load_ply(buf, use_shs=False, use_native=False)
    assert g.sh.shape == (16, 1, 3)


def test_ply_polycam_flip(rng):
    buf, props, data = _write_ply(rng)
    g0 = load_ply(buf, use_native=False)
    g1 = load_ply(buf, format="polycam", use_native=False)
    m0, m1 = np.asarray(g0.means), np.asarray(g1.means)
    np.testing.assert_allclose(m1, m0 * np.array([1, -1, -1]), atol=1e-6)


def test_ply_rejects_garbage():
    with pytest.raises(ValueError):
        load_ply(b"not a ply file at all", use_native=False)


def test_ply_native_matches_numpy(rng):
    """Native C++ parser parity with the numpy parser (skips if the
    library is not built)."""
    from gsjax.io.native import parse_ply_native

    buf, _, _ = _write_ply(rng, n=64)
    out = parse_ply_native(buf)
    if out is None:
        pytest.skip("native/libgsjax_io.so not built")
    g_np = load_ply(buf, use_native=False)
    np.testing.assert_allclose(out["means"], np.asarray(g_np.means), atol=1e-7)
    np.testing.assert_allclose(out["log_scales"], np.asarray(g_np.log_scales), atol=1e-7)
    np.testing.assert_allclose(out["quats"], np.asarray(g_np.quats), atol=1e-7)
    np.testing.assert_allclose(out["sh"], np.asarray(g_np.sh), atol=1e-7)
    np.testing.assert_allclose(
        out["opacity_logits"], np.asarray(g_np.opacity_logits), atol=1e-7
    )
