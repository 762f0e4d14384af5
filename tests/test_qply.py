"""Quantized-PLY loader tests against a synthesized file (format per
/root/reference/src/loaders/PLYLoader.ts:893-1196)."""

import numpy as np
import pytest

from gsjax import load_ply


def _build_qply(rng, counts=(5, 4, 3, 6)):
    """Synthesize a quantized PLY: 4 band groups + 256-entry codebooks."""
    cb_names = (
        ["scaling", "rotation_re", "rotation_im", "features_dc", "opacity"]
        + [f"features_rest_{k}" for k in range(15)]
    )
    codebooks = {
        "scaling": rng.uniform(-6, -2, 256),
        "rotation_re": rng.uniform(-1, 1, 256),
        "rotation_im": rng.uniform(-1, 1, 256),
        "features_dc": rng.uniform(-1, 2, 256),
        "opacity": rng.uniform(-4, 4, 256),
        **{f"features_rest_{k}": rng.normal(0, 0.3, 256) for k in range(15)},
    }
    cb_f16 = {k: v.astype(np.float16) for k, v in codebooks.items()}

    header = ["ply", "format binary_little_endian 1.0"]
    bodies = []
    expected = []
    stride_lut = {0: 0, 1: 3, 2: 8, 3: 15}
    for bands, n in enumerate(counts):
        stride = stride_lut[bands]
        props = (
            [("short", c) for c in ("x", "y", "z")]
            + [("uchar", f"f_dc_{c}") for c in range(3)]
            + [("uchar", f"f_rest_{j}") for j in range(3 * stride)]
            + [("uchar", "opacity")]
            + [("uchar", f"scale_{i}") for i in range(3)]
            + [("uchar", f"rot_{i}") for i in range(4)]
        )
        header.append(f"element vertex_{bands} {n}")
        header += [f"property {t} {p}" for t, p in props]
        dtype = np.dtype([(p, "<i2" if t == "short" else "u1") for t, p in props])
        rows = np.zeros(n, dtype)
        pos = rng.normal(0, 2, (n, 3)).astype(np.float16)
        for i, c in enumerate(("x", "y", "z")):
            rows[c] = pos[:, i].view(np.int16)
        for name in dtype.names:
            if name in ("x", "y", "z"):
                continue
            rows[name] = rng.integers(0, 256, n, dtype=np.uint8)
        bodies.append(rows.tobytes())

        exp = {
            "means": pos.astype(np.float32),
            "log_scales": np.stack(
                [cb_f16["scaling"][rows[f"scale_{i}"]] for i in range(3)], -1
            ).astype(np.float32),
            "quats": np.stack(
                [cb_f16["rotation_re"][rows["rot_0"]]]
                + [cb_f16["rotation_im"][rows[f"rot_{i}"]] for i in (1, 2, 3)],
                -1,
            ).astype(np.float32),
            "opacity": cb_f16["opacity"][rows["opacity"]].astype(np.float32),
        }
        sh = np.zeros((n, 16, 3), np.float32)
        for c in range(3):
            sh[:, 0, c] = cb_f16["features_dc"][rows[f"f_dc_{c}"]]
        for c in range(3):
            for k in range(stride):
                sh[:, 1 + k, c] = cb_f16[f"features_rest_{k}"][
                    rows[f"f_rest_{c * stride + k}"]
                ]
        exp["sh"] = sh
        expected.append(exp)

    header.append("element codebook_centers 256")
    header += [f"property short {nm}" for nm in cb_names]
    header.append("end_header")
    cb_block = np.stack([cb_f16[k].view(np.int16) for k in cb_names], axis=1)

    buf = ("\n".join(header) + "\n").encode() + b"".join(bodies) + cb_block.tobytes()
    return buf, expected


def test_qply_roundtrip(rng):
    buf, expected = _build_qply(rng)
    g = load_ply(buf, quantized=True)
    n_total = sum(e["means"].shape[0] for e in expected)
    assert g.n == n_total
    means = np.concatenate([e["means"] for e in expected])
    np.testing.assert_allclose(np.asarray(g.means), means, atol=1e-6)
    log_scales = np.concatenate([e["log_scales"] for e in expected])
    np.testing.assert_allclose(np.asarray(g.log_scales), log_scales, atol=1e-6)
    quats = np.concatenate([e["quats"] for e in expected])
    np.testing.assert_allclose(np.asarray(g.quats), quats, atol=1e-6)
    opac = np.concatenate([e["opacity"] for e in expected])
    np.testing.assert_allclose(np.asarray(g.opacity_logits), opac, atol=1e-6)
    sh = np.concatenate([e["sh"] for e in expected])
    np.testing.assert_allclose(np.asarray(g.sh), sh, atol=1e-6)


def test_qply_mixed_degrees_render(rng, default_camera):
    """Mixed band groups render without any band bookkeeping (zero-padded
    SH ≙ the reference's u_bandIndex partitioning)."""
    from gsjax import RenderConfig, render_oracle
    import dataclasses

    buf, _ = _build_qply(rng, counts=(8, 8, 8, 8))
    g = load_ply(buf, quantized=True)
    g = dataclasses.replace(
        g, means=np.asarray(g.means) * 0.2 + np.array([0, 0, 5.0], np.float32)
    )
    img = np.asarray(render_oracle(g, default_camera, RenderConfig(backend="oracle")))
    assert np.all(np.isfinite(img))
    assert img.max() > 0


def test_qply_rejects_bad_header():
    with pytest.raises(ValueError):
        load_ply(b"ply\nformat binary_little_endian 1.0\nelement vertex 3\nend_header\n" + b"\0" * 64, quantized=True)


def test_qply_banded_native_storage(rng):
    """banded=True keeps each group's native SH size (no zero padding,
    ≙ PLYLoader.ts:1190-1195) and matches the padded load exactly."""
    from gsjax import BandedGaussians

    buf, expected = _build_qply(rng, counts=(40, 4, 3, 6))  # band-0-heavy
    bg = load_ply(buf, quantized=True, banded=True)
    assert isinstance(bg, BandedGaussians)
    assert bg.band_counts == tuple(e["means"].shape[0] for e in expected)
    ks = tuple(g.sh.shape[1] for g in bg.groups)
    assert ks == (1, 4, 9, 16)  # native sizes per band
    # storage actually shrinks vs the padded form (~4x on band-0-heavy)
    padded_bytes = bg.n * 16 * 3 * 4
    assert bg.sh_bytes() < padded_bytes / 3
    # padded view equals the legacy load
    g_legacy = load_ply(buf, quantized=True)
    g_pad = bg.to_gaussians()
    for name in ("means", "log_scales", "quats", "sh", "opacity_logits"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_pad, name)),
            np.asarray(getattr(g_legacy, name)),
            atol=0,
        )


def test_banded_render_matches_padded(rng, default_camera):
    """A banded scene renders identically to its zero-padded equivalent
    on every backend (the per-degree SH eval is exact, not approximate)."""
    import dataclasses

    from gsjax import RenderConfig, render

    buf, _ = _build_qply(rng, counts=(8, 8, 8, 8))
    bg = load_ply(buf, quantized=True, banded=True)
    bg = dataclasses.replace(
        bg,
        groups=tuple(
            dataclasses.replace(
                g,
                means=np.asarray(g.means) * 0.2 + np.array([0, 0, 5.0], np.float32),
            )
            for g in bg.groups
        ),
    )
    g_pad = bg.to_gaussians()
    for backend in ("oracle", "xla", "stream"):
        cfg = RenderConfig(backend=backend, chunk=32)
        img_b = np.asarray(render(bg, default_camera, cfg))
        img_p = np.asarray(render(g_pad, default_camera, cfg))
        np.testing.assert_allclose(img_b, img_p, atol=1e-6, err_msg=backend)
    # gradients flow into every group
    cfg = RenderConfig(backend="xla", chunk=32)
    grads = jax_grad_groups(bg, default_camera, cfg)
    for gr in grads.groups:
        assert np.isfinite(np.asarray(gr.sh)).all()
        assert np.abs(np.asarray(gr.means)).sum() > 0


def jax_grad_groups(bg, cam, cfg):
    import jax
    import jax.numpy as jnp

    from gsjax import render

    def loss(bg):
        return jnp.sum(render(bg, cam, cfg) ** 2)

    return jax.grad(loss)(bg)
