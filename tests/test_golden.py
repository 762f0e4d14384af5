"""Independent golden rasterizer tests.

BASELINE.md's correctness metric is "allclose vs the reference
CUDA/graphdeco rasterizer"; with zero egress nothing external exists
in-repo, so this file carries the closest achievable stand-in: a tiny
numpy rasterizer HAND-DERIVED from the published 3DGS math (Kerbl et
al. 2023, the EWA projection of Zwicker et al. 2001, and the standard
real-SH tables) — per-pixel python/numpy loops, sharing NO code with
gsjax. Every backend is tested against it on curated cases: SH degree
3, anisotropy, termination-heavy stacks, edge-of-image, alpha
clamp/floor, fat whole-image splats.

Semantics implemented (graphdeco rasterizer behavior):
  - Σ = R·diag(s)·diag(s)·Rᵀ, R from the normalized (w,x,y,z) quat
  - view: p_cam = R_c2wᵀ (p - cam_pos); cull z ≤ 0.2
  - EWA: J with x/z, y/z clamped at ±1.3·tan(fov/2); cov2d = T Σ Tᵀ,
    T = J·W; += 0.3 on the diagonal (the low-pass)
  - radius = ceil(3·sqrt(λ_max)), λ via the 0.1-floored discriminant
  - pixel support at TILE granularity: a pixel sees a splat iff its
    16-px tile lies in the splat's radius rect (graphdeco getRect)
  - alpha = min(0.99, op·exp(power)), skip if alpha < 1/255 or power>0
  - front-to-back by depth; a splat that would push the transmittance
    below 1e-4 is excluded and compositing stops (sticky)
"""

import math

import numpy as np
import pytest

from gsjax import Camera, Gaussians, RenderConfig, render

TS = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_CLAMP = 0.99
EPS_T = 1e-4
NEAR = 0.2
LOWPASS = 0.3

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]
_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435]


def _quat_rot(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _sh_color(coef, d):
    """coef [K, 3], d unit direction; graphdeco eval: clamp(Σ + 0.5, 0)."""
    k = coef.shape[0]
    x, y, z = d
    basis = [_C0]
    if k > 1:
        basis += [-_C1 * y, _C1 * z, -_C1 * x]
    if k > 4:
        xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
        basis += [_C2[0] * xy, _C2[1] * yz, _C2[2] * (2 * zz - xx - yy),
                  _C2[3] * xz, _C2[4] * (xx - yy)]
    if k > 9:
        basis += [
            _C3[0] * y * (3 * xx - yy), _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy), _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    rgb = np.array(basis) @ coef + 0.5
    return np.maximum(rgb, 0.0)


def golden_render(g: Gaussians, cam: Camera):
    """The hand-derived reference rasterizer (see module docstring)."""
    W_img, H_img = cam.width, cam.height
    n = int(np.asarray(g.means).shape[0])
    means = np.asarray(g.means, np.float64)
    scales = np.exp(np.asarray(g.log_scales, np.float64))
    quats = np.asarray(g.quats, np.float64)
    shs = np.asarray(g.sh, np.float64)
    opac = 1.0 / (1.0 + np.exp(-np.asarray(g.opacity_logits, np.float64)))

    cpos = np.asarray(cam.position, np.float64)
    Rc2w = _quat_rot(np.asarray(cam.quat, np.float64))
    Wv = Rc2w.T  # world→camera rotation
    fx, fy = float(cam.fx), float(cam.fy)
    tanx, tany = W_img / (2 * fx), H_img / (2 * fy)
    cx, cy = (W_img - 1) / 2.0, (H_img - 1) / 2.0
    tx_n, ty_n = -(-W_img // TS), -(-H_img // TS)

    splats = []
    for i in range(n):
        t = Wv @ (means[i] - cpos)
        if t[2] <= NEAR:
            continue
        z = t[2]
        txz = np.clip(t[0] / z, -1.3 * tanx, 1.3 * tanx) * z
        tyz = np.clip(t[1] / z, -1.3 * tany, 1.3 * tany) * z
        J = np.array(
            [[fx / z, 0, -fx * txz / (z * z)],
             [0, fy / z, -fy * tyz / (z * z)]]
        )
        R = _quat_rot(quats[i])
        Sigma = R @ np.diag(scales[i] ** 2) @ R.T
        T = J @ Wv
        cov = T @ Sigma @ T.T
        cov[0, 0] += LOWPASS
        cov[1, 1] += LOWPASS
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] ** 2
        if det <= 0:
            continue
        conic = np.array([cov[1, 1], -cov[0, 1], cov[0, 0]]) / det
        mid = 0.5 * (cov[0, 0] + cov[1, 1])
        lam1 = mid + math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3.0 * math.sqrt(lam1))
        mx = fx * t[0] / z + cx
        my = fy * t[1] / z + cy
        if (mx + radius < 0 or mx - radius >= W_img
                or my + radius < 0 or my - radius >= H_img):
            continue
        if opac[i] < ALPHA_MIN:
            continue
        d = means[i] - cpos
        rgb = _sh_color(shs[i], d / np.linalg.norm(d))
        x0 = min(tx_n, max(0, int((mx - radius) / TS)))
        y0 = min(ty_n, max(0, int((my - radius) / TS)))
        x1 = min(tx_n, max(0, int((mx + radius + TS - 1) / TS)))
        y1 = min(ty_n, max(0, int((my + radius + TS - 1) / TS)))
        splats.append((z, i, mx, my, conic, opac[i], rgb, (x0, x1, y0, y1)))

    splats.sort(key=lambda s: (s[0], s[1]))  # depth, stable by index

    img = np.zeros((H_img, W_img, 3))
    for py in range(H_img):
        for px in range(W_img):
            tx, ty = px // TS, py // TS
            T_run = 1.0
            for z, i, mx, my, conic, op, rgb, (x0, x1, y0, y1) in splats:
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx, dy = px - mx, py - my
                power = (-0.5 * (conic[0] * dx * dx + conic[2] * dy * dy)
                         - conic[1] * dx * dy)
                if power > 0:
                    continue
                alpha = min(ALPHA_CLAMP, op * math.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                T_next = T_run * (1.0 - alpha)
                if T_next < EPS_T:
                    break  # sticky termination, splat excluded
                img[py, px] += T_run * alpha * rgb
                T_run = T_next
    return img


def _cam(w=48, h=32, fx=60.0, fy=60.0):
    q = np.array([0.995, 0.03, -0.04, 0.02])
    return Camera.create(
        position=(0.06, -0.05, -0.02), quat=tuple(q / np.linalg.norm(q)),
        fx=fx, fy=fy, width=w, height=h,
    )


def _scene(rng, n=12, sh_degree=0, spread=0.5, z=(3.0, 6.0), scale=(0.05, 0.2),
           opac=(0.3, 0.9)):
    means = np.stack(
        [rng.uniform(-spread, spread, n), rng.uniform(-spread, spread, n),
         rng.uniform(*z, n)], axis=-1)
    scales = rng.uniform(*scale, (n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    k = {0: 1, 1: 4, 2: 9, 3: 16}[sh_degree]
    sh = rng.normal(size=(n, k, 3)) * 0.25
    sh[:, 0] = rng.uniform(-0.4, 1.2, (n, 3))
    return Gaussians.from_activated(
        means=means, scales=scales, quats=quats,
        opacities=rng.uniform(*opac, n), sh=sh)


def _cases(rng):
    import dataclasses

    cases = {}
    cases["generic"] = _scene(rng, n=12)
    cases["sh_degree3"] = _scene(rng, n=10, sh_degree=3)
    g = _scene(rng, n=8)
    ls = np.array(g.log_scales)
    ls[:, 0] += 1.4  # strongly anisotropic, rotated by the random quats
    cases["anisotropic"] = dataclasses.replace(
        g, log_scales=np.asarray(ls, np.float32))
    cases["termination"] = _scene(
        rng, n=16, spread=0.1, opac=(0.93, 0.99), scale=(0.15, 0.3))
    cases["edge_of_image"] = _scene(rng, n=10, spread=1.4)
    g = _scene(rng, n=6)
    ls = np.array(g.log_scales)
    ls[0] = np.log(1.5)  # whole-image footprint
    cases["fat_whole_image"] = dataclasses.replace(
        g, log_scales=np.asarray(ls, np.float32))
    cases["alpha_clamp"] = _scene(
        rng, n=6, opac=(0.995, 0.999), scale=(0.2, 0.3))
    g = _scene(rng, n=8)
    ol = np.array(g.opacity_logits)
    ol[::2] = -7.0  # below the 1/255 floor → excluded entirely
    cases["alpha_floor"] = dataclasses.replace(
        g, opacity_logits=np.asarray(ol, np.float32))
    g = _scene(rng, n=8)
    m = np.array(g.means)
    m[::3, 2] = -1.0  # behind the camera → culled
    cases["behind_camera"] = dataclasses.replace(
        g, means=np.asarray(m, np.float32))
    return cases


BACKENDS = {
    "oracle": RenderConfig(backend="oracle"),
    "xla": RenderConfig(backend="xla", tile_list_cap=512, chunk=32,
                        tile_span=9),
    "pallas": RenderConfig(backend="pallas", chunk=32, tile_span=9),
    "stream": RenderConfig(
        backend="stream", chunk=32, stream_band_cap=4096,
        stream_block_tiles=3, stream_dma_chunk=256,
        fat_max_blocks=64, fat_cap=512),
}


@pytest.fixture(scope="module")
def goldens():
    rng = np.random.default_rng(7)
    cam = _cam()
    cases = _cases(rng)
    return cam, {k: (g, golden_render(g, cam)) for k, (g) in
                 ((k, v) for k, v in cases.items())}


@pytest.mark.parametrize("backend", list(BACKENDS))
def test_backends_match_golden(goldens, backend):
    cam, cases = goldens
    cfg = BACKENDS[backend]
    for name, (g, gold) in cases.items():
        img = np.asarray(render(g, cam, cfg), np.float64)
        d = np.abs(img - gold)
        if backend == "oracle":
            # exact exp, f32 vs f64: tight
            assert d.max() < 1e-4, (name, d.max())
        else:
            # fexp ~1e-4 relative + bf16 attribute split can flip
            # alpha_min/termination inclusion on isolated pixels
            assert np.percentile(d, 99.5) < 1e-3, (name, np.percentile(d, 99.5))
            assert d.max() < 2e-2, (name, d.max())


def test_golden_is_nontrivial(goldens):
    _, cases = goldens
    for name, (_, gold) in cases.items():
        assert gold.max() > 0.05, name
