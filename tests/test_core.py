"""Unit tests: Gaussians pytree, quaternion math, camera matrices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsjax import Camera, Gaussians
from gsjax.core.gaussians import quat_to_rotmat, rotmat_to_quat


def test_quat_roundtrip(rng):
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1  # canonical hemisphere
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # rotation matrices are orthonormal with det 1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    q2 = rotmat_to_quat(R)
    q2[q2[:, 0] < 0] *= -1
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_rotates_vector():
    # 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45); x̂ → ŷ
    s = np.sqrt(0.5)
    R = np.asarray(quat_to_rotmat(jnp.array([s, 0.0, 0.0, s])))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_covariance_matches_definition(rng):
    g = _simple_gaussians(rng, 16)
    cov = np.asarray(g.covariances())
    R = np.asarray(g.rotation_matrices())
    S = np.asarray(g.scales)
    for i in range(16):
        M = R[i] @ np.diag(S[i])
        np.testing.assert_allclose(cov[i], M @ M.T, rtol=1e-5, atol=1e-7)
    # symmetric PSD
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-7)


def _simple_gaussians(rng, n):
    q = rng.normal(size=(n, 4))
    return Gaussians.from_activated(
        means=rng.normal(size=(n, 3)),
        scales=rng.uniform(0.05, 0.5, (n, 3)),
        quats=q / np.linalg.norm(q, axis=-1, keepdims=True),
        opacities=rng.uniform(0.1, 0.9, n),
        rgb=rng.uniform(0, 1, (n, 3)),
    )


def test_gaussians_pytree_ops(rng):
    g = _simple_gaussians(rng, 10)
    leaves = jax.tree.leaves(g)
    assert len(leaves) == 5
    g2 = g.pad_to(16)
    assert g2.n == 16
    assert np.all(np.asarray(g2.opacities)[10:] < 1e-6)
    g3 = g.with_sh_degree(2)
    assert g3.sh.shape == (10, 9, 3)
    np.testing.assert_allclose(g3.sh[:, 0], g.sh[:, 0])
    assert np.all(np.asarray(g3.sh[:, 1:]) == 0)
    g4 = g.concat(g3)
    assert g4.n == 20 and g4.sh.shape[1] == 9


def test_camera_view_matrix_inverts_pose():
    cam = Camera.create(position=(1.0, 2.0, 3.0), quat=(0.9, 0.1, 0.3, -0.2))
    V = np.asarray(cam.view_matrix())
    # camera center maps to origin
    np.testing.assert_allclose(V @ np.array([1, 2, 3, 1.0]), [0, 0, 0, 1], atol=1e-5)
    # view is rigid: R orthonormal
    np.testing.assert_allclose(V[:3, :3] @ V[:3, :3].T, np.eye(3), atol=1e-5)


def test_camera_projection_center_and_sign():
    cam = Camera.create(fx=100.0, fy=100.0, width=64, height=48)
    P = np.asarray(cam.proj_matrix())
    # a point on the optical axis projects to NDC (0, 0)
    clip = P @ np.array([0, 0, 5, 1.0])
    assert clip[3] == pytest.approx(5.0)  # w = +z_view
    assert clip[0] == pytest.approx(0.0) and clip[1] == pytest.approx(0.0)
    # +x in view space → +x NDC; +y view → -y NDC (y-down convention)
    clip = P @ np.array([1, 1, 5, 1.0])
    assert clip[0] > 0 and clip[1] < 0


def test_look_at_points_camera_at_target():
    for pos, tgt in [
        ((0, 0, -5), (0, 0, 0)),
        ((0, 0, 11.5), (0, 0, 5.5)),  # looking down -z (regression: was an
        # improper det=-1 basis that collapsed to identity via the quat)
        ((3, 2, -4), (0.5, -1, 2)),
    ]:
        cam = Camera.look_at(pos, tgt, fx=100, fy=100, width=64, height=48)
        R = np.asarray(cam.rotation_c2w())
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
        V = np.asarray(cam.view_matrix())
        p = V @ np.array([*tgt, 1.0])
        np.testing.assert_allclose(p[:2], 0, atol=1e-5)
        assert p[2] == pytest.approx(np.linalg.norm(np.subtract(tgt, pos)), abs=1e-5)
        # world-up projects to "up" in the image (negative y_cam)
        upw = V[:3, :3] @ np.array([0, 1, 0.0])
        assert upw[1] <= 1e-6


def test_orbit_trajectory_moves_camera():
    from gsjax import OrbitCamera

    frames = OrbitCamera(radius=6.0, target=(0, 0, 5.5)).trajectory(
        4, alpha_end=0.6, fx=100, fy=100
    )
    p0 = np.asarray(frames[0].position)
    p3 = np.asarray(frames[3].position)
    assert np.linalg.norm(p0 - p3) > 1.0
    for f in frames:
        # every frame still looks at the target
        V = np.asarray(f.view_matrix())
        p = V @ np.array([0, 0, 5.5, 1.0])
        np.testing.assert_allclose(p[:2], 0, atol=1e-5)
