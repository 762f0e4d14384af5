"""Headless OrbitControls state machine vs the reference's update law
(/root/reference/src/controls/OrbitControls.ts — analytic assertions on
the damped α/β/radius/target dynamics, replayed from scripted events)."""

import numpy as np
import pytest

from gsjax.camera.controls import (
    KeyDown,
    KeyUp,
    MouseDown,
    MouseMove,
    MouseUp,
    OrbitParams,
    OrbitState,
    SetCameraTarget,
    TouchEnd,
    TouchMove,
    TouchStart,
    Wheel,
    apply_event,
    set_camera,
    to_camera,
    update,
)

P = OrbitParams()


def drag(state, x0, y0, x1, y1, button=0):
    state = apply_event(state, MouseDown(x0, y0, button))
    state = apply_event(state, MouseMove(x1, y1))
    return apply_event(state, MouseUp())


def test_orbit_drag_law():
    # dα = −dx·0.003, dβ = +dy·0.003 (OrbitControls.ts:163-165)
    s = OrbitState()
    s = drag(s, 100.0, 100.0, 150.0, 80.0)
    assert s.d_alpha == pytest.approx(0.5 - 50 * 0.003)
    assert s.d_beta == pytest.approx(0.5 - 20 * 0.003)


def test_beta_clamped_to_angle_limits():
    s = OrbitState()
    s = drag(s, 0.0, 0.0, 0.0, 1e5)
    assert s.d_beta == pytest.approx(np.pi / 2)  # maxAngle=90°
    s = drag(s, 0.0, 0.0, 0.0, -1e5)
    assert s.d_beta == pytest.approx(-np.pi / 2)


def test_damped_lerp_convergence():
    # x ← (1−d)·x + d·desired with d = 0.12 (:268-271)
    s = drag(OrbitState(), 0.0, 0.0, 100.0, 0.0)
    a0, da = s.alpha, s.d_alpha
    s = update(s)
    assert s.alpha == pytest.approx(0.88 * a0 + 0.12 * da)
    for _ in range(200):
        s = update(s)
    assert s.alpha == pytest.approx(da, abs=1e-6)
    assert s.beta == pytest.approx(s.d_beta, abs=1e-6)


def test_wheel_zoom_law_and_clamp():
    s = OrbitState()  # d_radius = 5
    zn = 0.1 + 0.9 * (5.0 - P.min_zoom) / (P.max_zoom - P.min_zoom)
    s = apply_event(s, Wheel(delta_y=100.0))
    assert s.d_radius == pytest.approx(5.0 + 100.0 * 0.025 * zn)
    s = apply_event(s, Wheel(delta_y=1e6))
    assert s.d_radius == pytest.approx(P.max_zoom)
    s = apply_event(s, Wheel(delta_y=-1e6))
    assert s.d_radius == pytest.approx(P.min_zoom)


def test_pose_law():
    # position = target + r·(sinα·cosβ, −sinβ, −cosα·cosβ) (:279-283)
    s = OrbitState(
        alpha=0.3, beta=0.2, radius=4.0, d_alpha=0.3, d_beta=0.2,
        d_radius=4.0, target=(1.0, 2.0, 3.0), d_target=(1.0, 2.0, 3.0),
    )
    s = update(s)
    a, b, r = s.alpha, s.beta, s.radius
    expect = np.array([1.0, 2.0, 3.0]) + r * np.array(
        [np.sin(a) * np.cos(b), -np.sin(b), -np.cos(a) * np.cos(b)]
    )
    np.testing.assert_allclose(np.asarray(s.position), expect, atol=1e-12)
    # rotation is orthonormal and its −z column looks away from target
    R = np.asarray(s.rotation)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    d = np.asarray(s.target) - np.asarray(s.position)
    np.testing.assert_allclose(
        -R[:, 2], -d / np.linalg.norm(d), atol=1e-12
    )


def test_pan_moves_target_along_camera_right_up():
    s = update(OrbitState())  # populate rotation
    R = np.asarray(s.rotation)
    t0 = np.asarray(s.d_target)
    s = apply_event(s, MouseDown(0.0, 0.0, button=2))
    s = apply_event(s, MouseMove(10.0, -4.0))
    zn = 0.1 + 0.9 * (s.d_radius - P.min_zoom) / (P.max_zoom - P.min_zoom)
    expect = t0 + R[:, 0] * (-10.0 * 0.01 * zn) + R[:, 1] * (4.0 * 0.01 * zn)
    np.testing.assert_allclose(np.asarray(s.d_target), expect, atol=1e-12)


def test_touch_orbit_and_pinch():
    s = update(OrbitState())
    s = apply_event(s, TouchStart(((10.0, 10.0),)))
    s = apply_event(s, TouchMove(((30.0, 10.0),)))
    assert s.d_alpha == pytest.approx(0.5 - 20 * 0.003)
    s = apply_event(s, TouchEnd())
    assert not s.dragging
    # pinch: radius += (lastDist − dist)·0.1·zn (:225-230)
    s = apply_event(s, TouchStart(((0.0, 0.0), (100.0, 0.0))))
    r0 = s.d_radius
    zn = 0.1 + 0.9 * (r0 - P.min_zoom) / (P.max_zoom - P.min_zoom)
    s = apply_event(s, TouchMove(((0.0, 0.0), (60.0, 0.0))))
    assert s.d_radius == pytest.approx(r0 + (100.0 - 60.0) * 0.1 * zn)


def test_keyboard_moves_and_rotates():
    s = update(OrbitState())
    t0 = np.asarray(s.d_target)
    s = apply_event(s, KeyDown("KeyW"))
    s = update(s)
    _, _, fwd = (
        np.asarray(s.rotation)[:, 0],
        np.asarray(s.rotation)[:, 1],
        -np.asarray(s.rotation)[:, 2],
    )
    np.testing.assert_allclose(
        np.asarray(s.d_target), t0 - fwd * 0.025, atol=1e-12
    )
    s = apply_event(s, KeyUp("KeyW"))
    a0 = s.d_alpha
    s = apply_event(s, KeyDown("KeyE"))
    s = update(s)
    assert s.d_alpha == pytest.approx(a0 + 0.01)
    # arrows alias WASD (:112-118)
    s2 = apply_event(update(OrbitState()), KeyDown("ArrowUp"))
    assert "KeyW" in s2.keys


def test_static_cam_freezes_until_input():
    s = update(OrbitState())
    s = set_camera(s)
    frozen = update(apply_event(s, Wheel(50.0)))
    assert frozen.radius == s.radius  # staticCam gates update (:265)
    s3 = apply_event(s, KeyDown("KeyW"))  # key press unfreezes (:110)
    assert not s3.static_cam
    s4 = apply_event(apply_event(s, MouseDown(0, 0)), MouseMove(5.0, 0.0))
    assert not s4.static_cam  # nonzero drag unfreezes (:174-175)
    s5 = apply_event(apply_event(s, MouseDown(0, 0)), MouseMove(0.0, 0.0))
    assert s5.static_cam  # zero-delta move does not


def test_set_camera_target_inverts_pose():
    # setCameraTarget re-derives (radius, β, α) from target − position
    # (:95-103): converging afterwards keeps the position fixed-ish and
    # looks at the new target
    s = update(OrbitState(alpha=0.3, beta=0.1, d_alpha=0.3, d_beta=0.1))
    pos = np.asarray(s.position)
    new_t = (0.5, -0.2, 0.8)
    s = apply_event(s, SetCameraTarget(new_t))
    d = np.asarray(new_t) - pos
    assert s.d_radius == pytest.approx(np.linalg.norm(d))
    assert s.d_beta == pytest.approx(np.arctan2(d[1], np.hypot(d[0], d[2])))
    assert s.d_alpha == pytest.approx(-np.arctan2(d[0], d[2]))
    # converged pose reproduces the SAME camera position
    for _ in range(300):
        s = update(s)
    np.testing.assert_allclose(np.asarray(s.position), pos, atol=1e-4)


def test_event_stream_replay_deterministic_and_camera_export():
    events = [
        MouseDown(0, 0), MouseMove(40.0, 10.0), MouseUp(),
        Wheel(-120.0), KeyDown("KeyD"),
    ]

    def run():
        s = OrbitState()
        for e in events:
            s = apply_event(s, e)
            s = update(s)
        return s

    s1, s2 = run(), run()
    assert s1 == s2
    cam = to_camera(s1, width=64, height=64)
    # gsjax camera at the state position, looking at the orbit target
    np.testing.assert_allclose(
        np.asarray(cam.position), np.asarray(s1.position), atol=1e-6
    )
    fwd = np.asarray(cam.rotation_c2w())[:, 2]
    d = np.asarray(s1.target) - np.asarray(s1.position)
    np.testing.assert_allclose(fwd, d / np.linalg.norm(d), atol=1e-6)
