"""Camera JSON import/export round-trips (≙ Camera.ts:95-181)."""

import json

import numpy as np
import pytest

from gsjax import Camera
from gsjax.camera.json_io import camera_from_json, camera_to_json, cameras_from_json


def test_roundtrip_quat_form():
    cam = Camera.create(position=(1, 2, 3), quat=(0.9, 0.1, 0.3, -0.2), fx=700, fy=710,
                        width=640, height=480)
    d = camera_to_json(cam, id=7, img_name="r_0")
    cam2 = camera_from_json(json.dumps(d))
    np.testing.assert_allclose(np.asarray(cam2.position), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam2.quat), np.asarray(cam.quat), atol=1e-6)
    assert (cam2.fx, cam2.fy, cam2.width, cam2.height) == (700.0, 710.0, 640, 480)
    assert d["id"] == 7 and d["img_name"] == "r_0"


def test_matrix_rotation_and_flat_position():
    """COLMAP form: rotation as 3×3 nested list, position as flat [3]."""
    cam = Camera.create(quat=(0.8, 0.2, -0.4, 0.4))
    R = np.asarray(cam.rotation_c2w())
    d = {
        "position": [0.5, -1.0, 2.0],
        "rotation": R.tolist(),
        "fx": 1000,
        "fy": 1000,
        "width": 100,
        "height": 80,
    }
    cam2 = camera_from_json(d)
    np.testing.assert_allclose(np.asarray(cam2.rotation_c2w()), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam2.position), [0.5, -1.0, 2.0], atol=1e-6)
    # view matrices agree
    V1 = np.asarray(Camera.create(position=(0.5, -1, 2), quat=cam.quat).view_matrix())
    V2 = np.asarray(cam2.view_matrix())
    np.testing.assert_allclose(V2, V1, atol=1e-5)


def test_cameras_json_list():
    cams = cameras_from_json(
        json.dumps(
            [
                camera_to_json(Camera.create(position=(i, 0, 0)))
                for i in range(3)
            ]
        )
    )
    assert len(cams) == 3
    assert float(cams[2].position[0]) == 2.0
