"""COLMAP-style camera JSON import/export.

Capability parity with the reference Camera JSON path
(/root/reference/src/cameras/Camera.ts:95-181): `setFromData`/`fromData`
accept {position, rotation, fx, fy, width, height} where position is
{x,y,z} or a flat [3] list and rotation is {x,y,z,w} or a 3×3 nested
matrix (COLMAP convention); `dumpSettings` emits the same shape (plus the
id/img_name fields graphdeco's cameras.json carries).
"""

from __future__ import annotations

import json

import numpy as np

from gsjax.core.camera import Camera
from gsjax.core.gaussians import rotmat_to_quat


def camera_from_json(data, near: float = 0.01, far: float = 1000.0) -> Camera:
    """Build a Camera from a parsed JSON dict (or a JSON string)."""
    if isinstance(data, (str, bytes)):
        data = json.loads(data)

    pos = data["position"]
    if isinstance(pos, dict):
        position = np.array([pos["x"], pos["y"], pos["z"]], np.float32)
    else:
        position = np.asarray(pos, np.float32).reshape(3)

    rot = data["rotation"]
    if isinstance(rot, dict):
        # reference stores quaternions as {x, y, z, w} (Camera.ts:96-97)
        quat = np.array([rot["w"], rot["x"], rot["y"], rot["z"]], np.float32)
    else:
        R = np.asarray(rot, np.float32).reshape(3, 3)
        quat = rotmat_to_quat(R)

    return Camera.create(
        position=position,
        quat=quat,
        fx=float(data["fx"]),
        fy=float(data["fy"]),
        width=int(data.get("width", 800)),
        height=int(data.get("height", 600)),
        near=near,
        far=far,
    )


def cameras_from_json(data) -> list:
    """Parse a graphdeco cameras.json (list of camera dicts)."""
    if isinstance(data, (str, bytes)):
        data = json.loads(data)
    return [camera_from_json(d) for d in data]


def camera_to_json(cam: Camera, id: int = 0, img_name: str = "NONE") -> dict:
    """≙ Camera.dumpSettings (Camera.ts:162-181)."""
    q = np.asarray(cam.quat, np.float32)
    p = np.asarray(cam.position, np.float32)
    return {
        "id": id,
        "img_name": img_name,
        "width": cam.width,
        "height": cam.height,
        "position": {"x": float(p[0]), "y": float(p[1]), "z": float(p[2])},
        "rotation": {
            "x": float(q[1]),
            "y": float(q[2]),
            "z": float(q[3]),
            "w": float(q[0]),
        },
        "fy": float(cam.fy),
        "fx": float(cam.fx),
    }
