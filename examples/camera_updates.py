"""Camera pose/intrinsics updates between frames + COLMAP-style JSON
round-trip — the reference's camera-updates example
(examples/camera-updates/src/main.ts + Camera.setFromData/dumpSettings,
Camera.ts:95-181)."""

import json
import sys

from _common import load_or_demo, out_path

from gsjax import Camera, RenderConfig, camera_from_json, camera_to_json, render
from gsjax.utils.image import write_png


def main():
    g = load_or_demo(sys.argv)
    cfg = RenderConfig(backend="auto")

    cam = Camera.look_at(
        (0.0, -1.0, -1.0), (0.0, 0.0, 4.0), fx=500.0, fy=500.0,
        width=640, height=480,
    )
    write_png(out_path("camera_pose0.png"), render(g, cam, cfg))

    # dump → edit → reload (≙ camera.dumpSettings / setFromData)
    data = camera_to_json(cam)
    print("camera JSON:", json.dumps(data)[:120], "…")
    data["position"] = [1.5, -0.5, -0.5]
    cam2 = camera_from_json(data)
    write_png(out_path("camera_pose1.png"), render(g, cam2, cfg))

    with open(out_path("camera.json"), "w") as fh:
        json.dump([camera_to_json(cam), camera_to_json(cam2)], fh, indent=2)
    print(f"wrote two poses and {out_path('camera.json')}")


if __name__ == "__main__":
    main()
