"""SLAM web GUI over real HTTP (panels, pause, map) + CLI smoke.

Covers the reference Open3D SLAM GUI surface (slam/slam.py:246-564) as
served by slam/webgui.py.
"""

import json
import urllib.request

import numpy as np

from must3r_tpu.slam.webgui import SlamWebGUI

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _get(url, path):
    with urllib.request.urlopen(url.rstrip("/") + path, timeout=30) as r:
        return r.read()


def _post(url, path, body=b""):
    req = urllib.request.Request(url.rstrip("/") + path, data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def test_slam_webgui_roundtrip(rng):
    gui = SlamWebGUI(port=0, verbose=False)
    try:
        page = _get(gui.url, "/").decode()
        assert "follow cam" in page and "pauseb" in page

        # placeholder panel before the first publish
        assert _get(gui.url, "/panel/frame.png")[:8] == _PNG_MAGIC

        frame = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
        out = {"pts3d_local":
               rng.standard_normal((32, 48, 3)).astype(np.float32) + 2.0,
               "conf": (1.0 + rng.random((32, 48))).astype(np.float32)}
        gui.publish_frame(frame, out, stats="frame 0 | 5.0 fps")
        for name in ("frame", "depth", "conf"):
            assert _get(gui.url, f"/panel/{name}.png")[:8] == _PNG_MAGIC
        g = json.loads(_get(gui.url, "/gui"))
        assert g["panels_version"] == 1
        assert "frame 0" in g["stats"]

        # pause round-trip (browser button -> SLAM loop)
        assert not gui.paused
        _post(gui.url, "/gui", json.dumps({"paused": True}).encode())
        assert gui.paused
        _post(gui.url, "/gui", json.dumps({"paused": False}).encode())
        assert not gui.paused

        # map snapshot rides the LiveViewer plumbing
        gui.set_map(rng.standard_normal((64, 3)).astype(np.float32),
                    (rng.random((64, 3)) * 255).astype(np.uint8),
                    np.zeros((1, 3), np.float32))
        data = _get(gui.url, "/data.bin")
        import struct
        assert struct.unpack("<I", data[8:12])[0] == 64
    finally:
        gui.close()


def test_slam_webgui_panel_every(rng):
    gui = SlamWebGUI(port=0, verbose=False, panel_every=3)
    try:
        frame = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        for i in range(6):
            gui.publish_frame(frame, {}, stats=f"f{i}")
        g = json.loads(_get(gui.url, "/gui"))
        assert g["panels_version"] == 2          # frames 0 and 3
        assert g["stats"] == "f5"                # stats update every frame
    finally:
        gui.close()
