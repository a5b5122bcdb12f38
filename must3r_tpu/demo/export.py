"""Scene export: confidence-thresholded pointcloud to PLY / GLB.

Parity target: reference `must3r/demo/gradio.py:75-156`
(`get_3D_model_from_scene`): gather per-view points above a confidence
threshold, color from the source images, add camera frusta, export. The
reference leans on trimesh; the GLB here is written directly (glTF 2.0 is a
JSON header + one binary buffer -- POINTS primitive for the cloud, LINES
primitives for frusta), so the export is dependency-free.
"""

from __future__ import annotations

import json
import struct
from typing import List, Optional, Tuple

import numpy as np

from must3r_tpu.tools.ply import save_ply

CAM_COLORS = np.asarray([
    (255, 59, 59), (255, 153, 51), (255, 230, 0), (130, 214, 22),
    (40, 180, 99), (23, 190, 207), (42, 125, 209), (103, 82, 219),
    (200, 80, 175), (140, 86, 75)], np.uint8)


def gather_scene_points(scene, conf_thr: float = 3.0,
                        max_points: Optional[int] = None,
                        seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(points [N, 3], colors [N, 3] uint8) above the confidence threshold.

    Re-thresholding is pure host work on the SceneState -- no re-inference
    (reference gradio.py:132-156)."""
    pts_all, col_all = [], []
    # len() not .shape[0]: mixed-AR scenes hold per-view lists (ragged)
    for i in range(len(scene.pts3d)):
        msk = scene.conf[i] > conf_thr
        if not msk.any():
            continue
        pts_all.append(scene.pts3d[i][msk])
        col_all.append(scene.imgs[i][msk])
    if not pts_all:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
    pts = np.concatenate(pts_all).astype(np.float32)
    cols = np.concatenate(col_all).astype(np.uint8)
    if max_points is not None and len(pts) > max_points:
        sel = np.random.default_rng(seed).choice(len(pts), max_points,
                                                 replace=False)
        pts, cols = pts[sel], cols[sel]
    return pts, cols


def camera_frustum_lines(c2w: np.ndarray, focal: float, hw,
                         scale: float = 0.1) -> np.ndarray:
    """[8*2, 3] line-segment endpoints of a camera frustum in world space."""
    h, w = hw
    z = scale
    x = w / (2 * max(focal, 1e-6)) * z
    y = h / (2 * max(focal, 1e-6)) * z
    corners = np.asarray([[-x, -y, z], [x, -y, z], [x, y, z], [-x, y, z]])
    apex = np.zeros(3)
    segs = []
    for i in range(4):
        segs += [apex, corners[i]]                       # apex -> corner
        segs += [corners[i], corners[(i + 1) % 4]]       # rim
    segs = np.asarray(segs, np.float32)
    r, t = c2w[:3, :3], c2w[:3, 3]
    return segs @ r.T + t


def auto_cam_size(pts: np.ndarray) -> float:
    if len(pts) == 0:
        return 0.1
    return float(0.05 * np.linalg.norm(pts.max(0) - pts.min(0)))


def scene_to_ply(scene, path: str, conf_thr: float = 3.0,
                 max_points: Optional[int] = None):
    pts, cols = gather_scene_points(scene, conf_thr, max_points)
    save_ply(path, pts, cols)
    return path


# ---------------------------------------------------------------------------
# Minimal GLB writer
# ---------------------------------------------------------------------------

def _pad4(b: bytes, fill: bytes = b"\x00") -> bytes:
    return b + fill * (-len(b) % 4)


def write_glb(path: str, point_sets, line_sets):
    """Write a glTF 2.0 binary file.

    point_sets: list of (positions [N, 3] f32, colors [N, 3] uint8 | None)
    line_sets: list of (segments [M*2, 3] f32, rgb tuple)
    """
    bin_parts: List[bytes] = []
    buffer_views = []
    accessors = []
    meshes = []
    nodes = []
    offset = 0

    def add_blob(arr: np.ndarray, target: int):
        nonlocal offset
        raw = _pad4(np.ascontiguousarray(arr).tobytes())
        bin_parts.append(raw)
        buffer_views.append({"buffer": 0, "byteOffset": offset,
                             "byteLength": len(raw), "target": target})
        offset += len(raw)
        return len(buffer_views) - 1

    def add_accessor(bv, count, ctype, atype, arr=None, normalized=False):
        acc = {"bufferView": bv, "componentType": ctype, "count": count,
               "type": atype}
        if normalized:
            acc["normalized"] = True
        if arr is not None and atype == "VEC3" and ctype == 5126:
            acc["min"] = [float(v) for v in arr.min(0)]
            acc["max"] = [float(v) for v in arr.max(0)]
        accessors.append(acc)
        return len(accessors) - 1

    for pts, cols in point_sets:
        if len(pts) == 0:
            continue
        pts = np.ascontiguousarray(pts, np.float32)
        bv_p = add_blob(pts, 34962)
        acc_p = add_accessor(bv_p, len(pts), 5126, "VEC3", pts)
        attrs = {"POSITION": acc_p}
        if cols is not None:
            cols4 = np.ascontiguousarray(cols, np.uint8)
            bv_c = add_blob(cols4, 34962)
            attrs["COLOR_0"] = add_accessor(bv_c, len(cols4), 5121, "VEC3",
                                            normalized=True)
        meshes.append({"primitives": [{"attributes": attrs, "mode": 0}]})
        nodes.append({"mesh": len(meshes) - 1})

    for segs, rgb in line_sets:
        if len(segs) == 0:
            continue
        segs = np.ascontiguousarray(segs, np.float32)
        bv = add_blob(segs, 34962)
        acc = add_accessor(bv, len(segs), 5126, "VEC3", segs)
        cols = np.tile(np.asarray(rgb, np.uint8), (len(segs), 1))
        bv_c = add_blob(cols, 34962)
        acc_c = add_accessor(bv_c, len(cols), 5121, "VEC3", normalized=True)
        meshes.append({"primitives": [{
            "attributes": {"POSITION": acc, "COLOR_0": acc_c}, "mode": 1}]})
        nodes.append({"mesh": len(meshes) - 1})

    gltf = {
        "asset": {"version": "2.0", "generator": "must3r_tpu"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": meshes,
        "buffers": [{"byteLength": offset}],
        "bufferViews": buffer_views,
        "accessors": accessors,
    }
    json_blob = _pad4(json.dumps(gltf, separators=(",", ":")
                                 ).encode("utf-8"), b" ")
    bin_blob = _pad4(b"".join(bin_parts))
    total = 12 + 8 + len(json_blob) + 8 + len(bin_blob)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_blob), 0x4E4F534A))
        f.write(json_blob)
        f.write(struct.pack("<II", len(bin_blob), 0x004E4942))
        f.write(bin_blob)
    return path


def scene_to_glb(scene, path: str, conf_thr: float = 3.0,
                 max_points: Optional[int] = None,
                 cam_size: Optional[float] = None,
                 transparent_cams: bool = False):
    """Pointcloud + camera frusta GLB (reference gradio.py:75-128)."""
    pts, cols = gather_scene_points(scene, conf_thr, max_points)
    cam_size = cam_size if cam_size is not None else auto_cam_size(pts)
    lines = []
    if not transparent_cams:
        for i in range(scene.cams2world.shape[0]):
            segs = camera_frustum_lines(
                scene.cams2world[i], float(scene.focals[i]),
                scene.true_shape[i], scale=cam_size)
            lines.append((segs, CAM_COLORS[i % len(CAM_COLORS)]))
    return write_glb(path, [(pts, cols)], lines)
