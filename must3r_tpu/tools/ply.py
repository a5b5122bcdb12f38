"""Binary PLY pointcloud I/O with zero dependencies.

Parity target: reference `must3r/tools/ply_io.py` (which wraps the external
`plyfile` package -- not available here, so the little-endian binary format
is written/parsed directly with numpy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_PLY_TYPES = {
    "float": ("f4", "float"), "float32": ("f4", "float"),
    "double": ("f8", "double"), "uchar": ("u1", "uchar"),
    "uint8": ("u1", "uchar"), "int": ("i4", "int"), "int32": ("i4", "int"),
    "uint": ("u4", "uint"), "short": ("i2", "short"),
    "ushort": ("u2", "ushort"), "char": ("i1", "char"),
}


def save_ply(path: str, points: np.ndarray,
             colors: Optional[np.ndarray] = None,
             normals: Optional[np.ndarray] = None) -> None:
    """Write points [N, 3] float (+ optional uint8 colors [N, 3], float
    normals [N, 3]) as binary little-endian PLY."""
    pts = np.ascontiguousarray(points, dtype="<f4")
    n = pts.shape[0]
    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if normals is not None:
        fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
        header += ["property float nx", "property float ny",
                   "property float nz"]
    if colors is not None:
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")

    rec = np.empty(n, dtype=fields)
    rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    if normals is not None:
        nm = np.ascontiguousarray(normals, dtype="<f4")
        rec["nx"], rec["ny"], rec["nz"] = nm[:, 0], nm[:, 1], nm[:, 2]
    if colors is not None:
        col = np.ascontiguousarray(colors)
        if col.dtype != np.uint8:
            col = np.clip(col * 255.0 if col.max() <= 1.0 else col,
                          0, 255).astype(np.uint8)
        rec["red"], rec["green"], rec["blue"] = col[:, 0], col[:, 1], col[:, 2]

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())


def load_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read a binary or ascii PLY written by save_ply (or compatible).

    Returns (points [N, 3] float32, colors [N, 3] uint8 or None)."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", f"not a PLY file: {path}"
        fmt = None
        n = 0
        props = []
        while True:
            line = f.readline().strip().decode("ascii")
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                if parts[1] == "vertex":
                    n = int(parts[2])
                    in_vertex = True
                else:
                    in_vertex = False
            elif parts[0] == "property" and parts[1] != "list" and in_vertex:
                props.append((parts[2], parts[1]))

        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n)
            names = [p[0] for p in props]
            rec = {nm: data[:, i] for i, nm in enumerate(names)}
        else:
            assert fmt == "binary_little_endian", fmt
            dt = np.dtype([(nm, "<" + _PLY_TYPES[t][0]) for nm, t in props])
            rec = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)

        pts = np.stack([np.asarray(rec["x"], np.float32),
                        np.asarray(rec["y"], np.float32),
                        np.asarray(rec["z"], np.float32)], axis=-1)
        names = {p[0] for p in props}
        colors = None
        if {"red", "green", "blue"} <= names:
            colors = np.stack([np.asarray(rec["red"]),
                               np.asarray(rec["green"]),
                               np.asarray(rec["blue"])],
                              axis=-1).astype(np.uint8)
        return pts, colors
