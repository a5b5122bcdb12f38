"""SLAM spatial index: native KD-tree + visibility-aware quadrant search.

Parity target: reference `must3r/slam/nns.py` (scipy KDTree rebuilt on every
keyframe insert, 1-NN distance queries) and the `QuandrantSearcher` that
splits ray directions into 2N^2 spherical quadrants with one tree each
(visibility-aware overlap).

The tree itself is the first-party C++ KD-tree in must3r_tpu/native
(ctypes); scipy remains as a fallback when no toolchain is available.
"""

from __future__ import annotations

import numpy as np

from must3r_tpu.native import load_library
from must3r_tpu.slam.tools import get_quadrant_id


class KDTree3:
    """Incremental 3D 1-NN index (rebuild-on-add, like the reference)."""

    def __init__(self, prefer_native: bool = True):
        self._lib = load_library() if prefer_native else None
        self._handle = None
        self._scipy_tree = None
        self.points = np.zeros((0, 3), np.float32)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __len__(self):
        return self.points.shape[0]

    def add_pts(self, pts, **kw):
        pts = np.ascontiguousarray(np.asarray(pts, np.float32).reshape(-1, 3))
        self.points = np.concatenate([self.points, pts]) \
            if len(self.points) else pts
        self._rebuild()

    def _rebuild(self):
        if self._lib is not None:
            if self._handle is not None:
                self._lib.kd3_destroy(self._handle)
            buf = np.ascontiguousarray(self.points)
            self._handle = self._lib.kd3_create(
                buf.ctypes.data, buf.shape[0])
            self._buf_keepalive = buf
        else:
            from scipy.spatial import KDTree
            self._scipy_tree = KDTree(self.points)

    def query(self, pts, **kw) -> np.ndarray:
        """1-NN Euclidean distance per query point; inf if empty."""
        q = np.ascontiguousarray(np.asarray(pts, np.float32).reshape(-1, 3))
        if len(self.points) == 0:
            return np.full(q.shape[0], np.inf, np.float32)
        if self._lib is not None:
            out = np.empty(q.shape[0], np.float32)
            self._lib.kd3_query(self._handle, q.ctypes.data, q.shape[0],
                                out.ctypes.data)
            return np.sqrt(out)
        d, _ = self._scipy_tree.query(q, k=1)
        return d.astype(np.float32)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and \
                getattr(self, "_handle", None) is not None:
            try:
                self._lib.kd3_destroy(self._handle)
            except Exception:
                pass

    # pickling for memory save/load: keep points, rebuild on restore
    def __getstate__(self):
        return {"points": self.points}

    def __setstate__(self, state):
        self.__init__()
        self.points = state["points"]
        if len(self.points):
            self._rebuild()


class QuadrantSearcher:
    """One KD-tree per spherical quadrant of the camera->point ray direction
    (reference nns.py:65-92). Queries in never-seen quadrants return inf."""

    def __init__(self, divider: int = 2, prefer_native: bool = True):
        self.divider = divider
        self.trees = [KDTree3(prefer_native)
                      for _ in range(2 * divider * divider)]

    def __len__(self):
        return sum(len(t) for t in self.trees)

    def add_pts(self, pts, cam_center, **kw):
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        cam = np.asarray(cam_center, np.float32).reshape(1, 3)
        qid = get_quadrant_id(pts - cam, self.divider)
        for quad in np.unique(qid):
            self.trees[quad].add_pts(pts[qid == quad])

    def query(self, pts, cam_center, **kw) -> np.ndarray:
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        cam = np.asarray(cam_center, np.float32).reshape(1, 3)
        qid = get_quadrant_id(pts - cam, self.divider)
        out = np.zeros(pts.shape[0], np.float32)
        for quad in np.unique(qid):
            m = qid == quad
            out[m] = self.trees[quad].query(pts[m])
        return out


def get_searcher(method: str, prefer_native: bool = True):
    """Reference spec strings: 'kdtree-scipy', 'kdtree-scipy-quadrant_x2',
    'none'. The 'scipy' token is kept for CLI compatibility; the backing
    tree is the native C++ one when available."""
    if method == "none":
        return None
    if "quadrant_x" in method:
        divider = int(method.split("quadrant_x")[-1].split("-")[0])
        return QuadrantSearcher(divider, prefer_native)
    if "kdtree" in method:
        return KDTree3(prefer_native)
    raise ValueError(f"unknown searcher {method!r}")
