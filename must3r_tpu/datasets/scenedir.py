"""On-disk scene datasets (Co3d / ScanNet++-style).

Parity target: reference `must3r/datasets/co3d.py` (360-degree scene
tuples, background masking, invalid-view caching) and
`must3r/datasets/scannetpp.py` (pair-graph tuples, metric scale), both of
which subclass dust3r's preprocessed-dataset loaders.

Storage format (documented, dust3r-preprocess-compatible in spirit):

    root/<scene>/
        images/<frame>.jpg|png
        depths/<frame>.npy            float32 meters, <=0 where undefined
          (or depths/<frame>.png      uint16 millimeters)
        cameras.npz                   intrinsics [N,3,3], poses(c2w) [N,4,4],
                                      frames [N] (stem names),
                                      optional pairs [M,2] covisibility
        masks/<frame>.png             optional uint8 foreground mask

`SceneDirDataset` handles IO; `Co3d` samples 360-style tuples (random valid
views of one scene, optional background masking via masks/); `ScanNetpp`
grows tuples over the pair graph and is metric-scale.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import numpy as np

from must3r_tpu.datasets.base import MultiViewDataset, make_view
from must3r_tpu.datasets.tuple_maker import (
    fill_views,
    select_tuple_from_360_scene,
    select_tuple_from_pairs,
)
from must3r_tpu.tools.image import load_image


class SceneDirDataset(MultiViewDataset):
    def __init__(self, root: str, num_views: int = 4,
                 resolutions=((512, 384),), epoch_size: Optional[int] = None,
                 is_metric_scale: bool = False, mask_bg: bool = False,
                 depth_scale: float = 1e-3, **kw):
        self.root = root
        self.scenes = sorted(
            d for d in os.listdir(root)
            if os.path.isfile(os.path.join(root, d, "cameras.npz")))
        assert self.scenes, f"no scenes with cameras.npz under {root}"
        self.is_metric_scale = is_metric_scale
        self.mask_bg = mask_bg
        self.depth_scale = depth_scale
        super().__init__(num_views, resolutions,
                         epoch_size or 100 * len(self.scenes), **kw)

    @functools.lru_cache(maxsize=32)
    def _cameras(self, scene: str) -> Dict:
        data = np.load(os.path.join(self.root, scene, "cameras.npz"),
                       allow_pickle=True)
        out = {"intrinsics": data["intrinsics"].astype(np.float32),
               "poses": data["poses"].astype(np.float32),
               "frames": [str(f) for f in data["frames"]]}
        if "pairs" in data:
            out["pairs"] = data["pairs"].astype(int)
        return out

    def _frame_paths(self, scene: str, frame: str) -> Dict[str, str]:
        base = os.path.join(self.root, scene)
        img = None
        for ext in (".jpg", ".jpeg", ".png"):
            c = os.path.join(base, "images", frame + ext)
            if os.path.isfile(c):
                img = c
                break
        depth_npy = os.path.join(base, "depths", frame + ".npy")
        depth_png = os.path.join(base, "depths", frame + ".png")
        mask = os.path.join(base, "masks", frame + ".png")
        return {"img": img, "depth_npy": depth_npy, "depth_png": depth_png,
                "mask": mask}

    def _load_depth(self, paths: Dict[str, str]) -> Optional[np.ndarray]:
        if os.path.isfile(paths["depth_npy"]):
            return np.load(paths["depth_npy"]).astype(np.float32)
        if os.path.isfile(paths["depth_png"]):
            import cv2
            raw = cv2.imread(paths["depth_png"], cv2.IMREAD_UNCHANGED)
            d = raw.astype(np.float32) * self.depth_scale
            return np.where(raw == 0, -1.0, d)
        return None

    def _load_view(self, scene: str, vidx: int, resolution, rng) -> Optional[Dict]:
        cams = self._cameras(scene)
        frame = cams["frames"][vidx]
        paths = self._frame_paths(scene, frame)
        if paths["img"] is None:
            return None
        img = load_image(paths["img"])
        depth = self._load_depth(paths)
        if depth is None:
            return None
        if depth.shape != img.shape[:2]:
            return None
        if self.mask_bg and os.path.isfile(paths["mask"]):
            import cv2
            m = cv2.imread(paths["mask"], cv2.IMREAD_GRAYSCALE)
            depth = np.where(m > 127, depth, -1.0)
        return make_view(img, depth, cams["intrinsics"][vidx],
                         cams["poses"][vidx], resolution,
                         is_metric_scale=self.is_metric_scale,
                         label=scene, instance=frame,
                         transform=self.transform, rng=rng)


class Co3d(SceneDirDataset):
    """360-degree object scenes: tuples = random valid views of one scene,
    with optional background masking (reference co3d.py:15-86)."""

    def __init__(self, root: str, mask_bg: bool = True, **kw):
        super().__init__(root, mask_bg=mask_bg, is_metric_scale=False, **kw)
        self._invalid: Dict[Tuple[str, int], bool] = {}

    def _get_views(self, idx, resolution, memory_num_views, rng):
        scene = self.scenes[idx % len(self.scenes)]
        cams = self._cameras(scene)
        n = len(cams["frames"])
        cache: Dict[int, Dict] = {}

        def valid(i):
            return not self._invalid.get((scene, i), False)

        def getter(i, rng_):
            v = self._load_view(scene, i, resolution, rng_)
            if v is None or v["valid_mask"].mean() < 0.05:
                self._invalid[(scene, i)] = True
                return None
            cache[i] = v
            return v

        def check(v, i):
            return v is not None

        views = select_tuple_from_360_scene(valid, check, getter, n,
                                            self.num_views, rng,
                                            idx // len(self.scenes) % n)
        return fill_views([v for v in views if v is not None],
                          self.num_views)


class ScanNetpp(SceneDirDataset):
    """Indoor scans: tuples grown over the covisibility pair graph;
    depths are metric (reference scannetpp.py:15-57)."""

    def __init__(self, root: str, **kw):
        super().__init__(root, mask_bg=False, is_metric_scale=True, **kw)

    def _get_views(self, idx, resolution, memory_num_views, rng):
        scene = self.scenes[idx % len(self.scenes)]
        cams = self._cameras(scene)
        n = len(cams["frames"])
        pairs = cams.get("pairs")
        if pairs is None:
            # fall back to temporal adjacency
            pairs = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
        graph: Dict[int, set] = {i: set() for i in range(n)}
        for a, b in pairs:
            graph[int(a)].add(int(b))
            graph[int(b)].add(int(a))

        pair_id = (idx // len(self.scenes)) % max(len(pairs), 1)
        idx1, idx2 = (int(v) for v in pairs[pair_id])

        def getter(i, rng_):
            v = self._load_view(scene, i, resolution, rng_)
            assert v is not None, (scene, i)
            return v

        return select_tuple_from_pairs(lambda i: graph[i], getter,
                                       self.num_views, memory_num_views,
                                       rng, idx1, idx2)
