"""Readers for the dust3r-preprocessed dataset layouts the reference trains
on (reference must3r/datasets/co3d.py:15-86 over dust3r's Co3d, and
scannetpp.py:15-57 over dust3r's ScanNetpp).

On-disk formats (produced by dust3r's preprocess scripts):

Co3d  (ROOT = .../co3d_processed)
  ROOT/selected_seqs_<split>.json            {category: {instance: [ids]}}
  ROOT/<cat>/<inst>/images/frame%06d.jpg
  ROOT/<cat>/<inst>/images/frame%06d.npz     camera_pose [4,4],
                                             camera_intrinsics [3,3],
                                             maximum_depth scalar
  ROOT/<cat>/<inst>/depths/frame%06d.jpg.geometric.png   uint16;
                                             meters = u16/65535*max_depth
  ROOT/<cat>/<inst>/masks/frame%06d.png      fg mask (>25 = object)

ScanNet++  (ROOT = .../scannetpp_processed)
  ROOT/all_metadata.npz                      scenes, sceneids, images,
                                             intrinsics [N,3,3],
                                             trajectories [N,4,4],
                                             pairs [M,>=2]
  ROOT/<scene>/images/<basename>.jpg
  ROOT/<scene>/depth/<basename>.png          uint16 millimeters

Sampling semantics match the reference: Co3d draws 360-degree scene tuples
with optional background masking and an invalid-view cache
(co3d.py:62-86); ScanNet++ grows tuples over the covisibility pair graph
and is metric-scale (scannetpp.py:52-57). Geometric preprocessing uses our
deterministic bucket crop/resize (tools/image.py) rather than dust3r's
`_crop_resize_if_necessary` jittered crop — intrinsics are updated by the
same 3x3 pixel transform either way.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Optional

import numpy as np

from must3r_tpu.datasets.base import MultiViewDataset, make_view
from must3r_tpu.datasets.tuple_maker import (
    fill_views,
    select_tuple_from_360_scene,
    select_tuple_from_pairs,
)
from must3r_tpu.tools.image import load_image


def _read_depth_png(path: str) -> Optional[np.ndarray]:
    import cv2

    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    return None if d is None else d.astype(np.float32)


class Co3dPreprocessed(MultiViewDataset):
    """dust3r-preprocessed CO3Dv2 (reference co3d.py over dust3r Co3d)."""

    NUM_IMAGES_PER_OBJECT = 100   # reference co3d.py:19

    def __init__(self, root: str, split: str = "train",
                 mask_bg=True, num_views: int = 4,
                 resolutions=((512, 384),), epoch_size: Optional[int] = None,
                 **kw):
        self.root = root
        self.split = split
        self.mask_bg = mask_bg
        with open(osp.join(root, f"selected_seqs_{split}.json")) as f:
            selected = json.load(f)
        self.scene_list = []
        self.image_pools: Dict = {}
        for cat, instances in selected.items():
            for inst, ids in instances.items():
                if ids:
                    self.scene_list.append((cat, inst))
                    self.image_pools[(cat, inst)] = list(ids)
        assert self.scene_list, f"no scenes under {root} ({split})"
        n = len(self.scene_list) * self.NUM_IMAGES_PER_OBJECT
        super().__init__(num_views=num_views, resolutions=resolutions,
                         epoch_size=epoch_size or n, **kw)
        self._invalid: Dict = {}

    def _paths(self, cat, inst, view_idx):
        base = osp.join(self.root, cat, inst)
        return {
            "img": osp.join(base, "images", f"frame{view_idx:06d}.jpg"),
            "meta": osp.join(base, "images", f"frame{view_idx:06d}.npz"),
            "depth": osp.join(base, "depths",
                              f"frame{view_idx:06d}.jpg.geometric.png"),
            "mask": osp.join(base, "masks", f"frame{view_idx:06d}.png"),
        }

    def _load_view(self, cat, inst, view_idx, resolution, rng, mask_bg):
        p = self._paths(cat, inst, view_idx)
        if not osp.isfile(p["img"]) or not osp.isfile(p["meta"]):
            return None
        try:
            meta = np.load(p["meta"])
            pose = meta["camera_pose"].astype(np.float32)
            k = meta["camera_intrinsics"].astype(np.float32)
            img = load_image(p["img"])
        except (OSError, ValueError, KeyError):
            # unreadable image/metadata -> signal "skip view"; the caller's
            # invalid cache remembers (reference co3d.py:62-86 semantics)
            return None
        d16 = _read_depth_png(p["depth"])
        if d16 is None or d16.shape[:2] != img.shape[:2]:
            return None
        depth = d16 / 65535.0 * float(np.nan_to_num(meta["maximum_depth"]))
        if mask_bg:
            import cv2
            m = cv2.imread(p["mask"], cv2.IMREAD_GRAYSCALE)
            if m is not None:
                depth = depth * ((m.astype(np.float32) / 255.0) > 0.1)
        return make_view(img, depth, k, pose, resolution,
                         is_metric_scale=False,
                         label=osp.join(cat, inst),
                         instance=osp.basename(p["img"]),
                         transform=self.transform, rng=rng)

    def _get_views(self, idx, resolution, memory_num_views, rng):
        cat, inst = self.scene_list[idx % len(self.scene_list)]
        pool = self.image_pools[(cat, inst)]
        mask_bg = (self.mask_bg is True) or (
            self.mask_bg == "rand" and rng.choice(2))
        n = min(len(pool), self.NUM_IMAGES_PER_OBJECT)
        first = (idx // len(self.scene_list)) % max(n, 1)

        def valid(i):
            return i < len(pool) and not self._invalid.get((cat, inst, i))

        def getter(i, rng_):
            return self._load_view(cat, inst, pool[i], resolution, rng_,
                                   mask_bg)

        def check(v, i):
            ok = v is not None and (v["depthmap"] > 0).sum() > 0
            if not ok:
                self._invalid[(cat, inst, i)] = True
            return ok

        views = select_tuple_from_360_scene(valid, check, getter, n,
                                            self.num_views, rng, first)
        return fill_views([v for v in views if v is not None],
                          self.num_views)


class ScanNetppPreprocessed(MultiViewDataset):
    """dust3r-preprocessed ScanNet++ (reference scannetpp.py over dust3r
    ScanNetpp); metric depths, covisibility pair-graph tuples."""

    def __init__(self, root: str, num_views: int = 4,
                 resolutions=((512, 384),), epoch_size: Optional[int] = None,
                 **kw):
        self.root = root
        with np.load(osp.join(root, "all_metadata.npz"),
                     allow_pickle=True) as data:
            self.scenes = [str(s) for s in data["scenes"]]
            self.sceneids = data["sceneids"].astype(int)
            self.images = [str(s) for s in data["images"]]
            self.intrinsics = data["intrinsics"].astype(np.float32)
            self.trajectories = data["trajectories"].astype(np.float32)
            self.pairs = data["pairs"][:, :2].astype(int)
        super().__init__(num_views=num_views, resolutions=resolutions,
                         epoch_size=epoch_size or len(self.pairs), **kw)
        self.pairs_per_image: Dict[int, set] = {
            i: set() for i in range(len(self.images))}
        for a, b in self.pairs:
            self.pairs_per_image[int(a)].add(int(b))
            self.pairs_per_image[int(b)].add(int(a))

    def _load_view(self, view_idx, resolution, rng):
        scene = self.scenes[self.sceneids[view_idx]]
        base = osp.join(self.root, scene)
        name = self.images[view_idx]
        img = load_image(osp.join(base, "images", name + ".jpg"))
        d16 = _read_depth_png(osp.join(base, "depth", name + ".png"))
        assert d16 is not None, (scene, name)
        depth = d16 / 1000.0                      # millimeters -> meters
        depth[~np.isfinite(depth)] = 0.0
        return make_view(img, depth, self.intrinsics[view_idx],
                         self.trajectories[view_idx], resolution,
                         is_metric_scale=True,
                         label=f"{scene}_{name}", instance=str(view_idx),
                         transform=self.transform, rng=rng)

    def _get_views(self, idx, resolution, memory_num_views, rng):
        idx1, idx2 = (int(v) for v in self.pairs[idx % len(self.pairs)])

        def get_pairs(i):
            return self.pairs_per_image[i]

        def get_view(i, rng_):
            return self._load_view(i, resolution, rng_)

        views = select_tuple_from_pairs(get_pairs, get_view, self.num_views,
                                        memory_num_views, rng, idx1, idx2)
        return fill_views([v for v in views if v is not None],
                          self.num_views)
