"""Multi-view dataset base: view pipeline, sampler, dataset algebra.

Parity target: reference `must3r/datasets/base/must3r_base_dataset.py` (and
the dust3r bases it extends):
  * N-view tuples indexed by (sample, ar_idx, memory_num_views) so
    aspect-ratio and memory_num_views are constant within a batch.
  * Per-view pipeline: bucket crop/resize (intrinsics updated by the 3x3
    pixel transform), world pointmap from depth+intrinsics+pose,
    valid/sky masks, metric-scale flag, landscape transposition.
  * `BatchedRandomSampler`: per-batch (ar_idx, memory_num_views) draw,
    shard-aligned across data-parallel hosts.
  * Dataset algebra `+` (concat), `*` (repeat), `@` (resize epoch length).

Torch-free: everything is numpy on the host; the collated batches feed the
jitted train step directly.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from must3r_tpu.tools.image import (
    get_resize_function,
    normalize_image,
    resolve_transform,
)


def depthmap_to_world_points(depthmap: np.ndarray, intrinsics: np.ndarray,
                             c2w: Optional[np.ndarray] = None
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Depth [H, W] + K [3, 3] (+ optional c2w [4, 4]) -> (pts3d [H, W, 3],
    valid [H, W]) in world (or camera) coordinates. Parity with dust3r
    `depthmap_to_absolute_camera_coordinates`."""
    h, w = depthmap.shape
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    z = depthmap.astype(np.float32)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x, y, z], axis=-1)
    valid = z > 0.0
    if c2w is not None:
        pts = pts @ c2w[:3, :3].T + c2w[:3, 3]
    return pts.astype(np.float32), valid


def make_view(img: np.ndarray, depthmap: np.ndarray, intrinsics: np.ndarray,
              camera_pose: np.ndarray, resolution: Tuple[int, int],
              patch_size: int = 16, is_metric_scale: bool = False,
              label: str = "", instance: str = "",
              transform=None, rng: Optional[np.random.Generator] = None
              ) -> Dict:
    """Run one raw view through the full pipeline at a bucket resolution.

    Args:
      img: [H, W, 3] uint8 RGB.
      depthmap: [H, W] float (negative = sky / undefined).
      resolution: (long_side, short_side) landscape bucket target.
      transform: optional color augmentation `(uint8, rng) -> uint8`
        applied after the geometric resize, before ImgNorm (the reference
        trains with ColorJitter, README.md:242).
    Returns the view dict (landscape storage + 'portrait' flag).
    """
    h, w = img.shape[:2]
    long_side, short_side = max(resolution), min(resolution)
    target = {long_side / short_side: (long_side, short_side)}
    fn, to_rescaled, _ = get_resize_function(target, patch_size, h, w)
    img_r = fn(img)
    if transform is not None:
        img_r = transform(img_r, rng or np.random.default_rng())
    fn_n, _, _ = get_resize_function(target, patch_size, h, w, is_mask=True)
    depth_r = fn_n(depthmap)
    k_new = to_rescaled @ intrinsics

    pts3d, valid = depthmap_to_world_points(depth_r, k_new, camera_pose)
    sky = depth_r < 0.0
    valid = valid & np.isfinite(pts3d).all(axis=-1)
    pts3d = np.nan_to_num(pts3d)

    view = {
        "img": normalize_image(img_r),
        "depthmap": depth_r.astype(np.float32),
        "camera_intrinsics": k_new.astype(np.float32),
        "camera_pose": camera_pose.astype(np.float32),
        "pts3d": pts3d,
        "valid_mask": valid,
        "sky_mask": sky,
        "is_metric_scale": bool(is_metric_scale),
        "true_shape": np.int32(img_r.shape[:2]),
        "label": label,
        "instance": instance,
    }
    return transpose_view_to_landscape(view)


def transpose_view_to_landscape(view: Dict) -> Dict:
    """Store portrait views transposed; per-pixel arrays move together so
    predictions stay aligned (dust3r `transpose_to_landscape` semantics)."""
    h, w = view["img"].shape[:2]
    view["portrait"] = h > w
    if h > w:
        for key in ("img", "pts3d"):
            view[key] = np.swapaxes(view[key], 0, 1)
        for key in ("depthmap", "valid_mask", "sky_mask"):
            view[key] = view[key].T
    return view


class MultiViewDataset:
    """Base N-view tuple dataset.

    Subclasses implement `_get_views(idx, resolution, memory_num_views,
    rng) -> list of num_views view dicts` (using `make_view`)."""

    def __init__(self, num_views: int, resolutions, epoch_size: int,
                 min_memory_num_views: int = 2,
                 max_memory_num_views: Optional[int] = None,
                 seed: Optional[int] = None, transform=None):
        if isinstance(resolutions[0], int):
            resolutions = [resolutions]
        self._resolutions = [tuple(r) for r in resolutions]
        self.num_views = num_views
        self.epoch_size = epoch_size
        self.min_memory_num_views = min_memory_num_views
        self.max_memory_num_views = max_memory_num_views or num_views
        self.seed = seed
        # 'ColorJitter' (reference README.md:242) / None=ImgNorm / callable
        self.transform = resolve_transform(transform)

    def __len__(self):
        return self.epoch_size

    @property
    def num_resolutions(self) -> int:
        return len(self._resolutions)

    def _get_views(self, idx, resolution, memory_num_views, rng):
        raise NotImplementedError

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            idx, ar_idx, memory_num_views = idx
        else:
            ar_idx, memory_num_views = 0, self.num_views
        rng = np.random.default_rng(
            (self.seed or 0) + idx if self.seed is not None else None)
        views = self._get_views(idx, self._resolutions[ar_idx],
                                int(memory_num_views), rng)
        assert len(views) == self.num_views
        for v, view in enumerate(views):
            view["idx"] = (idx, ar_idx, v)
            view["memory_num_views"] = int(memory_num_views)
        return views

    # -- algebra (reference must3r_base_dataset.py:53-133) -------------------

    def __add__(self, other):
        return CatDataset([self, other])

    def __rmul__(self, factor):
        return MulDataset(factor, self)

    def __matmul__(self, size):
        return ResizedDataset(int(size), self)

    __rmatmul__ = __matmul__


class CatDataset(MultiViewDataset):
    def __init__(self, datasets: Sequence[MultiViewDataset]):
        flat = []
        for d in datasets:
            flat.extend(d.datasets if isinstance(d, CatDataset) else [d])
        self.datasets = flat
        d0 = flat[0]
        for d in flat:
            assert d.num_views == d0.num_views
            assert d._resolutions == d0._resolutions
        super().__init__(d0.num_views, d0._resolutions,
                         sum(len(d) for d in flat),
                         min(d.min_memory_num_views for d in flat),
                         max(d.max_memory_num_views for d in flat))

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            i, ar, mv = idx
        else:
            i, ar, mv = idx, 0, self.num_views
        for d in self.datasets:
            if i < len(d):
                return d[(i, ar, mv)]
            i -= len(d)
        raise IndexError(idx)


class MulDataset(MultiViewDataset):
    def __init__(self, factor: int, dataset: MultiViewDataset):
        self.factor = factor
        self.dataset = dataset
        super().__init__(dataset.num_views, dataset._resolutions,
                         factor * len(dataset),
                         dataset.min_memory_num_views,
                         dataset.max_memory_num_views)

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            i, ar, mv = idx
            return self.dataset[(i % len(self.dataset), ar, mv)]
        return self.dataset[idx % len(self.dataset)]


class ResizedDataset(MultiViewDataset):
    def __init__(self, size: int, dataset: MultiViewDataset):
        self.dataset = dataset
        super().__init__(dataset.num_views, dataset._resolutions, size,
                         dataset.min_memory_num_views,
                         dataset.max_memory_num_views)
        # deterministic shuffled index map covering the parent
        rng = np.random.default_rng(777)
        reps = -(-size // len(dataset))
        order = np.concatenate(
            [rng.permutation(len(dataset)) for _ in range(reps)])
        self._map = order[:size]

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            i, ar, mv = idx
            return self.dataset[(int(self._map[i]), ar, mv)]
        return self.dataset[int(self._map[idx])]


class BatchedRandomSampler:
    """Yields (sample_idx, ar_idx, memory_num_views) tuples; the two feature
    draws are constant within each batch and the index stream is
    batch-aligned per data-parallel host (reference
    must3r_base_dataset.py:13-50)."""

    def __init__(self, dataset: MultiViewDataset, batch_size: int,
                 world_size: int = 1, rank: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.world_size = world_size
        self.rank = rank
        self.total_size = (len(dataset) // batch_size) * batch_size \
            if drop_last else len(dataset)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.batch_size * (
            (self.total_size + self.world_size * self.batch_size - 1)
            // (self.world_size * self.batch_size))

    def __iter__(self):
        rng = np.random.default_rng(seed=self.epoch + 777)
        sample_idxs = rng.permutation(self.total_size)
        n_batches = -(-self.total_size // self.batch_size)
        ar = rng.integers(self.dataset.num_resolutions, size=n_batches)
        mv = rng.integers(self.dataset.min_memory_num_views,
                          self.dataset.max_memory_num_views + 1,
                          size=n_batches)
        per = self.batch_size * (
            (self.total_size + self.world_size * self.batch_size - 1)
            // (self.world_size * self.batch_size))
        # Pad by wrapping so every rank yields exactly `per` samples even
        # when total_size % (world_size*batch_size) != 0 — otherwise later
        # ranks run fewer steps and the jitted global-batch step deadlocks
        # (torch DistributedSampler pads the same way).
        if len(sample_idxs) < self.world_size * per:
            sample_idxs = np.resize(sample_idxs, self.world_size * per)
        if self.world_size > 1:
            # The per-rank slices form ONE global batch per step under
            # GSPMD, so the feature draws must be identical across ranks
            # at the same step: rank r's k-th local batch uses the k-th
            # draw (vs the reference, where ranks may diverge --
            # acceptable for DDP, shape-illegal for a jitted global
            # array; SURVEY §5.8).
            steps = per // self.batch_size
            ar, mv = ar[:steps], mv[:steps]
            n_batches = steps
        ar = np.broadcast_to(ar[:, None], (n_batches, self.batch_size)
                             ).ravel()
        mv = np.broadcast_to(mv[:, None], (n_batches, self.batch_size)
                             ).ravel()
        local = sample_idxs[self.rank * per:(self.rank + 1) * per]
        m = len(local)
        idxs = np.stack([local, ar[:m], mv[:m]], axis=1)
        yield from (tuple(int(v) for v in row) for row in idxs)
