"""Batch collation + data loading for the jitted train step.

Replaces the reference's torch DataLoader stack
(`must3r/datasets/__init__.py:8-42`): the sampler yields
(sample, ar_idx, memory_num_views) tuples with per-batch-constant features;
collation produces the numpy dict consumed by
`must3r_tpu.engine.train.make_train_step` directly. Host-side and
torch-free; `num_workers` uses a thread pool (dataset __getitem__ is
numpy-bound, so threads overlap the device step well enough on TPU VMs).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np

from must3r_tpu.datasets.base import BatchedRandomSampler, MultiViewDataset
from must3r_tpu.ops.patch import patchify_positions


def view_patch_positions(true_shape, portrait: bool, patch_size: int
                         ) -> np.ndarray:
    """(y, x) patch coords of a stored-landscape view; portrait views swap."""
    h, w = true_shape
    if portrait:
        h, w = w, h     # stored transposed
    hp, wp = h // patch_size, w // patch_size
    pos = np.asarray(patchify_positions(hp, wp))
    if portrait:
        pos = pos[:, ::-1]
    return pos


def collate_views(samples: List[List[Dict]], patch_size: int = 16) -> Dict:
    """List of per-sample view lists -> batch dict of stacked arrays:
    img [B,V,H,W,3], pos [B,V,N,2], pts3d, camera_pose, valid_mask,
    sky_mask, portrait [B,V], is_metric_scale [B], memory_num_views int."""
    b = len(samples)
    v = len(samples[0])

    def stack(key):
        return np.stack([np.stack([vw[key] for vw in s]) for s in samples])

    pos = np.stack([
        np.stack([view_patch_positions(vw["true_shape"], vw["portrait"],
                                       patch_size) for vw in s])
        for s in samples])
    return {
        "img": stack("img").astype(np.float32),
        "depthmap": stack("depthmap").astype(np.float32),
        "pos": pos.astype(np.int32),
        "pts3d": stack("pts3d").astype(np.float32),
        "camera_pose": stack("camera_pose").astype(np.float32),
        "valid_mask": stack("valid_mask"),
        "sky_mask": stack("sky_mask"),
        "portrait": np.stack([[vw["portrait"] for vw in s]
                              for s in samples]),
        "true_shape": stack("true_shape"),
        "is_metric_scale": np.asarray(
            [s[0]["is_metric_scale"] for s in samples]),
        "memory_num_views": int(samples[0][0]["memory_num_views"]),
    }


class DataLoader:
    def __init__(self, dataset: MultiViewDataset, batch_size: int,
                 world_size: int = 1, rank: int = 0, num_workers: int = 0,
                 patch_size: int = 16, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = BatchedRandomSampler(dataset, batch_size, world_size,
                                            rank, drop_last)
        self.num_workers = num_workers
        self.patch_size = patch_size

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)

    def __len__(self):
        return len(self.sampler) // self.batch_size

    def _build(self, bt) -> Dict:
        return collate_views([self.dataset[i] for i in bt], self.patch_size)

    def __iter__(self) -> Iterator[Dict]:
        idxs = list(self.sampler)
        batches = [idxs[i:i + self.batch_size]
                   for i in range(0, len(idxs), self.batch_size)]
        batches = [bt for bt in batches if len(bt) == self.batch_size]
        if self.num_workers > 0:
            # Pipelined prefetch (the torch DataLoader role,
            # reference must3r/datasets/__init__.py:33-40): up to
            # num_workers batches build concurrently while the trainer
            # consumes the head; yielded strictly in sampler order.
            from collections import deque
            with ThreadPoolExecutor(self.num_workers) as pool:
                depth = max(2, self.num_workers)
                pending = deque()
                it = iter(batches)
                for bt in it:
                    pending.append(pool.submit(self._build, bt))
                    if len(pending) >= depth:
                        break
                while pending:
                    yield pending.popleft().result()
                    nxt = next(it, None)
                    if nxt is not None:
                        pending.append(pool.submit(self._build, nxt))
        else:
            for bt in batches:
                yield self._build(bt)


def get_data_loader(dataset, batch_size: int, world_size: int = 1,
                    rank: int = 0, num_workers: int = 0,
                    patch_size: int = 16) -> DataLoader:
    return DataLoader(dataset, batch_size, world_size, rank, num_workers,
                      patch_size)
