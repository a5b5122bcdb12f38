"""Keyframe graph utilities: farthest point sampling + FPS pair graph.

Parity target: reference `must3r/retrieval/graph.py`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def farthest_point_sampling(dist: np.ndarray, n: Optional[int] = None,
                            dist_thresh: Optional[float] = None,
                            seed: Optional[int] = None
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy FPS over an [N, N] distance matrix. Stops early when the
    max remaining distance drops below dist_thresh."""
    assert n is not None or dist_thresh is not None
    if n is None:
        n = dist.shape[0]
    rng = np.random.default_rng(seed)
    indices = [int(rng.integers(dist.shape[0]))]
    distances = [0.0]
    for _ in range(1, n):
        if len(indices) == dist.shape[0]:
            break
        d = dist[indices].min(axis=0).astype(np.float64, copy=True)
        # never re-pick a selected point: on a near-uniform matrix
        # (e.g. ASMK sims ~1.0 between near-identical views) every
        # remaining distance can tie at ~0 and argmax would return an
        # already-chosen index, producing duplicate anchors (and a
        # corrupted keyframe permutation downstream)
        d[indices] = -np.inf
        best = int(d.argmax())
        if dist_thresh is not None and d[best] < dist_thresh:
            break
        indices.append(best)
        distances.append(float(d[best]))
    return np.asarray(indices), np.asarray(distances)


def make_pairs_fps(sim_mat: np.ndarray, na: int = 20, topk: int = 1,
                   dist_thresh: Optional[float] = None,
                   seed: Optional[int] = None):
    """Key-image complete graph + nearest-key attachments + local kNN edges
    (reference graph.py:41-76). Returns (pairs, keyimgs_idx)."""
    dist = 1.0 - sim_mat
    pairs = set()
    key_idx = np.array([], int)
    if na != 0:
        key_idx, _ = farthest_point_sampling(dist, n=na,
                                             dist_thresh=dist_thresh,
                                             seed=seed)
        for i in range(len(key_idx)):
            for j in range(i + 1, len(key_idx)):
                pairs.add((int(key_idx[i]), int(key_idx[j])))
        keyd = dist[:, key_idx]
        keyset = set(key_idx.tolist())
        for i in range(keyd.shape[0]):
            if i in keyset:
                continue
            j = int(keyd[i].argmin())
            a, b = sorted((i, int(key_idx[j])))
            if a != b:
                pairs.add((a, b))
    if topk > 0:
        for i in range(dist.shape[0]):
            for j in np.argsort(dist[i])[:topk]:
                a, b = sorted((i, int(j)))
                if a != b:
                    pairs.add((a, b))
    return list(pairs), key_idx


def greedy_keyframe_ordering(sim_matrix: np.ndarray) -> List[int]:
    """Order anchors by connectivity: start at the image with highest total
    similarity, then repeatedly append the image most similar to the
    already-selected set (reference demo/inference.py:154-171)."""
    sim = sim_matrix.copy()
    n = sim.shape[0]
    np.fill_diagonal(sim, 0.0)
    order = [int(np.argmax(sim.sum(-1)))]
    sim[:, order[0]] = 0.0
    while len(order) < n:
        sel = sim[np.asarray(order)]
        nxt = int(np.unravel_index(np.argmax(sel), sel.shape)[1])
        order.append(nxt)
        sim[:, nxt] = 0.0
    return order
