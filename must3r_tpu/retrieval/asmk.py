"""Clean-room ASMK (Aggregated Selective Match Kernel) for image retrieval.

Replaces the external Cython `asmk` + `faiss` stack the reference drives in
`must3r/retrieval/processor.py:88-126`: codebook quantization, per-cell
aggregation of binarized residuals, and the selective binary match kernel

    sim(q, d) = sum_cells  sign(s) * |s|^alpha,   s = cos(b_q, b_d),

with multiple-assignment on the query side, thresholding, and
self-similarity normalization. All numpy on the host -- retrieval is not a
TPU hot path (a few thousand 64-d descriptors per collection); the
quantization matmul chunks to stay cache-friendly.

The published 64k-codebook pickles require the original package's classes;
`train_codebook` learns a fresh codebook from collection features instead
(`codebook.npz`), which is how the trainingfree pipeline bootstraps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np


def train_codebook(features: np.ndarray, k: int = 1024, iters: int = 20,
                   seed: int = 0) -> np.ndarray:
    """K-means codebook [k, D] over local features (minibatch Lloyd)."""
    from sklearn.cluster import MiniBatchKMeans

    k = min(k, features.shape[0])
    km = MiniBatchKMeans(n_clusters=k, n_init=3, max_iter=iters,
                         random_state=seed, batch_size=4096)
    km.fit(features.astype(np.float32))
    return km.cluster_centers_.astype(np.float32)


def _assign(features: np.ndarray, codebook: np.ndarray, topk: int,
            chunk: int = 8192) -> np.ndarray:
    """Indices [N, topk] of the nearest codebook cells per feature."""
    out = np.empty((features.shape[0], topk), np.int32)
    cb2 = (codebook ** 2).sum(-1)
    for i in range(0, features.shape[0], chunk):
        f = features[i:i + chunk]
        d = (f ** 2).sum(-1, keepdims=True) - 2 * f @ codebook.T + cb2
        if topk == 1:
            out[i:i + chunk, 0] = np.argmin(d, axis=-1)
        else:
            idx = np.argpartition(d, topk - 1, axis=-1)[:, :topk]
            ord_ = np.take_along_axis(d, idx, -1).argsort(-1)
            out[i:i + chunk] = np.take_along_axis(idx, ord_, -1)
    return out


@dataclass
class _IVF:
    """Inverted file: per cell, the binarized aggregated residual of each
    image that touches it."""
    cells: Dict[int, Tuple[np.ndarray, np.ndarray]]   # cell -> (ids, bits)
    n_images: int
    self_sim: np.ndarray                               # [n_images]


class ASMK:
    """build_ivf + query with the reference's settings: binary kernel,
    no IDF, MA=1 on the database / MA=5 on queries, alpha=3, threshold 0
    (processor.py:88-95)."""

    def __init__(self, codebook: np.ndarray, alpha: float = 3.0,
                 similarity_threshold: float = 0.0,
                 query_ma: int = 5, database_ma: int = 1):
        self.codebook = np.asarray(codebook, np.float32)
        self.alpha = alpha
        self.tau = similarity_threshold
        self.query_ma = min(query_ma, len(self.codebook))
        self.database_ma = min(database_ma, len(self.codebook))

    # -- database ----------------------------------------------------------

    def _aggregate(self, features, ids, ma: int):
        """Per (image, cell): binarize the sum of residuals.

        Fully vectorized group-by: one lexsort over all (assignment pass,
        feature) rows, run-boundary detection, `np.add.reduceat` for the
        per-group residual sums -- the only remaining python loop is over
        distinct cells. (A per-group loop costs seconds on a 50-image
        collection with MA=5.)

        Returns dict cell -> (image_ids [M], bits [M, D] bool)."""
        assign = _assign(features, self.codebook, ma)      # [N, ma]
        n = features.shape[0]
        if n == 0:
            return {}
        cell_flat = assign.T.reshape(-1)                   # [ma*N]
        ids_flat = np.tile(np.asarray(ids, np.int64), ma)
        feat_idx = np.tile(np.arange(n), ma)
        order = np.lexsort((ids_flat, cell_flat))
        cs = cell_flat[order]
        is_ = ids_flat[order]
        residual = features[feat_idx[order]] - self.codebook[cs]
        boundary = np.ones(len(cs), bool)
        boundary[1:] = (cs[1:] != cs[:-1]) | (is_[1:] != is_[:-1])
        starts = np.flatnonzero(boundary)
        agg = np.add.reduceat(residual, starts, axis=0)    # [groups, D]
        bits_all = agg >= 0
        gcells = cs[starts]
        gimgs = is_[starts]
        cell_bound = np.ones(len(starts), bool)
        cell_bound[1:] = gcells[1:] != gcells[:-1]
        cstarts = np.flatnonzero(cell_bound)
        cends = np.append(cstarts[1:], len(starts))
        return {int(gcells[s]): (gimgs[s:e], bits_all[s:e])
                for s, e in zip(cstarts, cends)}

    def build_ivf(self, features: np.ndarray, ids: np.ndarray) -> "_IVF":
        features = np.ascontiguousarray(features, np.float32)
        ids = np.asarray(ids, np.int64)
        cells = self._aggregate(features, ids, self.database_ma)
        n_images = int(ids.max()) + 1 if len(ids) else 0
        # self-similarity for normalization: each cell contributes
        # kernel(b, b) = 1^alpha = 1
        self_sim = np.zeros(n_images, np.float64)
        for cell, (imgs, bits) in cells.items():
            np.add.at(self_sim, imgs, 1.0)
        self_sim = np.sqrt(np.clip(self_sim, 1e-9, None))
        return _IVF(cells=cells, n_images=n_images, self_sim=self_sim)

    # -- query ---------------------------------------------------------------

    def query(self, ivf: _IVF, features: np.ndarray, ids: np.ndarray
              ) -> np.ndarray:
        """All queries vs the database: [n_queries, n_images] scores."""
        features = np.ascontiguousarray(features, np.float32)
        ids = np.asarray(ids, np.int64)
        nq = int(ids.max()) + 1 if len(ids) else 0
        q_cells = self._aggregate(features, ids, self.query_ma)
        d = features.shape[1]

        scores = np.zeros((nq, ivf.n_images), np.float64)
        q_self = np.zeros(nq, np.float64)
        for cell, (q_imgs, q_bits) in q_cells.items():
            np.add.at(q_self, q_imgs, 1.0)
            if cell not in ivf.cells:
                continue
            d_imgs, d_bits = ivf.cells[cell]
            # binary cosine in {-1,1}^D as a BLAS matmul (the boolean
            # hamming broadcast allocates mq x md x D and is ~10x slower)
            qpm = q_bits.astype(np.float32) * 2.0 - 1.0
            dpm = d_bits.astype(np.float32) * 2.0 - 1.0
            s = (qpm @ dpm.T) / d
            s = np.where(s >= self.tau,
                         np.sign(s) * np.abs(s) ** self.alpha, 0.0)
            scores[np.ix_(q_imgs, d_imgs)] += s
        q_self = np.sqrt(np.clip(q_self, 1e-9, None))
        return scores / (q_self[:, None] * ivf.self_sim[None, :])

    def similarity_matrix(self, features: np.ndarray, ids: np.ndarray
                          ) -> np.ndarray:
        """Reference Retriever.__call__: index a collection against itself
        and return the [n, n] score matrix (processor.py:98-126)."""
        ivf = self.build_ivf(features, ids)
        return self.query(ivf, features, ids)


def save_codebook(path: str, codebook: np.ndarray):
    np.savez(path, codebook=codebook)


def load_codebook(path: str) -> np.ndarray:
    """Load a codebook: our `.npz`, or a published reference
    `*_codebook.pkl` (reference processor.py:82-95) via the
    package-free unpickler below."""
    if path.endswith(".pkl"):
        return load_reference_codebook(path)
    return np.load(path)["codebook"]


# ---------------------------------------------------------------------------
# Published-codebook compatibility (weights-arrival readiness).
#
# The reference caches its trained codebook with the original `asmk`
# package's classes pickled in (`asmk.kmeans.*`; reference
# processor.py:93-95 train_codebook(cache_path=...)). That package is a
# Cython stack we don't ship. The loader below unpickles with generic
# stand-ins for any non-numpy class and extracts the centroid matrix from
# the reconstructed object graph -- all our ASMK needs is the [k, D]
# float array.
# ---------------------------------------------------------------------------

class _Stub:
    """Stand-in for a foreign pickled class: records construction args and
    state without needing the original package."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif (isinstance(state, tuple) and len(state) == 2
              and isinstance(state[1], dict)):
            self.__dict__.update(state[1])
            self.__dict__["_state0"] = state[0]
        else:
            self.__dict__["_state"] = state

    def __call__(self, *args, **kwargs):
        # reconstructor-style callables (e.g. module-level factory fns)
        return _Stub(*args, **kwargs)


def _stubbed_unpickler(file):
    import pickle

    safe_roots = {"numpy", "builtins", "collections", "copyreg",
                  "functools", "_codecs", "array"}

    class U(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] in safe_roots:
                return super().find_class(module, name)
            return type(name, (_Stub,), {"_module": module})

    return U(file)


def _walk_arrays(obj, out, seen):
    if id(obj) in seen:
        return
    seen.add(id(obj))
    if isinstance(obj, np.ndarray):
        out.append(obj)
    elif isinstance(obj, dict):
        for v in obj.values():
            _walk_arrays(v, out, seen)
    elif isinstance(obj, (list, tuple, set)):
        for v in obj:
            _walk_arrays(v, out, seen)
    elif isinstance(obj, _Stub):
        _walk_arrays(obj.__dict__, out, seen)
        _walk_arrays(getattr(obj, "_args", ()), out, seen)


def load_reference_codebook(path: str) -> np.ndarray:
    """Extract the k-means centroid matrix from a published
    `*_codebook.pkl` without the original `asmk`/`faiss` packages.

    Heuristic: the centroids are the largest 2-D float array in the
    pickle (64k x D for the published files; every other array in the
    cache -- norms, counts, assignment stats -- is 1-D or far smaller).
    """
    with open(path, "rb") as f:
        obj = _stubbed_unpickler(f).load()
    arrays: list = []
    _walk_arrays(obj, arrays, set())
    cands = [a for a in arrays
             if a.ndim == 2 and np.issubdtype(a.dtype, np.floating)
             and a.shape[0] > a.shape[1]]
    if not cands:
        raise ValueError(
            f"{path}: no 2-D float centroid matrix found in the pickle"
            " (a faiss-serialized index would need the faiss package)")
    cb = max(cands, key=lambda a: a.size)
    return np.ascontiguousarray(cb, np.float32)
