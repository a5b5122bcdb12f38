"""Retrieval tests: whitening, selection/pooling, ASMK, FPS graph."""

import numpy as np
import pytest

from must3r_tpu.retrieval import (
    ASMK,
    RetrievalHead,
    farthest_point_sampling,
    how_select_local,
    make_pairs_fps,
    pcawhiten_learn,
    train_codebook,
    weighted_spoc,
)
from must3r_tpu.retrieval.graph import greedy_keyframe_ordering
from must3r_tpu.retrieval.model import identity_head, whiten

import jax.numpy as jnp


def test_pcawhiten_decorrelates(rng):
    x = rng.standard_normal((500, 8)) @ rng.standard_normal((8, 8))
    m, p = pcawhiten_learn(x)
    xw = (x - m) @ p
    cov = xw.T @ xw / len(xw)
    np.testing.assert_allclose(cov, np.eye(8), atol=0.15)


def test_how_select_local_topk(rng):
    feat = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    attn = jnp.asarray(rng.random((2, 10)), jnp.float32)
    f, a, idx = how_select_local(feat, attn, 3)
    assert f.shape == (2, 3, 4)
    want = np.sort(np.asarray(attn), axis=1)[:, -3:][:, ::-1]
    np.testing.assert_allclose(np.asarray(a), want, rtol=1e-6)
    # fraction mode
    f2, _, _ = how_select_local(feat, attn, -0.5)
    assert f2.shape == (2, 5, 4)


def test_weighted_spoc_normalized(rng):
    feat = jnp.asarray(rng.standard_normal((3, 7, 16)), jnp.float32)
    attn = jnp.asarray(rng.random((3, 7)), jnp.float32)
    g = weighted_spoc(feat, attn)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(g), axis=-1), 1.0,
                               rtol=1e-5)


def _clustered_features(rng, n_imgs=8, feats_per_img=40, dim=16, n_groups=2):
    """Two groups of images; images in a group share most local features."""
    feats, ids = [], []
    protos = rng.standard_normal((n_groups, 20, dim)) * 3
    for i in range(n_imgs):
        g = i % n_groups
        base = protos[g][rng.integers(0, 20, feats_per_img)]
        f = base + rng.standard_normal((feats_per_img, dim)) * 0.05
        feats.append(f.astype(np.float32))
        ids.append(np.full(feats_per_img, i, np.int64))
    return np.concatenate(feats), np.concatenate(ids), n_imgs, n_groups


def test_asmk_groups_similar_images(rng):
    feats, ids, n_imgs, n_groups = _clustered_features(rng)
    cb = train_codebook(feats, k=32)
    asmk = ASMK(cb)
    scores = asmk.similarity_matrix(feats, ids)
    assert scores.shape == (n_imgs, n_imgs)
    # self-similarity should dominate
    assert (np.argmax(scores, axis=1) == np.arange(n_imgs)).all()
    # same-group scores above cross-group scores
    same, cross = [], []
    for i in range(n_imgs):
        for j in range(n_imgs):
            if i == j:
                continue
            (same if i % n_groups == j % n_groups else cross).append(
                scores[i, j])
    assert np.mean(same) > 3.0 * np.mean(cross)


def test_asmk_normalization_bounds(rng):
    feats, ids, n_imgs, _ = _clustered_features(rng, n_imgs=4)
    cb = train_codebook(feats, k=16)
    scores = ASMK(cb).similarity_matrix(feats, ids)
    assert scores.max() <= 1.0 + 1e-6


def test_fps_covers_space(rng):
    pts = np.concatenate([rng.standard_normal((20, 2)),
                          rng.standard_normal((20, 2)) + 10.0])
    dist = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    idx, _ = farthest_point_sampling(dist, n=2, seed=0)
    # the two samples must come from different clusters
    assert (idx[0] < 20) != (idx[1] < 20)


def test_fps_unique_on_degenerate_matrix():
    """Near-identical views give an all-~zero distance matrix; FPS must
    still return UNIQUE anchors (a duplicate corrupted the keyframe
    permutation in get_reconstruction --mode retrieval: r5 regression,
    reference demo/inference.py:139-171 role)."""
    dist = np.zeros((6, 6))
    idx, _ = farthest_point_sampling(dist, n=4, seed=0)
    assert len(idx) == len(set(idx.tolist()))
    # n > N must also terminate with unique anchors
    idx2, _ = farthest_point_sampling(np.zeros((3, 3)), n=10, seed=0)
    assert sorted(idx2.tolist()) == [0, 1, 2]


def test_select_keyframes_unique_on_similar_views(rng):
    """End-to-end select_keyframes on near-identical token sets returns
    a valid permutation prefix (no duplicate ids)."""
    from must3r_tpu.demo.inference import select_keyframes

    base = rng.standard_normal((1, 16, 32)).astype(np.float32)
    x = np.repeat(base, 6, axis=0) + 1e-4 * rng.standard_normal(
        (6, 16, 32)).astype(np.float32)
    kfs = select_keyframes(None, x, 4)
    assert len(kfs) == len(set(kfs))
    assert all(0 <= k < 6 for k in kfs)


def test_make_pairs_fps_connectivity(rng):
    n = 12
    sim = rng.random((n, n))
    sim = (sim + sim.T) / 2
    np.fill_diagonal(sim, 1.0)
    pairs, keys = make_pairs_fps(sim, na=4, topk=1, seed=0)
    assert len(keys) == 4
    # every image appears in at least one pair
    seen = set()
    for a, b in pairs:
        seen.update((a, b))
    assert seen == set(range(n))


def test_greedy_ordering_visits_all(rng):
    sim = rng.random((6, 6))
    order = greedy_keyframe_ordering(sim)
    assert sorted(order) == list(range(6))


def test_identity_head_local_features(rng):
    head = identity_head(32, nfeat=5)
    toks = [rng.standard_normal((10, 32)).astype(np.float32)
            for _ in range(3)]
    feats, ids = head.extract_local_features(toks)
    assert feats.shape == (15, 32)
    np.testing.assert_array_equal(np.unique(ids), [0, 1, 2])


def test_asmk_matches_naive_spec_transcription(rng):
    """Production ASMK (lexsort/run-boundary grouping, packed IVF) vs an
    INDEPENDENT naive transcription of the kernel spec (Tolias et al.:
    per-(image, cell) binarized aggregated residuals; selective binary
    kernel sign(u)|u|^alpha with threshold; sqrt self-similarity
    normalization; MA on the query side only). Closes the 'parity is
    sanity-level' gap without the Cython package."""
    from must3r_tpu.retrieval.asmk import ASMK

    d, n_imgs, n_per = 16, 6, 30
    feats = rng.standard_normal((n_imgs * n_per, d)).astype(np.float32)
    ids = np.repeat(np.arange(n_imgs), n_per)
    codebook = rng.standard_normal((12, d)).astype(np.float32)
    alpha, tau, qma = 3.0, 0.0, 3

    def naive_agg(ma):
        """image -> {cell: +-1 vector} by brute force."""
        per_img = [{} for _ in range(n_imgs)]
        d2 = ((feats[:, None, :] - codebook[None]) ** 2).sum(-1)
        nearest = np.argsort(d2, axis=1)[:, :ma]
        for fi in range(len(feats)):
            for cell in nearest[fi]:
                res = feats[fi] - codebook[cell]
                acc = per_img[ids[fi]].setdefault(int(cell),
                                                  np.zeros(d))
                per_img[ids[fi]][int(cell)] = acc + res
        return [{c: np.where(v >= 0, 1.0, -1.0)
                 for c, v in img.items()} for img in per_img]

    q_agg = naive_agg(qma)
    d_agg = naive_agg(1)
    want = np.zeros((n_imgs, n_imgs))
    for qi in range(n_imgs):
        for di in range(n_imgs):
            s = 0.0
            for cell, bq in q_agg[qi].items():
                if cell in d_agg[di]:
                    u = float(bq @ d_agg[di][cell]) / d
                    if u >= tau:
                        s += np.sign(u) * abs(u) ** alpha
            want[qi, di] = s / np.sqrt(len(q_agg[qi]) * len(d_agg[di]))

    got = ASMK(codebook, alpha=alpha, similarity_threshold=tau,
               query_ma=qma, database_ma=1).similarity_matrix(feats, ids)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_load_reference_codebook_without_package(tmp_path):
    """Simulate the published *_codebook.pkl: pickle an object graph whose
    classes live in an 'asmk' package, remove the package, and load the
    centroids with the package-free unpickler
    (reference processor.py:82-95)."""
    import pickle
    import sys
    import types

    import numpy as np

    from must3r_tpu.retrieval.asmk import load_codebook

    pkg = types.ModuleType("asmk")
    km = types.ModuleType("asmk.kmeans")

    class Codebook:
        def __init__(self):
            self.centroids = None
            self.norms = None
            self.trained = True

    class ASMKMethod:
        pass

    Codebook.__module__ = "asmk.kmeans"
    Codebook.__qualname__ = "Codebook"
    ASMKMethod.__module__ = "asmk.asmk_method"
    ASMKMethod.__qualname__ = "ASMKMethod"
    km.Codebook = Codebook
    pkg.kmeans = km
    pkg.asmk_method = types.ModuleType("asmk.asmk_method")
    pkg.asmk_method.ASMKMethod = ASMKMethod
    sys.modules["asmk"] = pkg
    sys.modules["asmk.kmeans"] = km
    sys.modules["asmk.asmk_method"] = pkg.asmk_method
    try:
        rng = np.random.default_rng(0)
        cb = Codebook()
        cb.centroids = rng.standard_normal((512, 64)).astype(np.float32)
        cb.norms = (cb.centroids ** 2).sum(-1)
        meta = ASMKMethod()
        meta.__dict__["codebook"] = cb
        meta.__dict__["params"] = {"size": 512}
        path = tmp_path / "model_codebook.pkl"
        with open(path, "wb") as f:
            pickle.dump({"codebook": meta, "train_time": 1.23}, f)
    finally:
        del sys.modules["asmk"], sys.modules["asmk.kmeans"]
        del sys.modules["asmk.asmk_method"]

    got = load_codebook(str(path))
    np.testing.assert_array_equal(got, cb.centroids)
