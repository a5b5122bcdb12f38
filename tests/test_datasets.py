"""Dataset tests: geometry exactness, pipeline, sampler, algebra, loader."""

import numpy as np
import pytest

from must3r_tpu.datasets import (
    BatchedRandomSampler,
    SyntheticScenes,
    collate_views,
    depthmap_to_world_points,
    fill_views,
    get_data_loader,
    make_view,
    select_tuple_from_360_scene,
    select_tuple_from_pairs,
)


def test_depthmap_to_world_points_exact():
    k = np.asarray([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32)
    depth = np.full((24, 32), 2.0, np.float32)
    pts, valid = depthmap_to_world_points(depth, k)
    assert valid.all()
    # principal-point pixel maps to (0, 0, z); grid uses integer pixel coords
    np.testing.assert_allclose(pts[12, 16], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(pts[12, 26], [2.0 * 10 / 50, 0, 2.0],
                               atol=1e-6)
    # pose transport
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1, 2, 3]
    pts_w, _ = depthmap_to_world_points(depth, k, c2w)
    np.testing.assert_allclose(pts_w[12, 16], [1, 2, 5.0], atol=1e-5)


def test_synthetic_views_are_multiview_consistent(rng):
    """GT pointmaps of two views of the same scene must describe the same
    surfaces: each view's world points reprojected into itself via the
    stored pose/intrinsics reproduce the pixel grid."""
    ds = SyntheticScenes(num_views=3, resolutions=((64, 48),),
                         epoch_size=8, seed=1)
    views = ds[0]
    assert len(views) == 3
    for vw in views:
        h, w = vw["img"].shape[:2]
        assert vw["pts3d"].shape == (h, w, 3)
        valid = vw["valid_mask"]
        assert valid.mean() > 0.2
        # reproject world points through w2c and K: must land on the grid
        c2w = vw["camera_pose"]
        k = vw["camera_intrinsics"]
        pts = vw["pts3d"][valid]
        r, t = c2w[:3, :3], c2w[:3, 3]
        cam = (pts - t) @ r
        uv = cam[:, :2] / cam[:, 2:3] * [k[0, 0], k[1, 1]] + [k[0, 2],
                                                              k[1, 2]]
        vv, uu = np.nonzero(valid)
        if vw["portrait"]:
            vv, uu = uu, vv
        np.testing.assert_allclose(uv[:, 0], uu + 0.5, atol=0.51)
        np.testing.assert_allclose(uv[:, 1], vv + 0.5, atol=0.51)
        assert (vw["sky_mask"] == (vw["depthmap"] < 0)).all()


def test_tuple_from_pairs_bfs():
    graph = {0: {1, 2}, 1: {0, 3}, 2: {0}, 3: {1, 4}, 4: {3}}
    got = select_tuple_from_pairs(lambda i: graph[i], lambda i, rng: i,
                                  num_views=5, memory_num_views=5,
                                  rng=np.random.default_rng(0),
                                  idx1=0, idx2=1)
    assert len(got) == 5 and set(got) == {0, 1, 2, 3, 4}


def test_tuple_fill_pads_by_duplication():
    assert fill_views([7], 4) == [7, 7, 7, 7]


def test_tuple_360_skips_invalid():
    got = select_tuple_from_360_scene(
        is_valid_getter=lambda i: i % 2 == 0,
        is_valid_check=lambda v, i: True,
        view_getter=lambda i, rng: i,
        nimg_per_scene=10, num_views=3,
        rng=np.random.default_rng(0), idx=0)
    assert len(got) == 3 and all(v % 2 == 0 for v in got)


def test_batched_sampler_constant_features_within_batch():
    ds = SyntheticScenes(num_views=4, resolutions=((64, 48), (64, 32)),
                         epoch_size=32, min_memory_num_views=2,
                         max_memory_num_views=4)
    s = BatchedRandomSampler(ds, batch_size=4)
    s.set_epoch(0)
    idxs = list(s)
    assert len(idxs) == 32
    for i in range(0, 32, 4):
        batch = idxs[i:i + 4]
        assert len({b[1] for b in batch}) == 1      # same ar
        assert len({b[2] for b in batch}) == 1      # same memory_num_views
    # shard alignment: two ranks partition the batches
    a = list(BatchedRandomSampler(ds, 4, world_size=2, rank=0))
    b = list(BatchedRandomSampler(ds, 4, world_size=2, rank=1))
    assert len(a) == len(b) == 16
    assert not (set(a) & set(b))


def test_batched_sampler_uneven_shards_padded():
    # epoch 100 samples, bs 4, ws 2: 100/(2*4) is uneven -> ranks must
    # still yield the SAME number of samples (wrap padding, like torch's
    # DistributedSampler) or the jitted global-batch step deadlocks.
    ds = SyntheticScenes(num_views=4, resolutions=((64, 48),),
                         epoch_size=100, min_memory_num_views=2,
                         max_memory_num_views=4)
    samplers = [BatchedRandomSampler(ds, 4, world_size=2, rank=r)
                for r in range(2)]
    for s in samplers:
        s.set_epoch(3)
    a, b = (list(s) for s in samplers)
    assert len(a) == len(b) == len(samplers[0]) == 52
    # per-step features identical across ranks (one global batch/step)
    for i in range(0, 52, 4):
        feats = {(t[1], t[2]) for t in a[i:i + 4] + b[i:i + 4]}
        assert len(feats) == 1
    # padding wraps sample indices but every real sample is still seen
    assert {t[0] for t in a} | {t[0] for t in b} == set(range(100))


def test_dataset_algebra():
    d1 = SyntheticScenes(num_views=2, resolutions=((64, 48),), epoch_size=4)
    d2 = SyntheticScenes(num_views=2, resolutions=((64, 48),), epoch_size=6)
    assert len(d1 + d2) == 10
    assert len(3 * d1) == 12
    assert len(d1 @ 7) == 7
    views = (d1 + d2)[(8, 0, 2)]
    assert len(views) == 2


def test_loader_collates_train_batch():
    ds = SyntheticScenes(num_views=3, resolutions=((64, 48),), epoch_size=4,
                         seed=0)
    loader = get_data_loader(ds, batch_size=2)
    batch = next(iter(loader))
    assert batch["img"].shape == (2, 3, 48, 64, 3)
    assert batch["pos"].shape == (2, 3, 12, 2)
    assert batch["pts3d"].shape == (2, 3, 48, 64, 3)
    assert batch["camera_pose"].shape == (2, 3, 4, 4)
    assert batch["is_metric_scale"].shape == (2,)
    assert isinstance(batch["memory_num_views"], int)
    assert np.isfinite(batch["pts3d"]).all()


def test_colorjitter_transform_plumbs_through():
    """transform='ColorJitter' (reference README.md:242 recipe) changes the
    normalized pixels but nothing geometric."""
    from must3r_tpu.datasets import SyntheticScenes
    base = SyntheticScenes(num_views=2, resolutions=((64, 48),),
                           epoch_size=2, seed=3)
    jit = SyntheticScenes(num_views=2, resolutions=((64, 48),),
                          epoch_size=2, seed=3, transform="ColorJitter")
    v0 = base[(0, 0, 2)][0]
    v1 = jit[(0, 0, 2)][0]
    assert v0["img"].shape == v1["img"].shape
    assert not np.allclose(v0["img"], v1["img"])
    np.testing.assert_allclose(v0["pts3d"], v1["pts3d"])
    np.testing.assert_array_equal(v0["valid_mask"], v1["valid_mask"])


def test_build_dataset_accepts_transform_name():
    from must3r_tpu.cli.train_cli import build_dataset
    ds = build_dataset("SyntheticScenes(num_views=2, resolutions=(64, 48), "
                       "epoch_size=2, transform=ColorJitter)")
    from must3r_tpu.tools.image import color_jitter
    assert ds.transform is color_jitter


def test_loader_prefetch_matches_sequential():
    """num_workers>0 (pipelined prefetch) must yield the SAME batches in
    the SAME order as the sequential path."""
    ds = SyntheticScenes(num_views=3, resolutions=((64, 48),), epoch_size=8,
                         seed=0)
    seq = get_data_loader(ds, batch_size=2, num_workers=0)
    par = get_data_loader(ds, batch_size=2, num_workers=3)
    seq.set_epoch(1)
    par.set_epoch(1)
    b_seq = list(iter(seq))
    b_par = list(iter(par))
    assert len(b_seq) == len(b_par) == len(seq)
    for a, b in zip(b_seq, b_par):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
