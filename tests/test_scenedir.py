"""Scene-directory dataset tests: write a synthetic scene to disk in the
documented format, load through Co3d / ScanNetpp."""

import os

import numpy as np
import pytest
from PIL import Image

from must3r_tpu.datasets import Co3d, ScanNetpp
from must3r_tpu.datasets.synthetic import SyntheticScenes


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    gen = SyntheticScenes(num_views=6, resolutions=((64, 48),),
                          epoch_size=6, render_hw=(48, 64), seed=3)
    for s in range(2):
        scene = gen._scene(s)
        d = root / f"scene{s}"
        (d / "images").mkdir(parents=True)
        (d / "depths").mkdir()
        intr, poses, frames = [], [], []
        k = np.asarray([[57.6, 0, 32], [0, 57.6, 24], [0, 0, 1]],
                       np.float32)
        for i in range(6):
            from must3r_tpu.datasets.synthetic import _look_at
            ang = 0.35 * i
            eye = np.asarray([4 * np.sin(ang), 0.2, -4 * np.cos(ang)],
                             np.float32)
            c2w = _look_at(eye, (0, 0, 0))
            img, depth = gen._render(scene, c2w, k, (48, 64))
            name = f"frame{i:04d}"
            Image.fromarray(img).save(d / "images" / f"{name}.png")
            np.save(d / "depths" / f"{name}.npy", depth)
            intr.append(k)
            poses.append(c2w)
            frames.append(name)
        pairs = np.stack([np.arange(5), np.arange(1, 6)], 1)
        np.savez(d / "cameras.npz", intrinsics=np.stack(intr),
                 poses=np.stack(poses), frames=np.asarray(frames),
                 pairs=pairs)
    return str(root)


def test_co3d_loads_tuples(scene_root):
    ds = Co3d(scene_root, mask_bg=False, num_views=4,
              resolutions=((64, 48),), epoch_size=8, seed=0)
    views = ds[(1, 0, 4)]
    assert len(views) == 4
    for vw in views:
        assert vw["img"].shape == (48, 64, 3)
        assert vw["pts3d"].shape == (48, 64, 3)
        assert vw["valid_mask"].mean() > 0.1
        assert not vw["is_metric_scale"]


def test_scannetpp_pair_graph_tuples(scene_root):
    ds = ScanNetpp(scene_root, num_views=4, resolutions=((64, 48),),
                   epoch_size=8, seed=0)
    views = ds[(0, 0, 4)]
    assert len(views) == 4
    labels = {vw["label"] for vw in views}
    assert len(labels) == 1            # single scene per tuple
    assert all(vw["is_metric_scale"] for vw in views)


def test_scenedir_world_points_consistent(scene_root):
    """Depth loaded from disk must reproduce the renderer's world geometry:
    points from two different views of the same surface agree."""
    ds = ScanNetpp(scene_root, num_views=4, resolutions=((64, 48),),
                   epoch_size=8, seed=0)
    views = ds[(0, 0, 4)]
    a, b = views[0], views[1]
    pa = a["pts3d"][a["valid_mask"]]
    pb = b["pts3d"][b["valid_mask"]]
    # nearest-neighbor distance between the two clouds should be small
    from must3r_tpu.slam import KDTree3
    t = KDTree3()
    t.add_pts(pa[::7])
    d = t.query(pb[::7])
    assert np.median(d) < 0.2
