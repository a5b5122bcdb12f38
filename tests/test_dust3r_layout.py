"""Round-trip tests for the dust3r-preprocessed dataset layouts and the
TUM sequence loader, on synthetic copies of each real on-disk format
(reference must3r/datasets/co3d.py:15-86, scannetpp.py:15-57)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_jpg(path, rng, hw=(48, 64)):
    img = (rng.random((*hw, 3)) * 255).astype(np.uint8)
    cv2.imwrite(path, img[..., ::-1])


@pytest.fixture
def co3d_root(tmp_path, rng):
    root = tmp_path / "co3d"
    sel = {"chair": {"c1": list(range(4))}, "plant": {"p1": list(range(4))}}
    (root).mkdir()
    with open(root / "selected_seqs_train.json", "w") as f:
        json.dump(sel, f)
    for cat, instances in sel.items():
        for inst, ids in instances.items():
            base = root / cat / inst
            for sub in ("images", "depths", "masks"):
                (base / sub).mkdir(parents=True)
            for i in ids:
                _write_jpg(str(base / "images" / f"frame{i:06d}.jpg"), rng)
                k = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]],
                               np.float32)
                pose = np.eye(4, dtype=np.float32)
                pose[:3, 3] = [i * 0.1, 0, 0]
                np.savez(str(base / "images" / f"frame{i:06d}.npz"),
                         camera_pose=pose, camera_intrinsics=k,
                         maximum_depth=np.float32(4.0))
                d = (rng.random((48, 64)) * 30000 + 2000).astype(np.uint16)
                cv2.imwrite(
                    str(base / "depths" / f"frame{i:06d}.jpg.geometric.png"),
                    d)
                m = np.full((48, 64), 255, np.uint8)
                m[:8] = 0                      # some background
                cv2.imwrite(str(base / "masks" / f"frame{i:06d}.png"), m)
    return str(root)


def test_co3d_preprocessed_roundtrip(co3d_root):
    from must3r_tpu.datasets import Co3dPreprocessed

    ds = Co3dPreprocessed(co3d_root, num_views=3,
                          resolutions=((64, 48),), epoch_size=4)
    views = ds[(1, 0, 2)]
    assert len(views) == 3
    v = views[0]
    assert v["img"].shape == (48, 64, 3)
    assert not v["is_metric_scale"]
    # depth decoding: u16/65535 * maximum_depth, background masked out
    assert 0.0 <= v["depthmap"].max() <= 4.0
    assert (v["depthmap"][:6] == 0).all()      # masked bg rows
    assert v["valid_mask"].any() and np.isfinite(v["pts3d"]).all()


@pytest.fixture
def scannetpp_root(tmp_path, rng):
    root = tmp_path / "snpp"
    n = 6
    scenes = ["sceneA"]
    base = root / "sceneA"
    (base / "images").mkdir(parents=True)
    (base / "depth").mkdir(parents=True)
    images, intr, traj = [], [], []
    for i in range(n):
        name = f"DSC{i:05d}"
        images.append(name)
        _write_jpg(str(base / "images" / (name + ".jpg")), rng)
        d = (rng.random((48, 64)) * 3000 + 500).astype(np.uint16)
        cv2.imwrite(str(base / "depth" / (name + ".png")), d)
        intr.append([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
        p = np.eye(4)
        p[:3, 3] = [0, 0, i * 0.2]
        traj.append(p)
    pairs = np.asarray([[i, i + 1] for i in range(n - 1)])
    np.savez(str(root / "all_metadata.npz"),
             scenes=np.asarray(scenes), sceneids=np.zeros(n, int),
             images=np.asarray(images),
             intrinsics=np.asarray(intr, np.float32),
             trajectories=np.asarray(traj, np.float32), pairs=pairs)
    return str(root)


def test_scannetpp_preprocessed_roundtrip(scannetpp_root):
    from must3r_tpu.datasets import ScanNetppPreprocessed

    ds = ScanNetppPreprocessed(scannetpp_root, num_views=4,
                               resolutions=((64, 48),))
    assert len(ds) == 5                      # one tuple per pair
    views = ds[(2, 0, 2)]
    assert len(views) == 4
    v = views[0]
    assert v["is_metric_scale"]
    assert 0.4 < v["depthmap"].max() < 4.0   # millimeters -> meters
    # tuple grown over the pair graph: all views from the same scene
    assert all(w["label"].startswith("sceneA") for w in views)


def test_tum_sequence_loader(tmp_path, rng):
    from must3r_tpu.slam.data import TumSequence, make_loader

    seq = tmp_path / "fr1_xyz"
    (seq / "rgb").mkdir(parents=True)
    lines = ["# comment"]
    for i in range(6):
        name = f"rgb/{1305031102.0 + 0.1 * i:.6f}.png"
        img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(seq / name), img[..., ::-1])
        lines.append(f"{1305031102.0 + 0.1 * i:.6f} {name}")
    (seq / "rgb.txt").write_text("\n".join(lines))

    ld = make_loader(str(seq), subsamp=2)
    assert isinstance(ld, TumSequence)
    frames = list(ld)
    assert len(frames) == 3                   # subsampled 2x
    f0, ts0 = frames[0]
    assert f0.shape == (32, 48, 3)
    assert abs(ts0 - 1305031102.1) < 1e-6     # real timestamp as frame id
