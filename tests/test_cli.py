"""End-to-end CLI smoke tests (tiny preset, synthetic data, CPU)."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from must3r_tpu.cli.eval_cli import main as eval_main
from must3r_tpu.cli.reconstruct import main as rec_main
from must3r_tpu.cli.slam_cli import main as slam_main
from must3r_tpu.cli.train_cli import build_dataset, main as train_main

DATASET = ("SyntheticScenes(num_views=4, resolutions=((64,48),), "
           "epoch_size=4, render_hw=(48,64))")


def test_build_dataset_algebra():
    ds = build_dataset(f"2*{DATASET} + {DATASET}")
    assert len(ds) == 12
    ds2 = build_dataset(f"{DATASET} @ 6")
    assert len(ds2) == 6


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    out = str(tmp_path / "run")
    args = ["--preset", "tiny", "--dataset", DATASET,
            "--output_dir", out, "--epochs", "2", "--batch_size", "2",
            "--memory_num_views", "4", "--causal",
            "--memory_batch_views", "2", "--amp", "float32",
            "--num_workers", "0", "--print_freq", "1", "--keep_freq", "2",
            "--warmup_epochs", "0.5"]
    train_main(args)
    assert os.path.isdir(os.path.join(out, "checkpoint-last"))
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))
    assert os.path.isdir(os.path.join(out, "checkpoint-2"))
    log = open(os.path.join(out, "log.txt")).read().strip().splitlines()
    assert len(log) == 2
    rec = json.loads(log[-1])
    assert np.isfinite(rec["loss"])

    # auto-resume: epochs=3 continues from epoch 2
    args[args.index("--epochs") + 1] = "3"
    train_main(args)
    log = open(os.path.join(out, "log.txt")).read().strip().splitlines()
    assert len(log) == 3


def test_train_cli_dp_mesh(tmp_path):
    """--dp_mesh trains over a dp mesh spanning all (virtual CPU) devices
    through the Trainer's global_batch path (SURVEY §5.8)."""
    out = str(tmp_path / "run_mesh")
    ds8 = DATASET.replace("epoch_size=4", "epoch_size=8")
    args = ["--preset", "tiny", "--dataset", ds8,
            "--output_dir", out, "--epochs", "1", "--batch_size", "8",
            "--memory_num_views", "4", "--causal",
            "--memory_batch_views", "2", "--amp", "float32",
            "--num_workers", "0", "--print_freq", "1", "--dp_mesh",
            "--warmup_epochs", "0.5"]
    train_main(args)
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))
    rec = json.loads(open(os.path.join(
        out, "log.txt")).read().strip().splitlines()[-1])
    assert np.isfinite(rec["loss"])


def test_eval_cli(tmp_path):
    out = str(tmp_path / "report.json")
    eval_main(["--preset", "tiny", "--dataset", DATASET,
               "--num_views", "2", "--max_batches", "2",
               "--amp", "fp32", "--output", out])
    report = json.load(open(out))
    assert "views2" in report
    assert np.isfinite(report["views2"]["l21_global_mean"])


@pytest.fixture
def image_folder(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i:02d}.png")
    return str(d)


def test_reconstruct_cli(tmp_path, image_folder):
    out = str(tmp_path / "rec")
    rec_main(["--preset", "tiny", "--input", image_folder,
              "--output_dir", out, "--image_size", "64",
              "--num_mem_images", "3", "--is_sequence",
              "--conf_thrs", "1.0", "--amp", "fp32", "--max_bs", "4"])
    assert os.path.isfile(os.path.join(out, "scene.pkl"))
    assert os.path.isfile(os.path.join(out, "scene_conf1.glb"))
    assert os.path.isfile(os.path.join(out, "scene_conf1.ply"))
    scene = pickle.load(open(os.path.join(out, "scene.pkl"), "rb"))
    assert scene.pts3d.shape[0] == 4


def test_slam_cli(tmp_path, image_folder):
    out = str(tmp_path / "slam")
    slam_main(["--preset", "tiny", "--input", image_folder,
               "--output_dir", out, "--res", "64", "--subsamp", "1",
               "--num_init_frames", "1", "--max_keyframes", "8",
               "--amp", "fp32", "--save_memory",
               "--filtering_mode", "laplacian"])
    data = np.load(os.path.join(out, "all_poses.npz"), allow_pickle=True)
    assert data["poses"].shape == (4, 4, 4)
    assert os.path.isfile(os.path.join(out, "memory.pkl"))


def test_slam_cli_web_gui(tmp_path, image_folder):
    """--web runs the full browser-GUI path (panels published per frame,
    map per keyframe) end to end on a tiny sequence."""
    out = str(tmp_path / "slamweb")
    slam_main(["--preset", "tiny", "--input", image_folder,
               "--output_dir", out, "--res", "64", "--subsamp", "1",
               "--num_init_frames", "1", "--max_keyframes", "8",
               "--amp", "fp32", "--web", "--web_every", "1",
               "--live_port", "0"])
    data = np.load(os.path.join(out, "all_poses.npz"), allow_pickle=True)
    assert data["poses"].shape == (4, 4, 4)


def test_reconstruct_cli_video_mode(tmp_path, image_folder):
    out = str(tmp_path / "vrec")
    rec_main(["--preset", "tiny", "--input", image_folder,
              "--output_dir", out, "--image_size", "64",
              "--mode", "vidseq", "--keyframe_interval", "2",
              "--conf_thrs", "1.0", "--amp", "fp32", "--max_bs", "4"])
    assert os.path.isfile(os.path.join(out, "scene.pkl"))
    assert os.path.isfile(os.path.join(out, "scene.html"))


def test_slam_cli_gt_eval(tmp_path, image_folder):
    import numpy as np

    out = str(tmp_path / "slamgt")
    # fabricate a TUM-format GT file for frames 0..3
    gt = tmp_path / "gt.txt"
    with open(gt, "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n")
        for i in range(4):
            f.write(f"{i} {0.1*i} 0 0 0 0 0 1\n")
    slam_main(["--preset", "tiny", "--input", image_folder,
               "--output_dir", out, "--res", "64", "--subsamp", "1",
               "--num_init_frames", "1", "--max_keyframes", "8",
               "--amp", "fp32", "--gt_poses", str(gt)])
    import json
    rep = json.load(open(os.path.join(out, "ate_report.json")))
    assert "ate_rmse" in rep and np.isfinite(rep["ate_rmse"])
