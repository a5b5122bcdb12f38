"""Trajectory metric tests: Umeyama exactness, ATE/RPE invariances."""

import numpy as np
import pytest

from must3r_tpu.slam.metrics import (
    ate_rmse,
    evaluate_trajectory,
    rpe,
    scale_error,
    umeyama,
)


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _traj(rng, n=50):
    t = np.linspace(0, 4 * np.pi, n)
    pos = np.stack([np.cos(t), np.sin(t), 0.1 * t], -1)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = pos
    for i in range(n):
        poses[i, :3, :3] = _rotz(t[i])
    return poses


def test_umeyama_recovers_sim3(rng):
    src = rng.standard_normal((100, 3))
    r_gt = _rotz(0.7)
    s_gt, t_gt = 2.5, np.asarray([1.0, -2.0, 3.0])
    dst = s_gt * src @ r_gt.T + t_gt
    s, r, t = umeyama(src, dst)
    assert abs(s - s_gt) < 1e-9
    np.testing.assert_allclose(r, r_gt, atol=1e-9)
    np.testing.assert_allclose(t, t_gt, atol=1e-9)


def test_ate_zero_under_sim3_transform(rng):
    gt = _traj(rng)
    pred = gt.copy()
    # global sim3 warp of the prediction should align away completely
    r = _rotz(1.1)
    pred[:, :3, 3] = 3.0 * pred[:, :3, 3] @ r.T + np.asarray([5, 6, 7])
    out = ate_rmse(pred, gt, align="sim3")
    assert out["ate_rmse"] < 1e-9
    assert abs(out["scale"] - 1 / 3.0) < 1e-9
    assert scale_error(pred, gt) == pytest.approx(100 * abs(1 - 1 / 3.0),
                                                  abs=1e-6)


def test_ate_detects_noise(rng):
    gt = _traj(rng)
    pred = gt.copy()
    pred[:, :3, 3] += rng.standard_normal((len(gt), 3)) * 0.05
    out = ate_rmse(pred, gt)
    assert 0.02 < out["ate_rmse"] < 0.1


def test_rpe_identity():
    gt = _traj(np.random.default_rng(0))
    out = rpe(gt, gt, delta=2)
    assert out["rpe_trans_rmse"] < 1e-9
    assert out["rpe_rot_rmse_deg"] < 1e-4


def test_evaluate_trajectory_timestamp_matching(rng):
    gt = _traj(rng, 40)
    ts_gt = np.arange(40)
    pred = gt[::2]
    ts_pred = ts_gt[::2]
    out = evaluate_trajectory(pred, gt, ts_pred, ts_gt)
    assert out["ate_rmse"] < 1e-9
    assert "rpe_trans_rmse" in out
