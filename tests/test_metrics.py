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


def test_reconstruction_metrics_identity_and_noise(rng):
    """Acc/Comp/NC protocol (assets/evals.md:44-46): identical clouds score
    perfectly; noise degrades accuracy but not completion symmetry."""
    from must3r_tpu.engine.evaluate import (pointmap_normals,
                                            reconstruction_metrics)
    h, w = 24, 32
    u, v = np.meshgrid(np.linspace(0, 2, w), np.linspace(0, 1.5, h))
    pts = np.stack([u, v, 0.2 * np.sin(3 * u) + 0.1 * v ** 2], -1)
    nrm = pointmap_normals(pts)
    assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)

    m = reconstruction_metrics(pts, pts, nrm, nrm)
    assert m["accuracy"] < 1e-7 and m["completion"] < 1e-7
    assert m["nc"] > 0.999 and m["nc_med"] > 0.999

    noisy = pts + rng.normal(0, 0.01, pts.shape)
    m2 = reconstruction_metrics(noisy, pts, pointmap_normals(noisy), nrm)
    assert 0.003 < m2["accuracy"] < 0.05
    assert 0.003 < m2["completion"] < 0.05
    assert m2["nc"] < m["nc"]


def test_umeyama_alignment_4x4(rng):
    from must3r_tpu.engine.evaluate import umeyama_alignment
    src = rng.standard_normal((100, 3))
    ang = 0.4
    r = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    dst = 2.5 * src @ r.T + np.asarray([1.0, -2.0, 0.5])
    t = umeyama_alignment(src, dst)
    aligned = src @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(aligned, dst, atol=1e-6)


def test_evaluate_reconstruction_on_synthetic():
    """End-to-end Acc/Comp/NC harness over the synthetic loader (untrained
    net: just finite metrics with the right keys)."""
    import jax
    import jax.numpy as jnp
    from must3r_tpu.config import DecoderConfig, EncoderConfig
    from must3r_tpu.datasets import SyntheticScenes, get_data_loader
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.evaluate import evaluate_reconstruction
    from must3r_tpu.models import init_decoder, init_encoder

    hw = (32, 32)
    enc_cfg = EncoderConfig(img_size=hw, patch_size=16, embed_dim=32,
                            depth=1, num_heads=2)
    dec_cfg = DecoderConfig(img_size=hw, enc_embed_dim=32, patch_size=16,
                            embed_dim=32, output_dim=16 * 16 * 7, depth=1,
                            num_heads=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.float32, impl="chunked")
    ds = SyntheticScenes(num_views=2, resolutions=((32, 32),), epoch_size=2,
                         render_hw=(32, 32))
    loader = get_data_loader(ds, batch_size=1, patch_size=16)
    rep = evaluate_reconstruction(core, loader, num_mem_views=2,
                                  max_batches=1, verbose=False)
    for key in ("accuracy", "completion", "nc", "accuracy_med"):
        assert key in rep and np.isfinite(rep[key])


def test_depth_metrics_scale_invariant_and_inliers(rng):
    """Median scaling makes the metric scale-invariant; inliers@1.03 is
    the published robust-MVD headline (reference assets/evals.md:53-74)."""
    from must3r_tpu.engine.evaluate import depth_metrics

    gt = rng.random((32, 32)).astype(np.float64) + 1.0
    valid = np.ones_like(gt, bool)

    # exact prediction up to a global scale -> perfect scores
    m = depth_metrics(gt * 3.7, gt, valid)
    assert m["abs_rel"] < 1e-9
    assert m["inliers_1.03"] == 100.0
    assert m["delta_1.25"] == 1.0

    # 2% relative noise: inside 1.03 but abs_rel reflects it
    noisy = gt * (1.0 + 0.02 * np.sign(rng.random(gt.shape) - 0.5))
    m2 = depth_metrics(noisy, gt, valid)
    assert m2["inliers_1.03"] > 95.0
    assert 0.005 < m2["abs_rel"] < 0.05

    # 50% error on half the pixels tanks the inlier rate
    bad = gt.copy()
    bad[:16] *= 1.5
    m3 = depth_metrics(bad, gt, valid)
    assert m3["inliers_1.03"] < 80.0


def test_pnp_pose_recovers_known_camera(rng):
    """Build a pointmap from a known camera (focal f, pose c2w); PnP on the
    pixel grid + global points must recover that pose."""
    from must3r_tpu.engine.evaluate import pnp_pose

    h, w, f = 48, 64, 60.0
    # known c2w: rotation about y + translation
    ang = 0.4
    r = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([0.3, -0.2, 1.1])
    gx, gy = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    z = 2.0 + rng.random((h, w))            # varied depths
    local = np.stack([(gx - w / 2.0) / f * z,
                      (gy - h / 2.0) / f * z, z], -1)
    pts3d = local @ r.T + t
    conf = np.ones((h, w))

    c2w = pnp_pose(pts3d, conf, f)
    np.testing.assert_allclose(c2w[:3, :3], r, atol=1e-5)
    np.testing.assert_allclose(c2w[:3, 3], t, atol=1e-5)
