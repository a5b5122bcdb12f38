"""Engine tests: pose recovery on synthetic cameras, offline pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.config import ActivationType, DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.engine import InferenceCore, offline_reconstruction, postprocess
from must3r_tpu.models import init_decoder, init_encoder
from must3r_tpu.ops.geometry import apply_log_to_norm
from must3r_tpu.ops.pose import (
    estimate_focal_weiszfeld,
    geotrf,
    inv_se3,
    make_c2w,
    rigid_points_registration,
    xy_pixel_grid,
)


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.cos(angle / 2)
    b, c, d = -axis * np.sin(angle / 2)
    return np.array([
        [a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
        [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
        [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c]], np.float64)


def _synthetic_view(rng, h=24, w=32, focal=35.0):
    """Camera-frame pointmap from a random depth map + pinhole intrinsics."""
    depth = 2.0 + rng.random((h, w))
    grid = np.asarray(xy_pixel_grid(h, w)).reshape(h, w, 2)
    pp = np.array([w / 2.0, h / 2.0])
    xy = (grid - pp) / focal
    pts_local = np.concatenate([xy * depth[..., None], depth[..., None]], -1)
    return pts_local.astype(np.float32)


# ---------------------------------------------------------------------------
# Pose ops
# ---------------------------------------------------------------------------

def test_weiszfeld_recovers_focal(rng):
    focal = 47.5
    pts = _synthetic_view(rng, focal=focal)
    got = float(estimate_focal_weiszfeld(jnp.asarray(pts)[None])[0])
    assert abs(got - focal) / focal < 1e-3


def test_weiszfeld_robust_to_outliers(rng):
    focal = 30.0
    pts = _synthetic_view(rng, focal=focal)
    pts[:3, :3] *= 25.0  # corrupt a few pixels
    got = float(estimate_focal_weiszfeld(jnp.asarray(pts)[None])[0])
    assert abs(got - focal) / focal < 0.05


def test_rigid_registration_exact(rng):
    r_gt = _rotmat([0.3, -1.0, 0.2], 0.7)
    t_gt = np.array([0.5, -1.5, 2.0])
    x = rng.standard_normal((200, 3))
    y = x @ r_gt.T + t_gt
    w = rng.random(200) + 0.1
    r, t = rigid_points_registration(jnp.asarray(x, jnp.float32),
                                     jnp.asarray(y, jnp.float32),
                                     jnp.asarray(w, jnp.float32))
    np.testing.assert_allclose(np.asarray(r), r_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)


def test_rigid_registration_weights_ignore_outliers(rng):
    r_gt = _rotmat([0, 0, 1], -0.4)
    t_gt = np.array([1.0, 2.0, -0.5])
    x = rng.standard_normal((100, 3))
    y = x @ r_gt.T + t_gt
    y[:10] += 50.0                      # corrupted correspondences
    w = np.ones(100); w[:10] = 0.0
    r, t = rigid_points_registration(jnp.asarray(x, jnp.float32),
                                     jnp.asarray(y, jnp.float32),
                                     jnp.asarray(w, jnp.float32))
    np.testing.assert_allclose(np.asarray(r), r_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)


def test_geotrf_inv_roundtrip(rng):
    r = _rotmat([1, 2, 3], 1.1)
    t = np.array([0.1, 0.2, 0.3])
    trf = np.asarray(make_c2w(jnp.asarray(r, jnp.float32),
                              jnp.asarray(t, jnp.float32)))
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    back = geotrf(inv_se3(jnp.asarray(trf)), geotrf(jnp.asarray(trf),
                                                    jnp.asarray(pts)))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


# ---------------------------------------------------------------------------
# Postprocess
# ---------------------------------------------------------------------------

def test_postprocess_recovers_camera(rng):
    """Raw head channels built from a known camera must round-trip through
    postprocess to the right focal and c2w."""
    focal = 40.0
    r_gt = _rotmat([0.1, 1.0, -0.3], 0.5)
    t_gt = np.array([2.0, -0.3, 1.2])
    local = _synthetic_view(rng, focal=focal)
    glob = local @ r_gt.T + t_gt
    # invert the NORM_EXP activation to fabricate raw head output
    raw_g = np.asarray(apply_log_to_norm(jnp.asarray(glob)))
    raw_l = np.asarray(apply_log_to_norm(jnp.asarray(local)))
    conf_raw = np.zeros((*local.shape[:2], 1), np.float32)  # conf = 2.0
    pm = np.concatenate([raw_g, raw_l, conf_raw], -1)[None]

    out = postprocess(jnp.asarray(pm), ActivationType.NORM_EXP,
                      compute_cam=True)
    np.testing.assert_allclose(np.asarray(out["conf"]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pts3d"][0]), glob, rtol=1e-4,
                               atol=1e-4)
    assert abs(float(out["focal"][0]) - focal) / focal < 1e-2
    np.testing.assert_allclose(np.asarray(out["c2w"][0, :3, :3]), r_gt,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["c2w"][0, :3, 3]), t_gt,
                               atol=1e-3)


# ---------------------------------------------------------------------------
# Offline pipeline
# ---------------------------------------------------------------------------

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2, mlp_ratio=4.0)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2, mlp_ratio=4.0,
                        feedback=FeedbackType.SINGLE_MLP)


@pytest.fixture(scope="module")
def core():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return InferenceCore(init_encoder(k1, ENC_CFG), init_decoder(k2, DEC_CFG),
                         ENC_CFG, DEC_CFG, dtype=jnp.float32, impl="chunked")


def test_offline_reconstruction_smoke(core, rng):
    imgs = jnp.asarray(rng.standard_normal((5, 32, 32, 3)), jnp.float32)
    out = offline_reconstruction(core, imgs, render_bs=2, encode_bs=2)
    assert out["pts3d"].shape == (5, 32, 32, 3)
    assert out["pts3d_local"].shape == (5, 32, 32, 3)
    assert out["conf"].shape == (5, 32, 32)
    assert out["focal"].shape == (5,)
    assert out["c2w"].shape == (5, 4, 4)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert (np.asarray(out["conf"]) > 1.0).all()


def test_offline_with_refinement_and_subsets(core, rng):
    imgs = jnp.asarray(rng.standard_normal((6, 32, 32, 3)), jnp.float32)
    out, mem = offline_reconstruction(
        core, imgs, mem_views=[0, 1, 2, 3], to_render=[4, 5],
        num_refinement_iterations=1, render_bs=4, return_mem=True)
    assert out["pts3d"].shape == (2, 32, 32, 3)
    assert int(mem.n_imgs) == 4
    n = 4  # tokens per 32x32 view
    assert int(mem.length) == 4 * n
    # refinement must not corrupt label bookkeeping
    lab = np.asarray(mem.labels[0, :4 * n])
    np.testing.assert_array_equal(lab, np.repeat([0, 1, 2, 3], n))
    assert (np.asarray(mem.labels[0, 4 * n:]) == -1).all()


def test_offline_fused_update_run_parity(core, rng):
    """The scan-fused 1-view-batch run (on_update=None) must match the
    per-view update path (forced by passing an on_update callback).
    10 views -> 8 rest views: one full chunk-8 lax.scan + remainder."""
    imgs = jnp.asarray(rng.standard_normal((10, 32, 32, 3)), jnp.float32)
    out_fused = offline_reconstruction(core, imgs, render_bs=3)
    out_per = offline_reconstruction(core, imgs, render_bs=3,
                                     on_update=lambda ids, d: None)
    for k in out_fused:
        np.testing.assert_allclose(np.asarray(out_fused[k]),
                                   np.asarray(out_per[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_refinement_changes_nonref_tokens_only(core, rng):
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    _, mem0 = offline_reconstruction(core, imgs, return_mem=True,
                                     capacity_images=5)
    _, mem1 = offline_reconstruction(core, imgs,
                                     num_refinement_iterations=1,
                                     return_mem=True, capacity_images=5)
    n = 4
    kv0 = np.asarray(mem0.kv)
    kv1 = np.asarray(mem1.kv)
    # image 0 (the reference image) is never refined
    np.testing.assert_allclose(kv1[:, :, :, :n], kv0[:, :, :, :n])
    # other images' tokens must have been refreshed
    assert np.abs(kv1[:, :, :, n:3 * n] - kv0[:, :, :, n:3 * n]).max() > 1e-6


def test_fused_offline_matches_host_loop(core, rng):
    """ONE-program pipeline (make_fused_offline) == the host-loop driver,
    single scene; and n_scenes=2 == two independent single-scene runs."""
    from must3r_tpu.engine import make_fused_offline

    imgs = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)

    run1 = make_fused_offline(core, n_views=4, img_hw=(32, 32))
    ref0 = offline_reconstruction(core, imgs[0], render_bs=4)
    got0 = run1(imgs[0])
    for k in ref0:
        np.testing.assert_allclose(np.asarray(got0[k]), np.asarray(ref0[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)

    runs = make_fused_offline(core, n_views=4, img_hw=(32, 32), n_scenes=2)
    got = runs(imgs)
    ref1 = run1(imgs[1])
    for k in ref0:
        assert np.asarray(got[k]).shape[0] == 2
        np.testing.assert_allclose(np.asarray(got[k][0]),
                                   np.asarray(got0[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(got[k][1]),
                                   np.asarray(ref1[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_fused_offline_dp_mesh_scenes(core, rng):
    """Multi-chip bulk serving: n_scenes sharded over a 4-device 'dp'
    mesh (shard_map, zero cross-device traffic) == the single-device
    batched run."""
    from must3r_tpu.engine import make_fused_offline
    from must3r_tpu.parallel import make_mesh

    imgs = jnp.asarray(rng.standard_normal((8, 3, 32, 32, 3)), jnp.float32)
    run1 = make_fused_offline(core, n_views=3, img_hw=(32, 32), n_scenes=8)
    mesh = make_mesh(4, mp=1)
    rund = make_fused_offline(core, n_views=3, img_hw=(32, 32), n_scenes=8,
                              mesh=mesh)
    want = run1(imgs)
    got = rund(imgs)
    for k in want:
        # focal/c2w go through Weiszfeld IRLS / power iteration on random-
        # weight outputs (focal gold ~3e-3): scheduling-order noise there
        # is not a sharding error
        tol = 1e-5 if k in ("pts3d", "pts3d_local", "conf") else 1e-3
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=tol, atol=tol, err_msg=k)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="divide"):
        make_fused_offline(core, n_views=3, img_hw=(32, 32), n_scenes=6,
                           mesh=mesh)
