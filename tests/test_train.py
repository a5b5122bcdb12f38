"""Training engine tests: loss semantics, full step, 8-device DP mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.engine.losses import conf_regr3d_loss, l21
from must3r_tpu.engine.train import (
    TrainSettings,
    cosine_schedule,
    effective_lr,
    make_loss_fn,
    make_optimizer,
    make_train_step,
    trainable_subset,
)
from must3r_tpu.models import init_decoder, init_encoder
from must3r_tpu.ops.dropout import permanent_dropout_masks, temporary_dropout_mask
from must3r_tpu.ops.patch import patchify_positions
from must3r_tpu.parallel import make_mesh, replicate, shard_batch

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2, mlp_ratio=4.0)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2, mlp_ratio=4.0, causal=True,
                        protected_imgs=1)


def _make_batch(rng, b, v, h=32, w=32):
    hp, wp = h // 16, w // 16
    n = hp * wp
    pos = np.broadcast_to(np.asarray(patchify_positions(hp, wp)),
                          (b, v, n, 2))
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    c2w[..., :3, 3] = rng.standard_normal((b, v, 3))
    return {
        "img": jnp.asarray(rng.standard_normal((b, v, h, w, 3)), jnp.float32),
        "pos": jnp.asarray(pos, jnp.int32),
        "render_ids": jnp.asarray([v - 2, v - 1], jnp.int32),
        "pts3d": jnp.asarray(rng.standard_normal((b, v, h, w, 3)) + 3.0,
                             jnp.float32),
        "camera_pose": jnp.asarray(c2w),
        "valid_mask": jnp.asarray(rng.random((b, v, h, w)) > 0.1),
        "sky_mask": jnp.asarray(rng.random((b, v, h, w)) > 0.95),
        "is_metric_scale": jnp.asarray(rng.random(b) > 0.5),
    }


def _params():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {"encoder": init_encoder(k1, ENC_CFG),
            "decoder": init_decoder(k2, DEC_CFG)}


# ---------------------------------------------------------------------------
# Loss semantics
# ---------------------------------------------------------------------------

def test_loss_zero_when_pred_equals_gt(rng):
    b, v, h, w = 2, 3, 8, 8
    pts = rng.standard_normal((b, v, h, w, 3)).astype(np.float32) + 4.0
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    gt = {
        "pts3d": jnp.asarray(pts),
        "camera_pose": jnp.asarray(c2w),
        "valid_mask": jnp.ones((b, v, h, w), bool),
        "sky_mask": jnp.zeros((b, v, h, w), bool),
        "is_metric_scale": jnp.zeros((b,), bool),
    }
    # identity pose: local == global == world
    factor = np.linalg.norm(pts.reshape(b, -1, 3), axis=-1).mean(1)
    pred = {"pts3d": jnp.asarray(pts), "pts3d_local": jnp.asarray(pts),
            "conf": jnp.full((b, v, h, w), 2.0)}
    loss, details = conf_regr3d_loss(gt, pred, alpha=0.2)
    # perfect regression: pixel loss 0, conf part = -alpha*log(2) per map x2
    want = 2 * (-0.2 * np.log(2.0))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(float(details["Regr3D_pts3d"]), 0.0,
                               atol=1e-6)


def test_loss_sky_pixels_forced(rng):
    b, v, h, w = 1, 1, 4, 4
    pts = np.ones((b, v, h, w, 3), np.float32)
    gt = {
        "pts3d": jnp.asarray(pts),
        "camera_pose": jnp.asarray(
            np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4))),
        "valid_mask": jnp.zeros((b, v, h, w), bool),
        "sky_mask": jnp.ones((b, v, h, w), bool),
        "is_metric_scale": jnp.zeros((b,), bool),
    }
    pred = {"pts3d": jnp.asarray(pts), "pts3d_local": jnp.asarray(pts),
            "conf": jnp.full((b, v, h, w), 2.0)}
    loss, details = conf_regr3d_loss(gt, pred, alpha=0.2, sky_loss_value=2.0)
    np.testing.assert_allclose(float(details["Regr3D_pts3d"]), 2.0,
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Dropout masks
# ---------------------------------------------------------------------------

def test_temporary_dropout_respects_protection():
    key = jax.random.PRNGKey(0)
    m = temporary_dropout_mask(key, 2, 3, 64, p=0.9, protected_tokens=16)
    m = np.asarray(m)
    assert not m[:, :, :16].any()
    assert m[:, :, 16:].mean() > 0.5


def test_permanent_dropout_monotone():
    """Once dead, a token stays masked for all later images."""
    key = jax.random.PRNGKey(1)
    b, g, s = 1, 4, 32
    labels = jnp.zeros((b, s), jnp.int32)  # all pre-existing
    extra, dead = permanent_dropout_masks(key, labels, jnp.int32(1), b, g, s,
                                          p=0.5, protected_tokens=4)
    extra = np.asarray(extra)
    for gi in range(1, g):
        assert (extra[:, gi] | ~extra[:, gi - 1]).all() or \
            (extra[:, gi][extra[:, gi - 1]]).all()
    assert not extra[:, :, :4].any()
    assert not np.asarray(dead)[:, :4].any()


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def test_uniform_scan_matches_unrolled(rng):
    """scan_steps=True runs uniform mem-batch schedules as one lax.scan
    (opt-in: compile-time lever for long schedules); the result must match
    the default unrolled path exactly (dropout off -- the two paths draw
    rng differently)."""
    batch = _make_batch(rng, b=2, v=6)
    key = jax.random.PRNGKey(3)
    losses = {}
    for scan in (False, True):
        ts = TrainSettings(mem_batches=(3, 3), n_render=2, dropout_p=0.0,
                           dtype="float32", scan_steps=scan)
        loss_fn = make_loss_fn(ENC_CFG, DEC_CFG, ts, impl="chunked")
        loss, _ = jax.jit(loss_fn)(_params(), batch, key)
        losses[scan] = float(loss)
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)

    # gradients agree too
    grads = {}
    for scan in (False, True):
        ts = TrainSettings(mem_batches=(3, 3), n_render=2, dropout_p=0.0,
                           dtype="float32", scan_steps=scan)
        loss_fn = make_loss_fn(ENC_CFG, DEC_CFG, ts, impl="chunked")
        g = jax.jit(jax.grad(lambda p, b_, k: loss_fn(p, b_, k)[0]))(
            _params(), batch, key)
        grads[scan] = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(g["decoder"])])
    np.testing.assert_allclose(grads[False], grads[True], rtol=2e-4,
                               atol=1e-7)


def test_train_step_decreases_loss(rng):
    ts = TrainSettings(mem_batches=(2, 2), n_render=2, dropout_p=0.1)
    params = _params()
    sched = cosine_schedule(1e-3, warmup_steps=1, total_steps=50)
    opt = make_optimizer(sched, weight_decay=0.0)
    step = make_train_step(ENC_CFG, DEC_CFG, ts, opt, impl="chunked")
    opt_state = opt.init(trainable_subset(params, ts))
    batch = _make_batch(rng, b=2, v=4)
    key = jax.random.PRNGKey(0)
    losses = []
    dec0 = jax.tree.leaves(params["decoder"])[0].copy()
    enc0 = jax.tree.leaves(params["encoder"])[0].copy()
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, loss, details = step(params, opt_state, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # frozen encoder unchanged, decoder moved
    np.testing.assert_array_equal(np.asarray(
        jax.tree.leaves(params["encoder"])[0]), np.asarray(enc0))
    assert np.abs(np.asarray(
        jax.tree.leaves(params["decoder"])[0]) - np.asarray(dec0)).max() > 0


def test_train_step_on_dp_mesh(rng):
    """Full step on an 8-device ('dp','mp') mesh -- grads psummed by GSPMD."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8, mp=1)
    ts = TrainSettings(mem_batches=(2, 1), n_render=1)
    params = _params()
    opt = make_optimizer(cosine_schedule(1e-3, 1, 50), weight_decay=0.0)
    step = make_train_step(ENC_CFG, DEC_CFG, ts, opt, impl="chunked",
                           donate=False)
    opt_state = opt.init(trainable_subset(params, ts))
    batch = _make_batch(rng, b=8, v=3)
    batch["render_ids"] = jnp.asarray([2], jnp.int32)

    with mesh:
        params_r = replicate(mesh, params)
        opt_r = replicate(mesh, opt_state)
        batch_s = shard_batch(mesh, {k: v for k, v in batch.items()
                                     if k != "render_ids"})
        batch_s["render_ids"] = batch["render_ids"]
        p2, o2, loss, details = step(params_r, opt_r, batch_s,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    # must equal the single-device step result (same data, same seed)
    p1, o1, loss1, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-4)


def test_effective_lr():
    assert effective_lr(1e-4, 32, n_devices=8, accum=1) == 1e-4 * 256 / 256


def test_layer_decay_scales_block_updates():
    """scale_by_layer_decay: deeper blocks keep larger updates."""
    from must3r_tpu.engine.train import scale_by_layer_decay

    params = {"encoder": {
        "blocks": {"w": jnp.ones((4, 2, 2))},
        "patch_embed": {"w": jnp.ones((2, 2))},
        "norm": {"scale": jnp.ones((2,))},
    }}
    tx = scale_by_layer_decay(0.5)
    state = tx.init(params)
    upd, _ = tx.update(params, state)
    w = np.asarray(upd["encoder"]["blocks"]["w"])
    # layer l scaled by 0.5^(4-l): deepest block (l=3) -> 0.5
    np.testing.assert_allclose(w[3], 0.5 * np.ones((2, 2)))
    np.testing.assert_allclose(w[0], 0.0625 * np.ones((2, 2)))
    # embeddings get decay^(depth+1), final norm unscaled
    np.testing.assert_allclose(
        np.asarray(upd["encoder"]["patch_embed"]["w"]), 0.5 ** 5)
    np.testing.assert_allclose(np.asarray(upd["encoder"]["norm"]["scale"]),
                               1.0)


def test_pose_metrics_perfect_and_noisy(rng):
    from must3r_tpu.engine.evaluate import pose_metrics

    v = 5
    poses = np.tile(np.eye(4), (v, 1, 1))
    for i in range(v):
        a = 0.4 * i
        poses[i, :3, :3] = np.asarray(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]])
        poses[i, :3, 3] = [i, 0.5 * i, 0]
    out = pose_metrics(poses, poses)
    assert out["rra@5"] == 1.0 and out["rta@5"] == 1.0
    assert out["auc@30"] > 95.0
    bad = poses.copy()
    bad[:, :3, 3] = rng.standard_normal((v, 3)) * 5
    out2 = pose_metrics(bad, poses)
    assert out2["auc@30"] < out["auc@30"]


# ---------------------------------------------------------------------------
# Schedule selection (reference select_batch flags)
# ---------------------------------------------------------------------------

def test_schedule_max_render_count_and_disable():
    from must3r_tpu.engine.loop import select_schedule
    g = np.random.default_rng(0)
    sched = select_schedule(g, nimgs=8, memory_num_views=8,
                            min_memory_num_views=2, progress=0.5,
                            causal=True, memory_batch_views=4,
                            render_once=False, sample_memory_num_views=8,
                            max_render_count=2)
    assert len(sched.render_ids) == 2
    sched = select_schedule(g, nimgs=8, memory_num_views=8,
                            min_memory_num_views=2, progress=0.5,
                            causal=True, memory_batch_views=4,
                            render_once=False, sample_memory_num_views=8,
                            disable_render=True)
    assert sched.render_ids == ()


def test_schedule_random_blocks_pow2():
    """Non-causal randomized grouping: blocks sum to the view count and
    sizes come from the power-of-two alphabet (bounded compile set)."""
    from must3r_tpu.engine.loop import select_schedule
    g = np.random.default_rng(1)
    sizes = set()
    for _ in range(20):
        sched = select_schedule(g, nimgs=9, memory_num_views=9,
                                min_memory_num_views=2, progress=0.0,
                                causal=False, memory_batch_views=6,
                                render_once=False,
                                sample_memory_num_views=9,
                                random_blocks=True)
        assert sum(sched.mem_batches) == sched.n_views
        sizes.update(sched.mem_batches)
    assert sizes <= {1, 2, 4}
    assert len(sizes) > 1            # actually randomized


@pytest.mark.slow
def test_forward_no_render_loss(rng):
    """disable_render: n_render=0 computes the loss over first-pass views
    only and still trains."""
    from must3r_tpu.engine.train import make_loss_fn
    ts = TrainSettings(mem_batches=(2, 2), n_render=0, dropout_p=0.0,
                       dtype="float32")
    batch = _make_batch(rng, b=1, v=4)
    batch["render_ids"] = jnp.zeros((0,), jnp.int32)
    loss_fn = make_loss_fn(ENC_CFG, DEC_CFG, ts, impl="chunked")
    loss, details = jax.jit(loss_fn)(_params(), batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0))[0])(
        _params())
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(
        g["decoder"]))
    assert gn > 0


def test_trainer_async_save_surfaces_write_errors(tmp_path):
    """A failing background checkpoint write must raise at the next
    wait_for_save, not vanish silently."""
    from must3r_tpu.engine.loop import Trainer

    t = Trainer.__new__(Trainer)     # only the async-join plumbing
    t._save_exc = RuntimeError("disk full")
    t._save_thread = None
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="disk full"):
        t.wait_for_save()
    # cleared after raising -- a later join must not re-raise
    t.wait_for_save()
