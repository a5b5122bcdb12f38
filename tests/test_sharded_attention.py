"""Sequence-parallel memory cross-attention on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from must3r_tpu.memory import init_memory
from must3r_tpu.ops.attention import INT32_MAX, memory_cross_attention, pack_kv
from must3r_tpu.parallel.sharded_attention import (
    shard_memory,
    sharded_memory_cross_attention,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    import numpy as np

    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("sp",))


def test_sharded_ca_matches_unsharded(mesh, rng):
    b, g, n, h, dh, s = 1, 2, 8, 2, 16, 64
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    kv = pack_kv(k, v)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :40] = rng.integers(0, 5, size=(b, 40))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[1, -2]], jnp.int32)
    q_upper = jnp.asarray([[4, INT32_MAX]], jnp.int32)

    want = memory_cross_attention(q, kv, labels, q_self=q_self,
                                  q_upper=q_upper, impl="chunked")
    with mesh:
        got = sharded_memory_cross_attention(mesh, q, kv, labels, q_self,
                                             q_upper)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_sharded_ca_handles_empty_shards(mesh, rng):
    """Shards whose slots are all invalid must not poison the combine."""
    b, g, n, h, dh, s = 1, 1, 4, 1, 8, 64
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)), jnp.float32)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :8] = 0           # only the first shard has live tokens
    labels = jnp.asarray(labels)
    want = memory_cross_attention(q, kv, labels, impl="chunked")
    with mesh:
        got = sharded_memory_cross_attention(mesh, q, kv, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
    assert np.isfinite(np.asarray(got)).all()


def test_shard_memory_placement(mesh):
    mem = init_memory(depth=2, batch=1, num_heads=2, head_dim=8,
                      capacity=64, dtype=jnp.float32)
    with mesh:
        smem = shard_memory(mesh, mem)
    # token axis sharded 8-ways
    shard_shapes = {sh.data.shape for sh in smem.kv.addressable_shards}
    assert shard_shapes == {(2, 1, 2, 8, 16)}
    lab_shapes = {sh.data.shape for sh in smem.labels.addressable_shards}
    assert lab_shapes == {(1, 8)}


def test_sharded_inference_core_offline_matches_unsharded(rng):
    """End-to-end serving with a memory sharded over 'sp' (SURVEY §5.7):
    offline reconstruction through InferenceCore(mesh=...) must match the
    unsharded pipeline. The ('dp','sp') mesh is the production layout."""
    from must3r_tpu.config import DecoderConfig, EncoderConfig
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.inference import offline_reconstruction
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.parallel import make_mesh

    mesh2 = make_mesh(8, mp=4, axis_names=("dp", "sp"))
    hw = (32, 32)
    enc_cfg = EncoderConfig(img_size=hw, patch_size=16, embed_dim=64,
                            depth=2, num_heads=2)
    dec_cfg = DecoderConfig(img_size=hw, enc_embed_dim=64, patch_size=16,
                            embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                            num_heads=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc_p, dec_p = init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg)
    imgs = jnp.asarray(rng.standard_normal((4, *hw, 3)), jnp.float32)

    base = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg, dtype=jnp.float32,
                         impl="chunked")
    want = offline_reconstruction(base, imgs, img_hw=hw, compute_cam=True,
                                  num_refinement_iterations=1)

    with mesh2:
        core = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg,
                             dtype=jnp.float32, impl="chunked", mesh=mesh2)
        got = offline_reconstruction(core, imgs, img_hw=hw,
                                     compute_cam=True,
                                     num_refinement_iterations=1)
    for key in ("pts3d", "pts3d_local", "conf"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]), rtol=2e-4,
                                   atol=2e-4)


def test_sharded_window_write_matches_dus(mesh, rng):
    """sharded_window_write == plain dynamic_update_slice for windows that
    sit inside one shard, straddle shard boundaries, start at 0, and end
    flush with capacity."""
    from must3r_tpu.parallel.sharded_attention import sharded_window_write

    s_cap, t = 64, 8          # 8 shards x 8 local rows, window == s_loc
    buf = jnp.asarray(rng.standard_normal((2, s_cap, 3)), jnp.float32)
    new = jnp.asarray(rng.standard_normal((2, t, 3)), jnp.float32)
    sharded = jax.device_put(
        buf, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            None, "sp", None)))
    for start in (0, 3, 8, 13, 29, 56):
        want = jax.lax.dynamic_update_slice(buf, new, (0, start, 0))
        with mesh:
            got = sharded_window_write(mesh, sharded, new,
                                       jnp.int32(start), token_axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # int32 labels layout [B, S]
    lab = jnp.zeros((1, s_cap), jnp.int32) - 1
    newlab = jnp.arange(t, dtype=jnp.int32)[None]
    lab_sh = jax.device_put(lab, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "sp")))
    for start in (0, 5, 30, 56):
        want = jax.lax.dynamic_update_slice(lab, newlab, (0, start))
        with mesh:
            got = sharded_window_write(mesh, lab_sh, newlab,
                                       jnp.int32(start), token_axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_ca_extra_source_matches_concat(mesh, rng):
    """extra_kv LSE merge == unsharded CA over the concatenated sources."""
    b, g, n, h, dh, s, t = 1, 2, 8, 2, 16, 64, 16
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)), jnp.float32)
    ekv = jnp.asarray(rng.standard_normal((b, h, t, 2 * dh)), jnp.float32)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :40] = rng.integers(0, 5, size=(b, 40))
    labels = jnp.asarray(labels)
    elabels = jnp.asarray(rng.integers(5, 7, size=(b, t)), jnp.int32)
    q_self = jnp.asarray([[5, -2]], jnp.int32)
    q_upper = jnp.asarray([[6, INT32_MAX]], jnp.int32)

    # reference: one unsharded CA over [memory | new] with merged labels
    kv_cat = jnp.concatenate([kv, ekv], axis=2)
    lab_cat = jnp.concatenate([labels, elabels], axis=1)
    want = memory_cross_attention(q, kv_cat, lab_cat, q_self=q_self,
                                  q_upper=q_upper, impl="chunked")
    with mesh:
        got = sharded_memory_cross_attention(
            mesh, q, kv, labels, q_self, q_upper, extra_kv=ekv,
            extra_labels=elabels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_sharded_ca_quantized_matches_unsharded_quantized(mesh, rng):
    """int8 cache x sp sharding: each shard dequantizes only its local
    slice; the merged result must equal the unsharded quantized read."""
    from must3r_tpu.memory import quantize_kv

    b, g, n, h, dh, s = 1, 2, 8, 2, 16, 64
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv_f = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)), jnp.float32)
    kv_q, scale = quantize_kv(kv_f, jnp.int8)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :48] = rng.integers(0, 5, size=(b, 48))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[1, -2]], jnp.int32)
    q_upper = jnp.asarray([[4, INT32_MAX]], jnp.int32)

    want = memory_cross_attention(q, kv_q, labels, q_self=q_self,
                                  q_upper=q_upper, impl="chunked",
                                  kv_scale=scale)
    with mesh:
        skv = jax.device_put(kv_q, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, None, "sp", None)))
        sscale = jax.device_put(scale, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, None, None, "sp")))
        slab = jax.device_put(labels, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "sp")))
        got = sharded_memory_cross_attention(mesh, q, skv, slab, q_self,
                                             q_upper, kv_scale=sscale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_shard_memory_shards_quant_scales(mesh):
    mem = init_memory(depth=2, batch=1, num_heads=2, head_dim=8,
                      capacity=64, dtype=jnp.int8)
    with mesh:
        smem = shard_memory(mesh, mem)
    shard_shapes = {sh.data.shape for sh in smem.kv_scale.addressable_shards}
    assert shard_shapes == {(2, 1, 2, 2, 8)}


def test_sharded_quantized_offline_matches_unsharded_quantized(rng):
    """SURVEY 5.7's two capacity levers COMPOSED: offline reconstruction
    with an int8 cache sharded over 'sp' tracks the unsharded int8 run.
    (Not bit-equal: the sharded update attends a step's new tokens at full
    precision as the extra-KV side source, the unsharded one reads them
    already quantized -- the sharded path is the *more* accurate of the
    two, so both are compared against the full-precision pipeline.)"""
    from must3r_tpu.config import DecoderConfig, EncoderConfig
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.inference import offline_reconstruction
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.parallel import make_mesh

    mesh2 = make_mesh(8, mp=4, axis_names=("dp", "sp"))
    hw = (32, 32)
    enc_cfg = EncoderConfig(img_size=hw, patch_size=16, embed_dim=64,
                            depth=2, num_heads=2)
    dec_cfg = DecoderConfig(img_size=hw, enc_embed_dim=64, patch_size=16,
                            embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                            num_heads=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc_p, dec_p = init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg)
    imgs = jnp.asarray(rng.standard_normal((4, *hw, 3)), jnp.float32)

    outs = {}
    full = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg, dtype=jnp.float32,
                         impl="chunked")
    outs["full"] = offline_reconstruction(full, imgs, img_hw=hw,
                                          num_refinement_iterations=1)
    uq = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg, dtype=jnp.float32,
                       impl="chunked", kv_quant="int8")
    outs["uq"] = offline_reconstruction(uq, imgs, img_hw=hw,
                                        num_refinement_iterations=1)
    with mesh2:
        sq = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg,
                           dtype=jnp.float32, impl="chunked", mesh=mesh2,
                           kv_quant="int8")
        outs["sq"] = offline_reconstruction(sq, imgs, img_hw=hw,
                                            num_refinement_iterations=1)
    a = np.asarray(outs["full"]["pts3d"]).ravel()
    for name in ("uq", "sq"):
        q_ = np.asarray(outs[name]["pts3d"]).ravel()
        assert np.isfinite(q_).all(), name
        cos = float(np.dot(a, q_) / (np.linalg.norm(a) * np.linalg.norm(q_)))
        assert cos > 0.99, (name, cos)
