"""Quantized (8-bit) KV-cache tests: per-token quantization bounds, memory
ops carrying scales, kernel in-flight dequant parity, and an end-to-end
update/render pass against the bf16 cache.

The quantized cache is a serving capacity lever (SURVEY §5.7): the
reference bounds memory algorithmically (keyframe subsampling, eviction);
we additionally halve bytes/token so one chip holds ~2x the keyframes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.memory import (
    INT32_MAX,
    append_tokens,
    commit_images,
    compact,
    dequantize_kv,
    evict_label,
    init_memory,
    quantize_kv,
    update_label_tokens,
)
from must3r_tpu.models import (
    decoder_render,
    decoder_update,
    init_decoder,
    init_encoder,
)
from must3r_tpu.ops.attention import (
    _ca_pallas,
    memory_cross_attention,
    pack_kv,
)
from must3r_tpu.ops.patch import patchify_positions

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2, mlp_ratio=4.0)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=48, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2, mlp_ratio=4.0,
                        feedback=FeedbackType.SINGLE_MLP)


# ---------------------------------------------------------------------------
# Quantize / dequantize
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype,tol", [(jnp.float8_e4m3fn, 0.07),
                                       (jnp.int8, 0.005)])
def test_quant_roundtrip_bounds(rng, dtype, tol):
    """Per-token quantization error is bounded relative to each token's
    amax (fp8 e4m3: ~2^-4; int8: ~1/254)."""
    x = jnp.asarray(rng.standard_normal((2, 1, 2, 8, 16)) * 5, jnp.float32)
    q, s = quantize_kv(x, dtype)
    assert q.dtype == dtype and s.shape == (2, 1, 2, 2, 8)
    deq = dequantize_kv(q, s, jnp.float32)
    for half in (slice(0, 8), slice(8, 16)):
        err = np.abs(np.asarray(deq[..., half] - x[..., half]))
        amax = np.abs(np.asarray(x[..., half])).max(-1, keepdims=True)
        assert (err <= tol * amax + 1e-6).all()


def test_quant_handles_zero_rows(rng):
    x = jnp.zeros((1, 1, 1, 4, 8), jnp.float32)
    q, s = quantize_kv(x, jnp.float8_e4m3fn)
    deq = dequantize_kv(q, s, jnp.float32)
    assert np.isfinite(np.asarray(deq)).all()
    np.testing.assert_array_equal(np.asarray(deq), 0.0)


# ---------------------------------------------------------------------------
# Memory ops carry scales
# ---------------------------------------------------------------------------

L, B, H, DH, CAP = 2, 1, 2, 8, 32


def test_memory_ops_quantized(rng):
    mem = init_memory(L, B, H, DH, CAP, dtype=jnp.int8)
    assert mem.kv_scale is not None
    kv0 = jnp.asarray(rng.standard_normal((L, B, H, 4, 2 * DH)), jnp.float32)
    kv1 = jnp.asarray(rng.standard_normal((L, B, H, 4, 2 * DH)) * 3,
                      jnp.float32)
    mem = append_tokens(mem, kv0, jnp.zeros((B, 4), jnp.int32))
    mem = commit_images(mem, 1, tokens_per_img=4)
    mem = append_tokens(mem, kv1, jnp.ones((B, 4), jnp.int32))
    mem = commit_images(mem, 1, tokens_per_img=4)

    def stored(mem, sl):
        return np.asarray(dequantize_kv(mem.kv[:, :, :, sl],
                                        mem.kv_scale[..., sl], jnp.float32))

    np.testing.assert_allclose(stored(mem, slice(0, 4)), np.asarray(kv0),
                               atol=0.05)
    # update-in-place requantizes
    kv0b = kv0 * 0.5 + 1.0
    mem_u = update_label_tokens(mem, 0, kv0b, jnp.zeros((B, 4), jnp.int32))
    np.testing.assert_allclose(stored(mem_u, slice(0, 4)), np.asarray(kv0b),
                               atol=0.05)
    # evict + compact moves values AND scales together
    mem_c = compact(evict_label(mem, 0))
    assert int(mem_c.length) == 4
    np.testing.assert_allclose(stored(mem_c, slice(0, 4)), np.asarray(kv1),
                               atol=0.15)


# ---------------------------------------------------------------------------
# Kernel in-flight dequant
# ---------------------------------------------------------------------------

def _ca_dequant_reference(q, kv_q, scales, labels, q_self, q_upper, kv_len):
    kv_deq = dequantize_kv(kv_q, scales, jnp.float32)
    return memory_cross_attention(q, kv_deq, labels, q_self=q_self,
                                  q_upper=q_upper, kv_len=kv_len,
                                  impl="chunked")


@pytest.mark.parametrize("dtype", [jnp.float8_e4m3fn, jnp.int8])
def test_ca_pallas_quant_interpret_matches(rng, dtype):
    """The kernel's in-flight dequant (k scale folded into score columns,
    v scale into probability columns) == dequantize-then-attend."""
    b, g, n, h, dh, s = 1, 2, 16, 2, 32, 64
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)) * 2, jnp.float32)
    kv_q, scales = quantize_kv(kv, dtype)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :40] = rng.integers(0, 4, size=(b, 40))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[1, -2]], jnp.int32)
    q_upper = jnp.asarray([[3, INT32_MAX]], jnp.int32)
    want = _ca_dequant_reference(q, kv_q, scales, labels, q_self, q_upper,
                                 jnp.int32(40))
    got = _ca_pallas(q, kv_q, labels, q_self, q_upper, jnp.int32(40),
                     block_k=16, interpret=True, kv_scales=scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_ca_pallas_quant_return_stats_interpret(rng):
    """kv_scales + return_stats compose (the sharded CA's per-shard call,
    parallel/sharded_attention.py): the out/lse pair from the quantized
    kernel must renormalize to the dequantize-then-attend result."""
    b, g, n, h, dh, s = 1, 1, 16, 2, 32, 64
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)) * 2, jnp.float32)
    kv_q, scales = quantize_kv(kv, jnp.int8)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :48] = rng.integers(0, 4, size=(b, 48))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[-2]], jnp.int32)
    q_upper = jnp.asarray([[INT32_MAX]], jnp.int32)
    want = _ca_dequant_reference(q, kv_q, scales, labels, q_self, q_upper,
                                 jnp.int32(48))
    out, lse = _ca_pallas(q, kv_q, labels, q_self, q_upper, jnp.int32(48),
                          block_k=16, interpret=True, kv_scales=scales,
                          return_stats=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert np.isfinite(np.asarray(lse)).all()


def test_ca_pallas_quant_layer_indexed(rng):
    """5D quantized cache + in-kernel layer select (serving layout)."""
    l_, b, g, n, h, dh, s = 3, 1, 1, 8, 1, 32, 32
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((l_, b, h, s, 2 * dh)),
                     jnp.float32)
    kv_q, scales = quantize_kv(kv, jnp.int8)
    labels = jnp.zeros((b, s), jnp.int32)
    qs = jnp.full((b, g), -2, jnp.int32)
    qu = jnp.full((b, g), INT32_MAX, jnp.int32)
    for li in range(l_):
        want = _ca_dequant_reference(q, kv_q[li], scales[li], labels, qs, qu,
                                     jnp.int32(s))
        got = _ca_pallas(q, kv_q, labels, qs, qu, jnp.int32(s),
                         layer=jnp.int32(li), block_k=16, interpret=True,
                         kv_scales=scales)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# End-to-end: quantized update/render tracks the bf16 pipeline
# ---------------------------------------------------------------------------

def _positions(b, g):
    hp = ENC_CFG.img_size[0] // ENC_CFG.patch_size
    wp = ENC_CFG.img_size[1] // ENC_CFG.patch_size
    pos = patchify_positions(hp, wp)
    return jnp.broadcast_to(pos[None], (b, g, pos.shape[0], 2))


@pytest.mark.parametrize("quant", ["fp8", "int8"])
def test_update_render_quantized_close_to_fp32(rng, quant):
    """Two updates + a render with the 8-bit cache stay close to the
    full-precision pipeline (cosine > 0.99 on render tokens)."""
    from must3r_tpu.memory import QUANT_DTYPES
    b, g, n = 1, 2, 4
    key = jax.random.PRNGKey(0)
    params = init_decoder(key, DEC_CFG)
    x1 = jnp.asarray(rng.standard_normal((b, g, n, 64)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((b, 1, n, 64)), jnp.float32)
    pos1, pos2 = _positions(b, g), _positions(b, 1)

    outs = {}
    for name, dt in [("full", jnp.float32),
                     ("q", QUANT_DTYPES[quant][0])]:
        mem = init_memory(DEC_CFG.depth, b, DEC_CFG.num_heads,
                          DEC_CFG.head_dim, 32, dtype=dt)
        mem, _ = decoder_update(params, DEC_CFG, mem, x1, pos1,
                                causal=False, dtype=jnp.float32,
                                impl="chunked")
        mem, _ = decoder_update(params, DEC_CFG, mem, x2, pos2,
                                causal=False, dtype=jnp.float32,
                                impl="chunked")
        outs[name] = np.asarray(
            decoder_render(params, DEC_CFG, mem, x1, pos1,
                           dtype=jnp.float32, impl="chunked"))
    a, q_ = outs["full"].ravel(), outs["q"].ravel()
    cos = float(np.dot(a, q_) / (np.linalg.norm(a) * np.linalg.norm(q_)))
    assert cos > 0.99, cos


def test_offline_reconstruction_quantized(rng):
    """Full offline pipeline (incl. refinement) with the int8 cache tracks
    the fp32-cache pipeline: finite outputs, pointmaps close."""
    from must3r_tpu.engine.inference import (InferenceCore,
                                             offline_reconstruction)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc_p = init_encoder(k1, ENC_CFG)
    dec_p = init_decoder(k2, DEC_CFG)
    imgs = jnp.asarray(rng.standard_normal((5, 32, 32, 3)), jnp.float32)
    outs = {}
    for name, kq in [("full", None), ("q", "int8")]:
        core = InferenceCore(enc_p, dec_p, ENC_CFG, DEC_CFG,
                             dtype=jnp.float32, impl="chunked", kv_quant=kq)
        outs[name] = offline_reconstruction(core, imgs, render_bs=2,
                                            encode_bs=2,
                                            num_refinement_iterations=1)
    for k in ("pts3d", "pts3d_local", "conf"):
        a = np.asarray(outs["full"][k]).ravel()
        q_ = np.asarray(outs["q"][k]).ravel()
        assert np.isfinite(q_).all(), k
        cos = float(np.dot(a, q_) / (np.linalg.norm(a) * np.linalg.norm(q_)))
        assert cos > 0.99, (k, cos)


def test_inference_core_quant_capacity():
    """InferenceCore(kv_quant=...) allocates an 8-bit cache with scales."""
    from must3r_tpu.engine.inference import InferenceCore
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc_p = init_encoder(k1, ENC_CFG)
    dec_p = init_decoder(k2, DEC_CFG)
    core = InferenceCore(enc_p, dec_p, ENC_CFG, DEC_CFG,
                         dtype=jnp.float32, impl="chunked",
                         kv_quant="int8")
    mem = core.new_memory(4, (32, 32), block=8)
    assert mem.kv.dtype == jnp.int8
    assert mem.kv_scale is not None
    assert mem.kv.itemsize == 1
