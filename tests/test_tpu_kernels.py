"""Pallas kernel numerics on REAL TPU hardware.

The regular suite runs on CPU (kernels in interpret mode). These tests
execute the compiled Mosaic kernels and are skipped unless a TPU backend
is present: run `python -m pytest tests/test_tpu_kernels.py --no-header`
on a TPU VM (conftest's CPU forcing is overridden via JAX_REAL_TPU=1).
"""

import os

import numpy as np
import pytest

if not os.environ.get("JAX_REAL_TPU"):
    pytest.skip("set JAX_REAL_TPU=1 on a TPU VM to run kernel checks",
                allow_module_level=True)

import jax
import jax.numpy as jnp

from must3r_tpu.ops.attention import (
    INT32_MAX,
    memory_cross_attention,
    pack_kv,
    self_attention,
)

rng = np.random.default_rng(0)


def test_sa_pallas_matches_chunked_bf16():
    b, n, h, dh = 2, 768, 12, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, dh)),
                           jnp.bfloat16) for _ in range(3))
    got = self_attention(q, k, v, impl="pallas")
    want = self_attention(q, k, v, impl="chunked")
    err = float(jnp.abs(got.astype(jnp.float32)
                        - want.astype(jnp.float32)).max())
    assert err < 0.05, err          # bf16 PV rounding tolerance


@pytest.mark.parametrize("b", [1, 4])
def test_ca_pallas_matches_chunked_with_masks(b):
    g, n, h, dh, s = 3, 768, 12, 64, 2048
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)), jnp.bfloat16)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :1536] = rng.integers(0, 4, size=(b, 1536))
    labels = jnp.asarray(labels)
    q_self = jnp.broadcast_to(jnp.asarray([[0, 2, -2]], jnp.int32), (b, g))
    q_upper = jnp.broadcast_to(
        jnp.asarray([[INT32_MAX, 3, INT32_MAX]], jnp.int32), (b, g))
    got = memory_cross_attention(q, kv, labels, q_self=q_self,
                                 q_upper=q_upper, kv_len=jnp.int32(1536),
                                 impl="pallas")
    want = memory_cross_attention(q, kv, labels, q_self=q_self,
                                  q_upper=q_upper, impl="chunked")
    err = float(jnp.abs(got.astype(jnp.float32)
                        - want.astype(jnp.float32)).max())
    assert err < 0.05, err


def test_ca_pallas_dynamic_kv_len():
    """Compute must stop at the fill level: corrupting the tail must not
    change results when kv_len masks it."""
    b, g, n, h, dh, s = 1, 1, 256, 4, 64, 1024
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)), jnp.bfloat16)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :512] = 0
    labels = jnp.asarray(labels)
    a = memory_cross_attention(q, kv, labels, kv_len=jnp.int32(512),
                               impl="pallas")
    kv2 = kv.at[:, :, 512:].set(1e4)
    b_ = memory_cross_attention(q, kv2, labels, kv_len=jnp.int32(512),
                                impl="pallas")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_hybrid_grad_runs_on_tpu():
    b, n, h, dh = 1, 256, 4, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, dh)),
                           jnp.float32) for _ in range(3))

    def f(q, k, v):
        return jnp.sum(self_attention(q, k, v, impl="pallas") ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_full_decoder_pallas_vs_xla_on_tpu():
    """Integration: several update steps + batched render through the real
    kernels must match the pure-XLA path end-to-end (bf16 tolerance).
    Catches kernel/driver integration bugs that per-op tests can miss."""
    from must3r_tpu.config import DecoderConfig, FeedbackType
    from must3r_tpu.memory import init_memory
    from must3r_tpu.models import decoder_render, decoder_update, init_decoder

    cfg = DecoderConfig(img_size=(128, 128), enc_embed_dim=192,
                        patch_size=16, embed_dim=192, output_dim=16 * 16 * 7,
                        depth=3, num_heads=3,
                        feedback=FeedbackType.SINGLE_MLP)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    b, n = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 5, n, 192),
                          jnp.float32) * 0.5
    from must3r_tpu.ops.patch import patchify_positions
    pos1 = jnp.broadcast_to(jnp.asarray(patchify_positions(8, 8)),
                            (b, 5, n, 2))

    outs = {}
    for impl in ("pallas", "chunked"):
        mem = init_memory(cfg.depth, b, cfg.num_heads, cfg.head_dim, 1024,
                          dtype=jnp.bfloat16)
        mem, _ = decoder_update(params, cfg, mem, x[:, :2], pos1[:, :2],
                                causal=False, impl=impl)
        mem, _ = decoder_update(params, cfg, mem, x[:, 2:3], pos1[:, 2:3],
                                causal=False, impl=impl)
        toks = decoder_render(params, cfg, mem, x, pos1, impl=impl)
        outs[impl] = np.asarray(toks.astype(jnp.float32))
    err = np.abs(outs["pallas"] - outs["chunked"]).max()
    assert err < 0.1, err   # bf16 accumulation-order tolerance


def test_ca_flash_backward_matches_chunked_on_tpu():
    """Compiled flash-backward kernels (dQ + dK/dV) vs the XLA chunked
    VJP on hardware, bf16 inputs, flagship head_dim."""
    from must3r_tpu.ops.attention import (
        INT32_MAX,
        _ca_chunked_from_packed,
        memory_cross_attention,
    )

    b, g, n, h, dh, s = 1, 2, 196, 4, 64, 1024
    live = 800
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.bfloat16)
    kv5 = jnp.asarray(rng.standard_normal((2, b, h, s, 2 * dh)),
                      jnp.bfloat16)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :live] = rng.integers(0, 4, size=(b, live))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[1, -2]], jnp.int32)
    q_upper = jnp.asarray([[3, INT32_MAX]], jnp.int32)
    layer = jnp.int32(1)

    def f_pallas(q_, kv_):
        o = memory_cross_attention(q_, kv_, labels, q_self=q_self,
                                   q_upper=q_upper,
                                   kv_len=jnp.int32(live), layer=layer,
                                   impl="pallas")
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def f_chunked(q_, kv_):
        o = _ca_chunked_from_packed(q_, kv_, labels, q_self, q_upper,
                                    layer)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    dq_p, dkv_p = jax.jit(jax.grad(f_pallas, argnums=(0, 1)))(q, kv5)
    dq_c, dkv_c = jax.jit(jax.grad(f_chunked, argnums=(0, 1)))(q, kv5)
    np.testing.assert_allclose(np.asarray(dq_p, np.float32),
                               np.asarray(dq_c, np.float32),
                               rtol=0.1, atol=0.02)
    np.testing.assert_allclose(np.asarray(dkv_p, np.float32),
                               np.asarray(dkv_c, np.float32),
                               rtol=0.1, atol=0.02)
    # cosine similarity is the meaningful bf16 metric
    for a, b_ in ((dq_p, dq_c), (dkv_p, dkv_c)):
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b_, np.float32).ravel()
        cos = af @ bf / max(np.linalg.norm(af) * np.linalg.norm(bf), 1e-12)
        assert cos > 0.999, cos


@pytest.mark.parametrize("quant", ["fp8", "int8"])
def test_ca_pallas_quantized_cache_on_tpu(quant):
    """8-bit KV cache with in-flight dequant (Mosaic fp8/int8 VMEM loads +
    scale folding) vs dequantize-then-attend on hardware."""
    from must3r_tpu.memory import QUANT_DTYPES, dequantize_kv, quantize_kv
    from must3r_tpu.ops.attention import INT32_MAX, memory_cross_attention

    b, g, n, h, dh, s = 1, 2, 768, 12, 64, 2048
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, h, s, 2 * dh)) * 2,
                     jnp.float32)
    kv_q, scales = quantize_kv(kv, QUANT_DTYPES[quant][0])
    labels = np.full((b, s), -1, np.int32)
    labels[:, :1536] = rng.integers(0, 4, size=(b, 1536))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[0, -2]], jnp.int32)
    q_upper = jnp.asarray([[INT32_MAX, 3]], jnp.int32)
    got = memory_cross_attention(q, kv_q, labels, q_self=q_self,
                                 q_upper=q_upper, kv_len=jnp.int32(1536),
                                 impl="pallas", kv_scale=scales)
    want = memory_cross_attention(
        q, dequantize_kv(kv_q, scales, jnp.bfloat16), labels,
        q_self=q_self, q_upper=q_upper, kv_len=jnp.int32(1536),
        impl="chunked")
    err = float(jnp.abs(got.astype(jnp.float32)
                        - want.astype(jnp.float32)).max())
    assert err < 0.05, err
