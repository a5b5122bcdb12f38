"""Model tests: shapes, torch numerical parity, causal==sequential property.

The torch cross-checks build plain torch modules with the same weights --
no reference code imported -- and pin down the conventions a checkpoint
converter depends on (LN eps/order, erf-GELU, qkv packing, RoPE layout).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType, RoPEConfig
from must3r_tpu.memory import init_memory, round_capacity
from must3r_tpu.models import (
    decoder_head,
    decoder_render,
    decoder_update,
    encoder_forward,
    init_decoder,
    init_encoder,
)
from must3r_tpu.models.layers import (
    encoder_block,
    init_encoder_block,
)
from must3r_tpu.ops.patch import patchify_positions
from must3r_tpu.ops.rope import make_rope_tables

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2, mlp_ratio=4.0)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=48, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2, mlp_ratio=4.0,
                        feedback=FeedbackType.SINGLE_MLP)


def _positions(b, g=None):
    hp = ENC_CFG.img_size[0] // ENC_CFG.patch_size
    wp = ENC_CFG.img_size[1] // ENC_CFG.patch_size
    pos = patchify_positions(hp, wp)
    shape = (b, pos.shape[0], 2) if g is None else (b, g, pos.shape[0], 2)
    return jnp.broadcast_to(pos if g is None else pos[None], shape)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def test_encoder_forward_shapes(rng):
    key = jax.random.PRNGKey(0)
    params = init_encoder(key, ENC_CFG)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    out = encoder_forward(params, ENC_CFG, img, _positions(2))
    assert out.shape == (2, 4, 64)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_block_matches_torch(rng):
    """One SA+MLP block vs a literal torch implementation, same weights."""
    dim, heads, n, b = 64, 2, 4, 3
    key = jax.random.PRNGKey(1)
    p = init_encoder_block(key, dim, 4.0)
    x = rng.standard_normal((b, n, dim)).astype(np.float32)
    pos = rng.integers(0, 8, size=(b, n, 2)).astype(np.int32)
    cos, sin = make_rope_tables(jnp.asarray(pos), dim // heads)
    got = encoder_block(p, jnp.asarray(x), (cos, sin), heads)

    # --- torch twin ---
    tx = torch.from_numpy(x)

    def lin(pp, v):
        return v @ torch.from_numpy(np.asarray(pp["w"])) + \
            torch.from_numpy(np.asarray(pp["b"]))

    def ln(pp, v):
        return torch.nn.functional.layer_norm(
            v, (dim,), torch.from_numpy(np.asarray(pp["scale"])),
            torch.from_numpy(np.asarray(pp["bias"])), eps=1e-6)

    def rope_t(t):  # t: [B, H, N, Dh]
        dh = t.shape[-1]
        d_axis = dh // 2
        outs = []
        for axis in range(2):
            half = t[..., axis * d_axis:(axis + 1) * d_axis]
            inv = 1.0 / (100.0 ** (torch.arange(0, d_axis, 2).float() / d_axis))
            ang = torch.from_numpy(pos[..., axis]).float().unsqueeze(-1) * inv
            ang = ang.unsqueeze(1)  # B,1,N,d/2
            c = torch.cat([ang.cos(), ang.cos()], -1)
            s = torch.cat([ang.sin(), ang.sin()], -1)
            x1, x2 = half[..., :d_axis // 2], half[..., d_axis // 2:]
            rot = torch.cat([-x2, x1], -1)
            outs.append(half * c + rot * s)
        return torch.cat(outs, -1)

    h = ln(p["norm1"], tx)
    qkv = lin(p["attn"]["qkv"], h).reshape(b, n, 3, heads, dim // heads)
    q, k, v = [qkv[:, :, i].transpose(1, 2) for i in range(3)]  # B,H,N,Dh
    q, k = rope_t(q), rope_t(k)
    att = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(dim // heads), -1)
    sa = (att @ v).transpose(1, 2).reshape(b, n, dim)
    tx = tx + lin(p["attn"]["proj"], sa)
    h = ln(p["norm2"], tx)
    h = lin(p["mlp"]["fc2"], torch.nn.functional.gelu(
        lin(p["mlp"]["fc1"], h)))
    want = (tx + h).numpy()

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _setup_decoder(capacity_imgs=8):
    key = jax.random.PRNGKey(2)
    params = init_decoder(key, DEC_CFG)
    n = 4  # tokens per image at 32x32/16
    cap = round_capacity(capacity_imgs * n, 16)
    mem = init_memory(DEC_CFG.depth, 1, DEC_CFG.num_heads, DEC_CFG.head_dim,
                      cap, dtype=jnp.float32)
    return params, mem, n


def test_decoder_update_then_render(rng):
    params, mem, n = _setup_decoder()
    b, g = 1, 2
    x_enc = jnp.asarray(rng.standard_normal((b, g, n, 64)), jnp.float32)
    pos = _positions(b, g)
    mem, toks = decoder_update(params, DEC_CFG, mem, x_enc, pos,
                               causal=False, dtype=jnp.float32,
                               impl="chunked")
    assert toks.shape == (b, g, n, DEC_CFG.embed_dim)
    assert int(mem.length) == g * n
    assert int(mem.n_imgs) == g
    np.testing.assert_array_equal(
        np.asarray(mem.labels[0, :g * n]), [0] * n + [1] * n)
    assert (np.asarray(mem.labels[0, g * n:]) == -1).all()

    out = decoder_render(params, DEC_CFG, mem, x_enc, pos,
                         dtype=jnp.float32, impl="chunked")
    assert out.shape == toks.shape
    assert np.isfinite(np.asarray(out)).all()

    pm = decoder_head(params, DEC_CFG, out, (32, 32))
    assert pm.shape == (b, g, 32, 32, 7)


def test_causal_batch_equals_sequential_updates(rng):
    """CausalMUSt3R semantics: one causal batch over [0..3] must equal
    causal init on [0,1] followed by 1-image causal updates of 2 and 3
    (feedback off, dropout off) -- the key training/inference equivalence
    the reference relies on (README:230)."""
    cfg = dataclasses.replace(DEC_CFG, feedback=FeedbackType.NONE)
    key = jax.random.PRNGKey(3)
    params = init_decoder(key, cfg)
    n = 4
    b, g = 1, 4
    x_enc = jnp.asarray(rng.standard_normal((b, g, n, 64)), jnp.float32)
    pos = _positions(b, g)
    cap = round_capacity(8 * n, 16)

    mem_a = init_memory(cfg.depth, b, cfg.num_heads, cfg.head_dim, cap,
                        dtype=jnp.float32)
    mem_a, toks_a = decoder_update(params, cfg, mem_a, x_enc, pos,
                                   causal=True, dtype=jnp.float32,
                                   impl="chunked")

    mem_b = init_memory(cfg.depth, b, cfg.num_heads, cfg.head_dim, cap,
                        dtype=jnp.float32)
    mem_b, t01 = decoder_update(params, cfg, mem_b, x_enc[:, :2],
                                pos[:, :2], causal=True, dtype=jnp.float32,
                                impl="chunked")
    mem_b, t2 = decoder_update(params, cfg, mem_b, x_enc[:, 2:3],
                               pos[:, 2:3], causal=True, dtype=jnp.float32,
                               impl="chunked")
    mem_b, t3 = decoder_update(params, cfg, mem_b, x_enc[:, 3:4],
                               pos[:, 3:4], causal=True, dtype=jnp.float32,
                               impl="chunked")
    toks_b = jnp.concatenate([t01, t2, t3], axis=1)

    np.testing.assert_allclose(np.asarray(toks_a), np.asarray(toks_b),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mem_a.kv[:, :, :, :g * n]),
                               np.asarray(mem_b.kv[:, :, :, :g * n]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(mem_a.labels),
                                  np.asarray(mem_b.labels))


def test_render_invariant_to_query_grouping(rng):
    """Rendering views one-by-one or batched must give identical results."""
    params, mem, n = _setup_decoder()
    b = 1
    x_init = jnp.asarray(rng.standard_normal((b, 2, n, 64)), jnp.float32)
    pos2 = _positions(b, 2)
    mem, _ = decoder_update(params, DEC_CFG, mem, x_init, pos2,
                            causal=False, dtype=jnp.float32, impl="chunked")
    x_q = jnp.asarray(rng.standard_normal((b, 3, n, 64)), jnp.float32)
    pos3 = _positions(b, 3)
    out_batch = decoder_render(params, DEC_CFG, mem, x_q, pos3,
                               dtype=jnp.float32, impl="chunked")
    outs = [decoder_render(params, DEC_CFG, mem, x_q[:, i:i + 1],
                           pos3[:, i:i + 1], dtype=jnp.float32,
                           impl="chunked")
            for i in range(3)]
    np.testing.assert_allclose(np.asarray(out_batch),
                               np.asarray(jnp.concatenate(outs, axis=1)),
                               rtol=1e-5, atol=1e-6)


def test_feedback_zero_init_is_inactive(rng):
    """Zero-initialized feedback must not change the stored memory vs
    feedback=NONE (reference init_feedback_layers)."""
    params, mem, n = _setup_decoder()
    cfg_none = dataclasses.replace(DEC_CFG, feedback=FeedbackType.NONE)
    b, g = 1, 2
    x_enc = jnp.asarray(rng.standard_normal((b, g, n, 64)), jnp.float32)
    pos = _positions(b, g)
    mem_fb, _ = decoder_update(params, DEC_CFG, mem, x_enc, pos,
                               causal=False, dtype=jnp.float32,
                               impl="chunked")
    mem2 = init_memory(DEC_CFG.depth, b, DEC_CFG.num_heads, DEC_CFG.head_dim,
                       mem.capacity, dtype=jnp.float32)
    mem_no, _ = decoder_update(params, cfg_none, mem2, x_enc, pos,
                               causal=False, dtype=jnp.float32,
                               impl="chunked")
    np.testing.assert_allclose(np.asarray(mem_fb.kv), np.asarray(mem_no.kv),
                               rtol=1e-5, atol=1e-6)


def test_noncausal_update_images_attend_each_other(rng):
    """Non-causal (inference) updates let every image in a step attend the
    others' fresh tokens; causal restricts to earlier labels. The two modes
    must therefore differ for image 0 of a non-init step."""
    cfg = dataclasses.replace(DEC_CFG, feedback=FeedbackType.NONE)
    params = init_decoder(jax.random.PRNGKey(5), cfg)
    n, b = 4, 1
    x0 = jnp.asarray(rng.standard_normal((b, 1, n, 64)), jnp.float32)
    x12 = jnp.asarray(rng.standard_normal((b, 2, n, 64)), jnp.float32)
    pos1 = _positions(b, 1)
    pos2 = _positions(b, 2)
    cap = round_capacity(8 * n, 16)

    outs = {}
    for causal in (False, True):
        mem = init_memory(cfg.depth, b, cfg.num_heads, cfg.head_dim, cap,
                          dtype=jnp.float32)
        mem, _ = decoder_update(params, cfg, mem, x0, pos1, causal=causal,
                                dtype=jnp.float32, impl="chunked")
        _, toks = decoder_update(params, cfg, mem, x12, pos2, causal=causal,
                                 dtype=jnp.float32, impl="chunked")
        outs[causal] = np.asarray(toks)
    # image at step-index 0 (label 1): non-causal sees label 2's tokens,
    # causal does not
    assert np.abs(outs[False][:, 0] - outs[True][:, 0]).max() > 1e-4
    # the last image attends the same label set either way, but reads
    # image 1's per-layer memory tokens, which are mode-dependent -- so
    # its output differs too (cross-layer coupling)
    assert np.abs(outs[False][:, 1] - outs[True][:, 1]).max() > 1e-6


def test_update_masks_init_exception_values():
    """Pin the (q_self, q_upper) encodings of the reference mask rules."""
    from must3r_tpu.models.decoder import _update_masks
    from must3r_tpu.memory import INT32_MAX

    # causal init with 3 images: img0 attends itself+img1 (q_upper=2)
    qs, qu = _update_masks(DEC_CFG, jnp.int32(0), 3, causal=True)
    np.testing.assert_array_equal(np.asarray(qs), [-2, 1, 2])
    np.testing.assert_array_equal(np.asarray(qu), [2, 1, 2])
    # causal later step: strictly-earlier only
    qs, qu = _update_masks(DEC_CFG, jnp.int32(5), 2, causal=True)
    np.testing.assert_array_equal(np.asarray(qs), [5, 6])
    np.testing.assert_array_equal(np.asarray(qu), [5, 6])
    # non-causal init single image: unmasked
    qs, qu = _update_masks(DEC_CFG, jnp.int32(0), 1, causal=False)
    assert int(qs[0]) == -2 and int(qu[0]) == INT32_MAX
    # non-causal later: self-exclusion only
    qs, qu = _update_masks(DEC_CFG, jnp.int32(3), 2, causal=False)
    np.testing.assert_array_equal(np.asarray(qs), [3, 4])
    assert (np.asarray(qu) == INT32_MAX).all()
