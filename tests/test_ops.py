"""Unit tests for core ops: RoPE2D, geometry warps, patchify, attention."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.ops import (
    apply_exp_to_norm,
    apply_log_to_norm,
    apply_rope2d,
    make_rope_tables,
    memory_cross_attention,
    patchify_positions,
    self_attention,
    unpatchify,
)
from must3r_tpu.ops.attention import (
    INT32_MAX,
    _ca_chunked,
    _ca_pallas,
    pack_kv,
    _sa_chunked,
    _sa_pallas,
    attention_reference,
)
from must3r_tpu.ops.patch import patchify_image


# ---------------------------------------------------------------------------
# RoPE2D
# ---------------------------------------------------------------------------

def _rope2d_numpy(tokens, positions, base=100.0, f0=1.0):
    """Literal transcription of croco RoPE2D semantics for cross-checking."""
    t = np.asarray(tokens, np.float64)  # [N, Dh]
    pos = np.asarray(positions)         # [N, 2]
    n, dh = t.shape
    d_axis = dh // 2
    out = np.empty_like(t)
    for axis in range(2):  # y then x
        half = t[:, axis * d_axis:(axis + 1) * d_axis]
        d = d_axis
        inv_freq = 1.0 / (base ** (np.arange(0, d, 2) / d))  # [d/2]
        ang = pos[:, axis:axis + 1] * f0 * inv_freq          # [N, d/2]
        cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)
        sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)
        x1, x2 = half[:, :d // 2], half[:, d // 2:]
        rot = np.concatenate([-x2, x1], -1)
        out[:, axis * d_axis:(axis + 1) * d_axis] = half * cos + rot * sin
    return out


def test_rope2d_matches_reference_semantics(rng):
    n, dh = 12, 64
    tokens = rng.standard_normal((n, dh)).astype(np.float32)
    pos = rng.integers(0, 32, size=(n, 2)).astype(np.int32)
    want = _rope2d_numpy(tokens, pos, base=100.0, f0=0.4375)
    cos, sin = make_rope_tables(jnp.asarray(pos), dh, base=100.0, f0=0.4375)
    got = apply_rope2d(jnp.asarray(tokens), cos, sin)
    # f32 cos/sin of large angles vs the f64 transcription: ~1e-5 abs
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_rope2d_heads_axis_broadcast(rng):
    b, n, h, dh = 2, 7, 3, 32
    tokens = rng.standard_normal((b, n, h, dh)).astype(np.float32)
    pos = rng.integers(0, 16, size=(b, n, 2)).astype(np.int32)
    cos, sin = make_rope_tables(jnp.asarray(pos), dh)
    got = apply_rope2d(jnp.asarray(tokens), cos, sin)
    # per-head result equals applying without the heads axis
    for hh in range(h):
        cos2, sin2 = make_rope_tables(jnp.asarray(pos), dh)
        want = apply_rope2d(jnp.asarray(tokens[:, :, hh]), cos2, sin2)
        np.testing.assert_allclose(np.asarray(got[:, :, hh]), np.asarray(want),
                                   rtol=1e-6)


def test_rope2d_preserves_norm(rng):
    n, dh = 5, 64
    tokens = rng.standard_normal((n, dh)).astype(np.float32)
    pos = rng.integers(0, 100, size=(n, 2)).astype(np.int32)
    cos, sin = make_rope_tables(jnp.asarray(pos), dh)
    got = apply_rope2d(jnp.asarray(tokens), cos, sin)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1),
                               np.linalg.norm(tokens, axis=-1), rtol=1e-5)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def test_log_exp_norm_roundtrip(rng):
    xyz = rng.standard_normal((4, 5, 3)).astype(np.float32) * 3
    back = apply_exp_to_norm(apply_log_to_norm(jnp.asarray(xyz)))
    np.testing.assert_allclose(np.asarray(back), xyz, rtol=1e-4, atol=1e-5)


def test_exp_norm_direction_and_magnitude(rng):
    xyz = jnp.asarray([[3.0, 0.0, 0.0]])
    out = apply_exp_to_norm(xyz)
    np.testing.assert_allclose(np.asarray(out), [[math.expm1(3.0), 0, 0]],
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Patchify
# ---------------------------------------------------------------------------

def test_patchify_positions_row_major():
    pos = np.asarray(patchify_positions(2, 3))
    want = [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    np.testing.assert_array_equal(pos, want)


def test_unpatchify_roundtrip(rng):
    b, h, w, c, p = 2, 32, 48, 7, 16
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    tokens = patchify_image(jnp.asarray(img), p)
    assert tokens.shape == (b, (h // p) * (w // p), p * p * c)
    back = unpatchify(tokens, p, (h, w))
    np.testing.assert_array_equal(np.asarray(back), img)


def test_unpatchify_channel_major_layout():
    """Feature index k = c*P*P + i*P + j (torch pixel_shuffle order)."""
    p, c = 2, 3
    tok = np.zeros((1, 1, p * p * c), np.float32)
    tok[0, 0, 1 * p * p + 1 * p + 0] = 5.0  # c=1, i=1, j=0
    img = np.asarray(unpatchify(jnp.asarray(tok), p, (p, p)))
    assert img[0, 1, 0, 1] == 5.0
    assert img.sum() == 5.0


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def test_self_attention_chunked_matches_reference(rng):
    b, n, h, dh = 2, 100, 4, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
               for _ in range(3))
    want = attention_reference(q, k, v)
    got = _sa_chunked(q, k, v, chunk=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_self_attention_pallas_interpret_matches(rng):
    b, n, h, dh = 1, 96, 2, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
               for _ in range(3))
    want = attention_reference(q, k, v)
    got = _sa_pallas(q, k, v, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _ca_reference(q, k, v, labels, q_self, q_upper, extra=None):
    """Dense-mask ground truth for the label-masked CA."""
    b, g, n, h, dh = q.shape
    s = k.shape[2]
    allow = ((labels[:, None, :] >= 0)
             & (labels[:, None, :] != q_self[..., None])
             & (labels[:, None, :] < q_upper[..., None]))  # [B,G,S]
    if extra is not None:
        allow = allow & ~extra
    outs = []
    for gi in range(g):
        kg = k.transpose(0, 2, 1, 3)  # B,S,H,Dh
        vg = v.transpose(0, 2, 1, 3)
        mask = allow[:, gi][:, None, :]  # B,1,S -> broadcast over queries
        outs.append(attention_reference(q[:, gi], kg, vg,
                                        mask=jnp.broadcast_to(mask, (b, n, s))))
    return jnp.stack(outs, axis=1)


def test_memory_ca_chunked_matches_dense(rng):
    b, g, n, h, dh, s = 2, 3, 10, 2, 16, 50
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    labels = jnp.asarray(rng.integers(-1, 5, size=(b, s)), jnp.int32)
    q_self = jnp.asarray(rng.integers(0, 5, size=(b, g)), jnp.int32)
    q_upper = jnp.asarray(rng.integers(1, 6, size=(b, g)), jnp.int32)
    want = _ca_reference(q, k, v, labels, q_self, q_upper)
    got = _ca_chunked(q, k, v, labels, q_self, q_upper, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_memory_ca_extra_mask(rng):
    b, g, n, h, dh, s = 1, 2, 6, 2, 8, 24
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=(b, s)), jnp.int32)
    q_self = jnp.full((b, g), -2, jnp.int32)
    q_upper = jnp.full((b, g), INT32_MAX, jnp.int32)
    extra = jnp.asarray(rng.random((b, g, s)) < 0.3)
    want = _ca_reference(q, k, v, labels, q_self, q_upper, extra)
    got = _ca_chunked(q, k, v, labels, q_self, q_upper, extra, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_memory_ca_pallas_interpret_matches(rng):
    b, g, n, h, dh, s = 1, 2, 16, 2, 32, 64
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :40] = rng.integers(0, 4, size=(b, 40))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[1, -2]], jnp.int32)
    q_upper = jnp.asarray([[3, INT32_MAX]], jnp.int32)
    want = _ca_reference(q, k, v, labels, q_self, q_upper)
    got = _ca_pallas(q, pack_kv(k, v), labels, q_self, q_upper, jnp.int32(40),
                     block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_memory_ca_kv_len_skips_tail(rng):
    """Tokens beyond kv_len must not influence the result."""
    b, g, n, h, dh, s = 1, 1, 8, 1, 16, 32
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :16] = 0
    labels = jnp.asarray(labels)
    out_full = _ca_pallas(q, pack_kv(k, v), labels,
                          jnp.full((b, g), -2, jnp.int32),
                          jnp.full((b, g), INT32_MAX, jnp.int32),
                          jnp.int32(32), block_k=16, interpret=True)
    # corrupt the tail; with kv_len=16 result must be identical
    k2 = k.at[:, :, 16:].set(99.0)
    v2 = v.at[:, :, 16:].set(99.0)
    out_len = _ca_pallas(q, pack_kv(k2, v2), labels,
                         jnp.full((b, g), -2, jnp.int32),
                         jnp.full((b, g), INT32_MAX, jnp.int32),
                         jnp.int32(16), block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out_len), np.asarray(out_full),
                               rtol=1e-6)


def test_memory_ca_grad_flows(rng):
    """Training path (chunked) must be differentiable."""
    b, g, n, h, dh, s = 1, 1, 4, 1, 8, 16
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    labels = jnp.zeros((b, s), jnp.int32)

    def f(q, k, v):
        return jnp.sum(memory_cross_attention(q, pack_kv(k, v), labels,
                                              impl="chunked"))

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).sum()) > 0


def test_hybrid_attention_gradients_match_chunked(rng):
    """impl='pallas' must be differentiable (custom VJP with XLA-recompute
    backward) and agree with the chunked path's gradients."""
    from must3r_tpu.ops.attention import _ca_hybrid, _sa_hybrid, _sa_chunked

    b, n, h, dh = 1, 16, 2, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
               for _ in range(3))

    # note: _sa_hybrid forward runs the pallas kernel -- on CPU tests we
    # check the backward rule only (vjp recompute path), via interpret-free
    # chunked comparison of gradients
    def f_chunked(q, k, v):
        return jnp.sum(jnp.sin(_sa_chunked(q, k, v)))

    g_chunked = jax.grad(f_chunked, argnums=(0, 1, 2))(q, k, v)

    # build the same vjp the hybrid backward uses
    _, vjp = jax.vjp(_sa_chunked, q, k, v)
    out = _sa_chunked(q, k, v)
    g_hybrid = vjp(jnp.cos(out))
    for a, b_ in zip(g_chunked, g_hybrid):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_ca_kernels_with_dropout_mask_match_chunked(rng):
    """Forward + flash-backward kernels with the token-dropout extra_mask
    (interpret mode) vs the chunked path -- the training configuration
    (reference trains with mem_dropout 0.1)."""
    from must3r_tpu.ops.attention import (
        _ca_bwd_dkv_pallas,
        _ca_bwd_dq_pallas,
        _ca_chunked,
        _ca_pallas,
    )

    b, g, n, h, dh, s = 1, 2, 8, 2, 32, 32
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv5 = jnp.asarray(rng.standard_normal((1, b, h, s, 2 * dh)),
                      jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=(b, s)), jnp.int32)
    extra = jnp.asarray(rng.random((b, g, s)) < 0.3)
    q_self = jnp.full((b, g), -2, jnp.int32)
    q_upper = jnp.full((b, g), INT32_MAX, jnp.int32)
    layer = jnp.int32(0)
    g_out = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)

    k, v = jnp.split(kv5[0], 2, axis=-1)

    def f(q_, k_, v_):
        return _ca_chunked(q_, k_, v_, labels, q_self, q_upper,
                           extra_mask=extra)

    out_ref, vjp = jax.vjp(f, q, k, v)
    dq_want, dk_want, dv_want = vjp(g_out)

    ext = extra.astype(jnp.int32)
    out, lse = _ca_pallas(q, kv5, labels, q_self, q_upper, jnp.int32(s),
                          layer, block_k=16, block_q=8, interpret=True,
                          return_stats=True, ext=ext)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    delta = jnp.sum(g_out * out, axis=-1).transpose(0, 1, 3, 2)[..., None]
    dq = _ca_bwd_dq_pallas(q, kv5, labels, q_self, q_upper, jnp.int32(s),
                           layer, lse, delta, g_out, block_k=16,
                           block_q=8, interpret=True, ext=ext)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=2e-4, atol=2e-5)
    dkv = _ca_bwd_dkv_pallas(q, kv5, labels, q_self, q_upper, jnp.int32(s),
                             layer, lse, delta, g_out, block_k=16,
                             block_q=8, interpret=True, ext=ext)
    np.testing.assert_allclose(np.asarray(dkv[..., :dh]),
                               np.asarray(dk_want), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dkv[..., dh:]),
                               np.asarray(dv_want), rtol=2e-4, atol=2e-5)


def test_drop_path():
    from must3r_tpu.ops.dropout import drop_path
    key = jax.random.PRNGKey(0)
    x = jnp.ones((512, 3, 4))
    assert drop_path(key, x, 0.0) is x          # identity fast path
    y = np.asarray(drop_path(key, x, 0.25))
    # whole branches dropped per batch element, survivors rescaled
    per_elem = y.reshape(512, -1)
    dropped = (per_elem == 0).all(axis=1)
    kept = (np.abs(per_elem - 1 / 0.75) < 1e-6).all(axis=1)
    assert (dropped | kept).all()
    assert 0.1 < dropped.mean() < 0.4


def test_color_jitter_properties():
    from must3r_tpu.tools.image import color_jitter
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    out = color_jitter(img, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)          # something changed
    # deterministic given the rng state
    out2 = color_jitter(img, np.random.default_rng(1))
    np.testing.assert_array_equal(out, out2)
    # zero-strength jitter is the identity
    ident = color_jitter(img, np.random.default_rng(2), brightness=0,
                         contrast=0, saturation=0, hue=0)
    np.testing.assert_array_equal(ident, img)


def test_color_jitter_hue_roundtrip():
    from must3r_tpu.tools.image import _hsv_to_rgb, _rgb_to_hsv
    rng = np.random.default_rng(3)
    rgb = rng.random((64, 3)).astype(np.float32)
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_ca_flash_backward_kernels_match_chunked_vjp(rng):
    """The dedicated flash-backward kernels (dQ + dK/dV, interpret mode)
    must reproduce the XLA chunked path's gradients, including label
    masks, causal bounds, live-length truncation and query padding."""
    from must3r_tpu.ops.attention import (
        _ca_bwd_dkv_pallas,
        _ca_bwd_dq_pallas,
        _ca_chunked_from_packed,
        _ca_pallas,
    )

    b, g, n, h, dh, s = 1, 2, 12, 2, 32, 64   # n=12 forces q-row padding
    live = 48
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv5 = jnp.asarray(rng.standard_normal((3, b, h, s, 2 * dh)),
                      jnp.float32)
    labels = np.full((b, s), -1, np.int32)
    labels[:, :live] = rng.integers(0, 4, size=(b, live))
    labels = jnp.asarray(labels)
    q_self = jnp.asarray([[1, -2]], jnp.int32)
    q_upper = jnp.asarray([[3, INT32_MAX]], jnp.int32)
    layer = jnp.int32(1)
    kv_len = jnp.int32(live)
    g_out = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)

    # golden gradients through the chunked path
    def f(q_, kv_):
        return _ca_chunked_from_packed(q_, kv_, labels, q_self, q_upper,
                                       layer)

    out_ref, vjp = jax.vjp(f, q, kv5)
    dq_want, dkv5_want = vjp(g_out)

    out, lse = _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer,
                          block_k=16, block_q=8, interpret=True,
                          return_stats=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    delta = jnp.sum(g_out * out, axis=-1).transpose(0, 1, 3, 2)[..., None]
    row_pad = lse.shape[3] - delta.shape[3]
    if row_pad:
        delta = jnp.pad(delta,
                        ((0, 0), (0, 0), (0, 0), (0, row_pad), (0, 0)))

    dq = _ca_bwd_dq_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer,
                           lse, delta, g_out, block_k=16, block_q=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=2e-4, atol=2e-5)

    dkv = _ca_bwd_dkv_pallas(q, kv5, labels, q_self, q_upper, kv_len,
                             layer, lse, delta, g_out, block_k=16,
                             block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(dkv),
                               np.asarray(dkv5_want[1]),
                               rtol=2e-4, atol=2e-5)
    # other layers of the cache receive no gradient
    assert float(jnp.abs(dkv5_want[0]).max()) == 0.0


def test_ca_kernels_folded_g_match_chunked(rng):
    """Folded-G row layout (block_q=None, g>1 -> one program per (b, h)
    with per-stripe masks): forward + both flash-backward kernels vs the
    chunked path, with causal masks AND the dropout extra_mask."""
    from must3r_tpu.ops.attention import (
        _ca_bwd_dkv_pallas,
        _ca_bwd_dq_pallas,
        _ca_chunked,
        _ca_pallas,
        _fold_stripe,
    )

    b, g, n, h, dh, s = 2, 3, 24, 2, 32, 512
    stripe = _fold_stripe(g, n)
    assert stripe == 128      # folding must actually engage
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv5 = jnp.asarray(rng.standard_normal((1, b, h, s, 2 * dh)),
                      jnp.float32)
    live = 300
    labels = jnp.where(jnp.arange(s) < live, jnp.arange(s) // 60, -1)
    labels = jnp.broadcast_to(labels[None], (b, s)).astype(jnp.int32)
    extra = jnp.asarray(rng.random((b, g, s)) < 0.2)
    # causal-update style masks, different per image
    q_self = jnp.broadcast_to(jnp.arange(2, 2 + g, dtype=jnp.int32)[None],
                              (b, g))
    q_upper = q_self
    layer = jnp.int32(0)
    g_out = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)

    k, v = jnp.split(kv5[0], 2, axis=-1)

    def f(q_, k_, v_):
        return _ca_chunked(q_, k_, v_, labels, q_self, q_upper,
                           extra_mask=extra)

    out_ref, vjp = jax.vjp(f, q, k, v)
    dq_want, dk_want, dv_want = vjp(g_out)

    ext = extra.astype(jnp.int32)
    out, lse = _ca_pallas(q, kv5, labels, q_self, q_upper, jnp.int32(live),
                          layer, interpret=True, return_stats=True,
                          ext=ext)
    assert lse.shape == (b, g, h, stripe, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    delta = jnp.sum(g_out * out, axis=-1).transpose(0, 1, 3, 2)[..., None]
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, 0), (0, stripe - n),
                            (0, 0)))
    dq = _ca_bwd_dq_pallas(q, kv5, labels, q_self, q_upper,
                           jnp.int32(live), layer, lse, delta, g_out,
                           interpret=True, ext=ext)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=2e-4, atol=2e-5)
    dkv = _ca_bwd_dkv_pallas(q, kv5, labels, q_self, q_upper,
                             jnp.int32(live), layer, lse, delta, g_out,
                             interpret=True, ext=ext)
    np.testing.assert_allclose(np.asarray(dkv[..., :dh]),
                               np.asarray(dk_want), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dkv[..., dh:]),
                               np.asarray(dv_want), rtol=2e-4, atol=2e-5)

    # no-dropout variant exercises the ext-free folded branches
    def f2(q_, k_, v_):
        return _ca_chunked(q_, k_, v_, labels, q_self, q_upper)

    out_ref2, vjp2 = jax.vjp(f2, q, k, v)
    dq_want2, dk_want2, dv_want2 = vjp2(g_out)
    out2, lse2 = _ca_pallas(q, kv5, labels, q_self, q_upper,
                            jnp.int32(live), layer, interpret=True,
                            return_stats=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out_ref2),
                               rtol=2e-5, atol=2e-5)
    delta2 = jnp.sum(g_out * out2, axis=-1).transpose(0, 1, 3, 2)[..., None]
    delta2 = jnp.pad(delta2, ((0, 0), (0, 0), (0, 0), (0, stripe - n),
                              (0, 0)))
    dq2 = _ca_bwd_dq_pallas(q, kv5, labels, q_self, q_upper,
                            jnp.int32(live), layer, lse2, delta2, g_out,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(dq2), np.asarray(dq_want2),
                               rtol=2e-4, atol=2e-5)
    dkv2 = _ca_bwd_dkv_pallas(q, kv5, labels, q_self, q_upper,
                              jnp.int32(live), layer, lse2, delta2, g_out,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(dkv2[..., :dh]),
                               np.asarray(dk_want2), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dkv2[..., dh:]),
                               np.asarray(dv_want2), rtol=2e-4, atol=2e-5)


def test_ca_bwd_fused_matches_chunked(rng):
    """The single-launch fused dQ+dK/dV backward kernel (interpret mode)
    vs the chunked path's gradients: folded-G layout, causal masks,
    live-length truncation, multiple KV blocks, with and without the
    dropout extra_mask."""
    from must3r_tpu.ops.attention import (
        _ca_bwd_fused_pallas,
        _ca_chunked,
        _ca_pallas,
        _fold_stripe,
    )

    b, g, n, h, dh, s = 2, 3, 24, 2, 32, 512
    stripe = _fold_stripe(g, n)
    assert stripe == 128
    q = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    kv5 = jnp.asarray(rng.standard_normal((1, b, h, s, 2 * dh)),
                      jnp.float32)
    live = 300
    labels = jnp.where(jnp.arange(s) < live, jnp.arange(s) // 60, -1)
    labels = jnp.broadcast_to(labels[None], (b, s)).astype(jnp.int32)
    extra = jnp.asarray(rng.random((b, g, s)) < 0.2)
    q_self = jnp.broadcast_to(jnp.arange(2, 2 + g, dtype=jnp.int32)[None],
                              (b, g))
    q_upper = q_self
    layer = jnp.int32(0)
    g_out = jnp.asarray(rng.standard_normal((b, g, n, h, dh)), jnp.float32)
    k, v = jnp.split(kv5[0], 2, axis=-1)

    for use_ext in (True, False):
        em = extra if use_ext else None

        def f(q_, k_, v_):
            return _ca_chunked(q_, k_, v_, labels, q_self, q_upper,
                               extra_mask=em)

        out_ref, vjp = jax.vjp(f, q, k, v)
        dq_want, dk_want, dv_want = vjp(g_out)
        ext = extra.astype(jnp.int32) if use_ext else None
        # block_k=128 forces multiple live KV blocks (tests the
        # dq-accumulation across revisited grid steps + dead-block skip)
        out, lse = _ca_pallas(q, kv5, labels, q_self, q_upper,
                              jnp.int32(live), layer, block_k=128,
                              interpret=True, return_stats=True, ext=ext)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=2e-5, atol=2e-5)
        delta = jnp.sum(g_out * out, axis=-1).transpose(0, 1, 3, 2)[..., None]
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, 0), (0, stripe - n),
                                (0, 0)))
        dq, dkv = _ca_bwd_fused_pallas(q, kv5, labels, q_self, q_upper,
                                       jnp.int32(live), layer, lse, delta,
                                       g_out, block_k=128, interpret=True,
                                       ext=ext)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dkv[..., :dh]),
                                   np.asarray(dk_want), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dkv[..., dh:]),
                                   np.asarray(dv_want), rtol=2e-4,
                                   atol=2e-5)
