"""Functional transformer layers over parameter pytrees.

Behavioral parity targets (architecture only, clean-room reimplementation):
  * reference `must3r/model/blocks/layers.py` (Block / CachedDecoderBlock,
    xavier-uniform init, LayerNorm eps=1e-6)
  * reference `must3r/model/blocks/attention.py` (fused-qkv Attention with
    RoPE on q,k; CrossAttention with separate projq/projk/projv; the
    CachedCrossAttention `prepare_kv` KV-precompute)
  * croco `Mlp` (fc1 -> GELU -> fc2; torch GELU is the exact erf form).

TPU-first notes:
  * Modules are pure functions over nested-dict params -- trivially jittable,
    shardable and convertible from torch state-dicts.
  * LayerNorm statistics are computed in fp32 regardless of compute dtype
    (matches torch semantics under AMP).
  * Memory key/value tokens are packed per-head as concat(k, v) along the
    feature axis: [B, H, S, 2*Dh]. With Dh=64 this makes each memory row
    exactly 128 lanes -- the native TPU vreg width -- and halves the DMA
    streams in the cross-attention kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from must3r_tpu.ops.attention import memory_cross_attention, self_attention
from must3r_tpu.ops.rope import apply_rope2d


# ---------------------------------------------------------------------------
# Primitive apply fns
# ---------------------------------------------------------------------------

def linear(p, x, precision=None):
    """x @ w + b with fp32 MXU accumulation; w: [din, dout].

    precision: pass jax.lax.Precision.HIGHEST inside fp32 islands — at
    DEFAULT precision XLA computes even fp32 matmuls with bf16 passes
    (~1e-2 relative), which is fine for the bf16 production towers but not
    for the head/postprocess islands the reference forces to fp32.

    (Measured rejection: flattening the leading axes into one M dim
    before the dot — [20,196,D] @ [D,D'] as [3920,D] — looked like it
    should tile the MXU better than the batched-conv emitter XLA picks,
    but the (8,128)-tiled layout pads each image's 196 rows separately,
    so the flatten is a real relayout copy, not a bitcast: step time
    152 -> 158 ms. docs/PERF.md round 3.)"""
    y = jnp.dot(x, p["w"].astype(x.dtype),
                preferred_element_type=jnp.float32, precision=precision)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(p, x, eps: float = 1e-6):
    """LayerNorm over the last axis; stats in fp32 (torch-AMP parity)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x):
    """Exact (erf) GELU -- torch nn.GELU default, NOT the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def mlp(p, x):
    """croco Mlp: fc1 -> GELU -> fc2."""
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


# ---------------------------------------------------------------------------
# Attention modules
# ---------------------------------------------------------------------------

def split_heads(x, num_heads: int):
    """[..., N, D] -> [..., N, H, Dh]."""
    *lead, n, d = x.shape
    return x.reshape(*lead, n, num_heads, d // num_heads)


def merge_heads(x):
    """[..., N, H, Dh] -> [..., N, D]."""
    *lead, n, h, dh = x.shape
    return x.reshape(*lead, n, h * dh)


def self_attn(p, x, rope=None, num_heads: int = 12, impl: Optional[str] = None):
    """Fused-qkv multi-head self-attention with optional RoPE on q,k.

    Args:
      p: {'qkv': linear, 'proj': linear}. Torch layout: the 3*D output
        features are ordered [q|k|v], each D split as [H, Dh].
      x: [B, N, D].
      rope: optional (cos, sin) tables of shape [B?, N, 2, Dh//4].
    """
    b, n, d = x.shape
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = split_heads(q, num_heads)
    k = split_heads(k, num_heads)
    v = split_heads(v, num_heads)
    if rope is not None:
        cos, sin = rope
        q = apply_rope2d(q, cos, sin)
        k = apply_rope2d(k, cos, sin)
    o = self_attention(q, k, v, impl=impl)
    return linear(p["proj"], merge_heads(o))


def prepare_kv(p, y, num_heads: int = 12, ln_eps: float = 1e-6):
    """Reference `CachedDecoderBlock.prepare_y` for the canonical packed
    layout: LayerNorm(norm_y) -> projk / projv -> per-head pack.

    The reference's three memory modes (norm_y / kv / raw,
    `layers.py:81-88`) differ only in *when* these projections run -- the
    attention output is mathematically identical. The TPU rebuild always
    caches the projected form (the reference's 'kv' mode), which makes every
    memory read a pure KV-cache decode.

    Args:
      p: decoder-block params ({'norm_y', 'projk', 'projv', ...}).
      y: [B, T, D] raw tokens.
    Returns:
      [B, H, T, 2*Dh] packed per-head (k | v), dtype of y.
    """
    y_ = layer_norm(p["norm_y"], y, ln_eps)
    k = split_heads(linear(p["projk"], y_), num_heads)   # [B, T, H, Dh]
    v = split_heads(linear(p["projv"], y_), num_heads)
    kv = jnp.concatenate([k, v], axis=-1)                # [B, T, H, 2Dh]
    return kv.transpose(0, 2, 1, 3)                      # [B, H, T, 2Dh]


def cross_attn(p, x, kv_packed, labels, q_self=None, q_upper=None,
               kv_len=None, extra_mask=None, layer=None, num_heads: int = 12,
               ln_eps: float = 1e-6, impl: Optional[str] = None, mesh=None,
               sp_axis: str = "sp", kv_scale=None, extra_kv=None,
               extra_labels=None):
    """Memory cross-attention read: q = projq(norm2(x)); flash CA against the
    packed KV cache; out projection.

    Args:
      x: [B, G, N, D] queries per image in the step.
      kv_packed: [B, H, S, 2*Dh] memory cache (one layer), or the full
        [L, B, H, S, 2*Dh] cache with ``layer`` selecting the row in-kernel.
      labels, q_self, q_upper, kv_len, extra_mask: see
        :func:`must3r_tpu.ops.attention.memory_cross_attention`.
      mesh: optional Mesh whose ``sp_axis`` shards the memory token axis;
        routes through the all-gather-free sharded CA (SURVEY §5.7) --
        collections larger than one chip's HBM serve transparently.
      extra_kv / extra_labels: replicated second KV source merged by the
        LSE identity (sharded path only): how update steps attend their
        new tokens without a mid-step cross-shard write.
    Returns: [B, G, N, D].
    """
    b, g, n, d = x.shape
    xq = layer_norm(p["norm2"], x, ln_eps)
    q = split_heads(linear(p["projq"], xq), num_heads)   # [B, G, N, H, Dh]
    if mesh is not None:
        from must3r_tpu.parallel.sharded_attention import (
            sharded_memory_cross_attention,
        )
        assert extra_mask is None, "dropout masks: unsharded path only"
        kvl = kv_packed
        if kv_packed.ndim == 5:
            kvl = jax.lax.dynamic_index_in_dim(kv_packed, layer, 0,
                                               keepdims=False)
        scl = kv_scale
        if scl is not None and scl.ndim == 5:
            scl = jax.lax.dynamic_index_in_dim(scl, layer, 0,
                                               keepdims=False)
        o = sharded_memory_cross_attention(mesh, q, kvl, labels,
                                           q_self=q_self, q_upper=q_upper,
                                           axis=sp_axis, impl=impl,
                                           kv_len=kv_len, extra_kv=extra_kv,
                                           extra_labels=extra_labels,
                                           kv_scale=scl)
    else:
        o = memory_cross_attention(q, kv_packed, labels, q_self=q_self,
                                   q_upper=q_upper, kv_len=kv_len,
                                   extra_mask=extra_mask, layer=layer,
                                   impl=impl, kv_scale=kv_scale)
    return linear(p["proj_ca"], merge_heads(o))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def encoder_block(p, x, rope, num_heads: int, ln_eps: float = 1e-6,
                  impl: Optional[str] = None):
    """Reference `Block`: x += SA(norm1(x)); x += MLP(norm2(x))."""
    x = x + self_attn(p["attn"], layer_norm(p["norm1"], x, ln_eps),
                      rope=rope, num_heads=num_heads, impl=impl)
    x = x + mlp(p["mlp"], layer_norm(p["norm2"], x, ln_eps))
    return x


def decoder_block(p, x, kv_packed, rope, labels, q_self=None, q_upper=None,
                  kv_len=None, extra_mask=None, layer=None,
                  num_heads: int = 12, ln_eps: float = 1e-6,
                  impl: Optional[str] = None, mesh=None, kv_scale=None,
                  extra_kv=None, extra_labels=None):
    """Reference `CachedDecoderBlock`: SA + memory-CA + MLP, pre-norm.

    x: [B, G, N, D]. SA is per-image (B*G batched); CA reads the memory
    (optionally sharded over mesh's 'sp' axis, see cross_attn).
    """
    b, g, n, d = x.shape
    xf = x.reshape(b * g, n, d)
    rope_f = None
    if rope is not None:
        cos, sin = rope
        rope_f = (cos.reshape(b * g, *cos.shape[-3:]),
                  sin.reshape(b * g, *sin.shape[-3:]))
    sa = self_attn(p["attn"], layer_norm(p["norm1"], xf, ln_eps),
                   rope=rope_f, num_heads=num_heads, impl=impl)
    x = x + sa.reshape(b, g, n, d)
    x = x + cross_attn(p, x, kv_packed, labels, q_self=q_self,
                       q_upper=q_upper, kv_len=kv_len,
                       extra_kv=extra_kv, extra_labels=extra_labels,
                       extra_mask=extra_mask,
                       layer=layer, num_heads=num_heads, ln_eps=ln_eps,
                       impl=impl, mesh=mesh, kv_scale=kv_scale)
    x = x + mlp(p["mlp"], layer_norm(p["norm3"], x, ln_eps))
    return x


def decoder_block_pre_ca(p, x, rope, num_heads: int = 12,
                         ln_eps: float = 1e-6,
                         impl: Optional[str] = None):
    """SA half of `decoder_block` + the CA query projection.

    Split out so the training path can rematerialize the projections
    while keeping the flash-CA kernel itself OUTSIDE the remat region
    (its recompute would re-run the whole exp-bound kernel per layer in
    the backward; its custom VJP already recomputes p from the saved
    lse, so re-running the forward kernel buys nothing).

    Returns (x_after_sa [B,G,N,D], q [B,G,N,H,Dh]).
    """
    b, g, n, d = x.shape
    xf = x.reshape(b * g, n, d)
    rope_f = None
    if rope is not None:
        cos, sin = rope
        rope_f = (cos.reshape(b * g, *cos.shape[-3:]),
                  sin.reshape(b * g, *sin.shape[-3:]))
    sa = self_attn(p["attn"], layer_norm(p["norm1"], xf, ln_eps),
                   rope=rope_f, num_heads=num_heads, impl=impl)
    x = x + sa.reshape(b, g, n, d)
    xq = layer_norm(p["norm2"], x, ln_eps)
    q = split_heads(linear(p["projq"], xq), num_heads)
    return x, q


def decoder_block_post_ca(p, x, o, ln_eps: float = 1e-6):
    """CA out-projection + MLP half of `decoder_block`.

    x: [B,G,N,D] (post-SA residual stream); o: [B,G,N,H,Dh] CA output.
    """
    x = x + linear(p["proj_ca"], merge_heads(o))
    return x + mlp(p["mlp"], layer_norm(p["norm3"], x, ln_eps))


# ---------------------------------------------------------------------------
# Initialization (xavier-uniform linears, reference layers.py:23-33)
# ---------------------------------------------------------------------------

def init_linear(key, din: int, dout: int, bias: bool = True, zero: bool = False):
    if zero:
        w = jnp.zeros((din, dout), jnp.float32)
    else:
        bound = math.sqrt(6.0 / (din + dout))
        w = jax.random.uniform(key, (din, dout), jnp.float32, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_mlp(key, dim: int, hidden: int, out: Optional[int] = None,
             zero_out: bool = False):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden),
            "fc2": init_linear(k2, hidden, out or dim, zero=zero_out)}


def init_self_attn(key, dim: int):
    k1, k2 = jax.random.split(key)
    return {"qkv": init_linear(k1, dim, 3 * dim),
            "proj": init_linear(k2, dim, dim)}


def init_encoder_block(key, dim: int, mlp_ratio: float):
    k1, k2 = jax.random.split(key)
    return {"norm1": init_layer_norm(dim),
            "attn": init_self_attn(k1, dim),
            "norm2": init_layer_norm(dim),
            "mlp": init_mlp(k2, dim, int(dim * mlp_ratio))}


def init_decoder_block(key, dim: int, num_heads: int, mlp_ratio: float):
    del num_heads  # head count is carried by the config, not the pytree
    ks = jax.random.split(key, 6)
    return {"norm1": init_layer_norm(dim),
            "attn": init_self_attn(ks[0], dim),
            "norm2": init_layer_norm(dim),
            "norm_y": init_layer_norm(dim),
            "projq": init_linear(ks[1], dim, dim),
            "projk": init_linear(ks[2], dim, dim),
            "projv": init_linear(ks[3], dim, dim),
            "proj_ca": init_linear(ks[4], dim, dim),
            "norm3": init_layer_norm(dim),
            "mlp": init_mlp(ks[5], dim, int(dim * mlp_ratio))}
