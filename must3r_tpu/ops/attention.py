"""Fused attention for MUSt3R-TPU.

Replaces the reference's three attention backends (xformers
``memory_efficient_attention``, torch SDPA, manual softmax --
``/root/reference/must3r/model/blocks/attention.py:37-79``) and its
materialized boolean/float attention masks (``decoder.py:119-139,388-433``)
with two TPU-native primitives:

* :func:`self_attention` -- flash self-attention over per-image tokens
  (encoder + decoder SA). No mask is ever needed (SA is always full within
  an image).

* :func:`memory_cross_attention` -- flash cross-attention of per-image
  queries against the shared token memory. All reference masking rules
  (self-exclusion on update, label-causality in training, validity of a
  fixed-capacity cache, token dropout) reduce to a per-token predicate on
  integer labels::

      allow(g, j) = valid(j) AND label[j] != q_self[g] AND label[j] < q_upper[g]
                    AND NOT extra_mask[g, j]

  computed *in-kernel* from an [S] label vector -- the O(G*N*S) boolean mask
  of the reference is never materialized, and the kernel's KV loop runs to
  the memory's dynamic fill level (``kv_len``) rather than its static
  capacity, so a fixed-capacity cache costs nothing over its live size.

Implementations:
  * ``pallas``  -- TPU kernels (inference hot path; fwd only).
  * ``chunked`` -- pure-XLA online-softmax scan (differentiable; the
    training path and the CPU/test fallback). Numerically identical
    semantics.

Mask convention summary (matching the reference):
  * render:           q_self = -2, q_upper = INT32_MAX  (attend all valid)
  * update (non-causal): q_self = own label, q_upper = INT32_MAX
  * init, single image:  no mask at all (image attends itself!)
  * causal training:  q_self = own, q_upper = own; exception: the very first
    image of a fresh memory gets q_upper = 2 so it can attend image 1
    (reference: decoder.py:394-400).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = jnp.iinfo(jnp.int32).max
_NEG_INF = -1e30

# When True, every Pallas kernel entry point whose caller did not pass an
# explicit `interpret=` runs in interpret mode. Lets CPU tests trace the
# EXACT production pallas dispatch paths (impl='pallas' kwarg plumbing,
# quantized serving reads, backward kernels) without TPU hardware -- the
# round-4 `extra_kv` signature drift reached hardware first because no
# CPU test could walk these code paths (tests/test_signature_matrix.py).
INTERPRET_DEFAULT = bool(os.environ.get("MUST3R_PALLAS_INTERPRET"))


def _resolve_interpret(interpret):
    return INTERPRET_DEFAULT if interpret is None else interpret


def _out_vma(*arrays):
    """Union of the inputs' varying-mesh-axes sets. pallas_call inside a
    vma-checked shard_map (the sp-sharded CA, parallel/sharded_attention.py)
    must declare how its outputs vary across mesh axes; outputs vary
    wherever any input does. Outside shard_map every set is empty and the
    annotation is a no-op."""
    vma = frozenset()
    for a in arrays:
        if a is not None:
            vma |= getattr(jax.typeof(a), "vma", frozenset())
    return vma


def _default_impl(dh: Optional[int] = None) -> str:
    """Pick the attention backend: Pallas kernels on TPU, XLA chunked
    flash elsewhere. Head dims that violate the kernels' lane tiling
    (packed kv rows must fill 128 lanes -> dh % 64 == 0; flagship dh=64)
    fall back to the XLA path instead of failing Mosaic compile — this is
    what small test/debug models hit on real hardware."""
    platform = jax.default_backend()
    if platform != "tpu":
        return "chunked"
    if dh is not None and dh % 64 != 0:
        return "chunked"
    return "pallas"


def _dot_dtype(dtype):
    """Operand dtype for the flash dots: native (bf16) on TPU -- full-rate
    MXU passes with fp32 accumulation -- but f32 elsewhere (XLA:CPU's
    partitioned DotThunk cannot execute BF16 x BF16 = F32)."""
    if jax.default_backend() == "tpu":
        return dtype
    return jnp.float32


# ---------------------------------------------------------------------------
# Reference (naive) implementation -- ground truth for tests
# ---------------------------------------------------------------------------

def attention_reference(q, k, v, mask=None):
    """Plain softmax attention. q: [..., Nq, H, Dh]; k/v: [..., Nk, H, Dh].

    mask: optional bool [..., Nq, Nk] or [..., 1, Nk]; True = attend.
    """
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    qf = q.astype(jnp.float32) * scale
    s = jnp.einsum("...qhd,...khd->...hqk", qf, k.astype(jnp.float32))
    if mask is not None:
        s = jnp.where(mask[..., None, :, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("...hqk,...khd->...qhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Self-attention
# ---------------------------------------------------------------------------

def self_attention(q, k, v, impl: Optional[str] = None):
    """Full (unmasked) multi-head attention.

    Args:
      q, k, v: [B, N, H, Dh].
    Returns:
      [B, N, H, Dh], dtype of q.

    impl='pallas' is differentiable: the forward runs the TPU kernel, the
    backward rematerializes through the XLA online-softmax path (flash
    recompute -- no scores matrix is ever stored).
    """
    impl = impl or _default_impl(q.shape[-1])
    if impl == "pallas":
        return _sa_hybrid(q, k, v)
    if impl == "chunked":
        return _sa_chunked(q, k, v)
    return attention_reference(q, k, v)


@jax.custom_vjp
def _sa_hybrid(q, k, v):
    return _sa_pallas(q, k, v)


def _sa_hybrid_fwd(q, k, v):
    return _sa_pallas(q, k, v), (q, k, v)


def _sa_hybrid_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_sa_chunked, q, k, v)
    return vjp(g)


_sa_hybrid.defvjp(_sa_hybrid_fwd, _sa_hybrid_bwd)


def _sa_chunked(q, k, v, chunk: int = 1024):
    """Differentiable flash SA. MXU dots run in the input dtype with fp32
    accumulation (full-rate bf16 training passes, fp32 parity unchanged);
    softmax statistics are fp32."""
    b, n, h, dh = q.shape
    nk = k.shape[1]
    wd = _dot_dtype(q.dtype)
    scale = jnp.asarray(1.0 / math.sqrt(dh), wd)
    if nk <= chunk:
        s = jnp.einsum("bnhd,bkhd->bhnk", q.astype(wd) * scale,
                       k.astype(wd), preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhnk,bkhd->bnhd", p.astype(wd), v.astype(wd),
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype)
    qf = (q.astype(wd) * scale).transpose(0, 2, 1, 3)       # B,H,N,Dh
    pad = (-nk) % chunk
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nb = (nk + pad) // chunk
    kc = kp.reshape(b, nb, chunk, h, dh).transpose(1, 0, 3, 2, 4)  # nb,B,H,c,Dh
    vc = vp.reshape(b, nb, chunk, h, dh).transpose(1, 0, 3, 2, 4)
    valid = (jnp.arange(nb * chunk) < nk).reshape(nb, chunk)

    def body(carry, inp):
        m, l, acc = carry
        k_c, v_c, val_c = inp
        s = jnp.einsum("bhnd,bhcd->bhnc", qf, k_c.astype(qf.dtype),
                       preferred_element_type=jnp.float32)
        s = jnp.where(val_c[None, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bhnc,bhcd->bhnd", p.astype(qf.dtype),
                                      v_c.astype(qf.dtype),
                                      preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((b, h, n, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, n, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, n, dh), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kc, vc, valid))
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _sa_pallas(q, k, v, block_q: int = 1024, block_k: int = 1024,
               interpret: bool = None):
    interpret = _resolve_interpret(interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, dh = q.shape
    # shrink blocks to the sequence when it avoids padding entirely
    if n <= block_q and n % 128 == 0:
        block_q = block_k = n
    scale = 1.0 / math.sqrt(dh)
    qt = q.transpose(0, 2, 1, 3)  # B,H,N,Dh
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    bq = min(block_q, n)
    n_q = -(-n // bq)
    n_pad = n_q * bq - n
    if n_pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    nk = n  # kv length == n for SA
    bk = min(block_k, nk)
    n_k = -(-nk // bk)
    k_pad = n_k * bk - nk
    if k_pad:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, k_pad), (0, 0)))

    def kernel(q_ref, k_ref, v_ref, o_ref):
        # keep q/k/v in their storage dtype (bf16 in production) for the
        # MXU dots -- accumulation is fp32 via preferred_element_type;
        # fp32 operands would run the MXU at 1/4 rate
        qb = q_ref[0, 0]
        m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, dh), jnp.float32)
        for j in range(n_k):
            kb = k_ref[0, 0, j * bk:(j + 1) * bk, :]
            vb = v_ref[0, 0, j * bk:(j + 1) * bk, :]
            s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            if k_pad and j == n_k - 1:
                col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
                s = jnp.where(col < bk - k_pad, s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.dot(p.astype(vb.dtype), vb,
                                       preferred_element_type=jnp.float32)
            m = m_new
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n_q * bq, dh), q.dtype,
                                       vma=_out_vma(qt, kt, vt)),
        grid=(b, h, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, n_k * bk, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n_k * bk, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, kt, vt)
    if n_pad:
        out = out[:, :, :n, :]
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Memory cross-attention
# ---------------------------------------------------------------------------

def pack_kv(k, v):
    """[B, H, S, Dh] x2 -> packed [B, H, S, 2*Dh] (concat along features).

    With Dh=64 a packed row is exactly 128 lanes -- one TPU vreg -- and the
    CA kernel DMAs a single contiguous stream instead of two."""
    return jnp.concatenate([k, v], axis=-1)


def memory_cross_attention(q, kv, labels, q_self=None, q_upper=None,
                           kv_len=None, extra_mask=None, layer=None,
                           impl: Optional[str] = None, kv_scale=None):
    """Label-masked flash cross-attention against the token memory.

    Args:
      q: [B, G, N, H, Dh] queries (G = images in this step).
      kv: [B, H, S, 2*Dh] packed memory keys|values (S = static capacity),
        or -- with ``layer`` given -- the full per-layer cache
        [L, B, H, S, 2*Dh]. Passing the full cache lets the Pallas kernel
        DMA directly out of the persistent HBM buffer instead of forcing
        XLA to materialize a per-layer slice copy.
      labels: [B, S] int32 image label per memory token; -1 = invalid slot.
      q_self: [B, G] int32; memory tokens with this label are masked
        (self-exclusion). Use -2 to disable.
      q_upper: [B, G] int32; tokens with label >= q_upper are masked
        (label-causality). Use INT32_MAX to disable.
      kv_len: scalar int32 high-water mark of the memory; compute beyond it
        is skipped (labels there must be -1). Defaults to S.
      extra_mask: optional bool [B, G, S]; True = blocked (token dropout).
      layer: optional scalar int32 indexing the L axis of a 5D ``kv``.
      kv_scale: optional per-(token, k|v) dequant scales matching ``kv``'s
        rank ([B, H, 2, S] or [L, B, H, 2, S]) for an 8-bit quantized cache
        (memory.quantize_kv). The Pallas kernel dequantizes in-flight (the
        cache is DMA'd at half the bytes of bf16); the chunked fallback
        dequantizes the layer slice. Serving-only: this path does not
        differentiate through the cache.

    Returns: [B, G, N, H, Dh].
    """
    b, g, n, h, dh = q.shape
    if layer is None:
        kv5 = kv[None]
        scale5 = None if kv_scale is None else kv_scale[None]
        layer = jnp.int32(0)
    else:
        kv5 = kv
        scale5 = kv_scale
        layer = jnp.asarray(layer, jnp.int32)
    s_cap = kv5.shape[3]
    if q_self is None:
        q_self = jnp.full((b, g), -2, jnp.int32)
    if q_upper is None:
        q_upper = jnp.full((b, g), INT32_MAX, jnp.int32)
    if kv_len is None:
        kv_len = jnp.int32(s_cap)
    impl = impl or _default_impl(dh)
    if impl == "pallas":
        if scale5 is not None:
            # quantized serving read: forward-only kernel with in-flight
            # dequant (no VJP -- serving never differentiates the cache)
            ext = (None if extra_mask is None
                   else extra_mask.astype(jnp.int32))
            return _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len,
                              layer, ext=ext, kv_scales=scale5)
        # differentiable: pallas forward + flash-backward kernels
        if extra_mask is None:
            return _ca_hybrid(q, kv5, labels, q_self, q_upper, kv_len,
                              layer)
        return _ca_hybrid_ext(q, kv5, labels, q_self, q_upper, kv_len,
                              layer, extra_mask.astype(jnp.int32))
    kv_l = jax.lax.dynamic_index_in_dim(kv5, layer, 0, False)
    if scale5 is not None:
        from must3r_tpu.memory import dequantize_kv
        s_l = jax.lax.dynamic_index_in_dim(scale5, layer, 0, False)
        kv_l = dequantize_kv(kv_l, s_l, q.dtype)
    k, v = jnp.split(kv_l, 2, axis=-1)
    return _ca_chunked(q, k, v, labels, q_self, q_upper, extra_mask)


def _ca_chunked_from_packed(q, kv5, labels, q_self, q_upper, layer):
    k, v = jnp.split(jax.lax.dynamic_index_in_dim(kv5, layer, 0, False),
                     2, axis=-1)
    return _ca_chunked(q, k, v, labels, q_self, q_upper, None)


@jax.custom_vjp
def _ca_hybrid(q, kv5, labels, q_self, q_upper, kv_len, layer):
    return _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer)


def _ca_hybrid_fwd(q, kv5, labels, q_self, q_upper, kv_len, layer):
    out, lse = _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer,
                          return_stats=True)
    return out, (q, kv5, labels, q_self, q_upper, kv_len, layer, lse, out)


def _ca_hybrid_bwd(res, g):
    """Flash-backward kernels (dQ + dK/dV) -- no score/probability tensor
    is ever materialized, unlike the XLA VJP of the chunked scan."""
    q, kv5, labels, q_self, q_upper, kv_len, layer, lse, out = res
    # delta = rowsum(g * o), in the kernels' padded row layout [B,G,H,Nq']
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 1, 3, 2)[..., None]  # B,G,H,N,1
    row_pad = lse.shape[3] - delta.shape[3]
    if row_pad:
        delta = jnp.pad(delta,
                        ((0, 0), (0, 0), (0, 0), (0, row_pad), (0, 0)))
    if _fold_stripe(q.shape[1], q.shape[2]) is not None:
        dq, dkv_l = _ca_bwd_fused_pallas(q, kv5, labels, q_self, q_upper,
                                         kv_len, layer, lse, delta, g)
    else:
        dq = _ca_bwd_dq_pallas(q, kv5, labels, q_self, q_upper, kv_len,
                               layer, lse, delta, g)
        dkv_l = _ca_bwd_dkv_pallas(q, kv5, labels, q_self, q_upper, kv_len,
                                   layer, lse, delta, g)
    dkv5 = _expand_dkv(dkv_l, kv5, layer)
    zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dq, dkv5, zero(labels), zero(q_self), zero(q_upper),
            zero(jnp.asarray(0, jnp.int32)), zero(jnp.asarray(0, jnp.int32)))


def _expand_dkv(dkv_l, kv5, layer):
    """Scatter one layer's dK|dV into the cotangent of the [L, ...] cache.
    L == 1 (the training path passes per-layer slices) skips the full
    zeros + dynamic_update_slice -- at flagship shapes that was a 16 MB
    zero-fill + copy per (layer, update) in the backward."""
    if kv5.shape[0] == 1:
        return dkv_l[None].astype(kv5.dtype)
    return jax.lax.dynamic_update_slice(
        jnp.zeros_like(kv5), dkv_l[None].astype(kv5.dtype),
        (jnp.asarray(layer, jnp.int32), 0, 0, 0, 0))


_ca_hybrid.defvjp(_ca_hybrid_fwd, _ca_hybrid_bwd)


@jax.custom_vjp
def _ca_hybrid_ext(q, kv5, labels, q_self, q_upper, kv_len, layer, ext):
    """Pallas CA with a token-dropout mask (ext int32 [B, G, S];
    nonzero = blocked) -- the training path's extra_mask."""
    return _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer,
                      ext=ext)


def _ca_hybrid_ext_fwd(q, kv5, labels, q_self, q_upper, kv_len, layer, ext):
    out, lse = _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer,
                          ext=ext, return_stats=True)
    return out, (q, kv5, labels, q_self, q_upper, kv_len, layer, ext, lse,
                 out)


def _ca_hybrid_ext_bwd(res, g):
    q, kv5, labels, q_self, q_upper, kv_len, layer, ext, lse, out = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 1, 3, 2)[..., None]
    row_pad = lse.shape[3] - delta.shape[3]
    if row_pad:
        delta = jnp.pad(delta,
                        ((0, 0), (0, 0), (0, 0), (0, row_pad), (0, 0)))
    if _fold_stripe(q.shape[1], q.shape[2]) is not None:
        dq, dkv_l = _ca_bwd_fused_pallas(q, kv5, labels, q_self, q_upper,
                                         kv_len, layer, lse, delta, g,
                                         ext=ext)
    else:
        dq = _ca_bwd_dq_pallas(q, kv5, labels, q_self, q_upper, kv_len,
                               layer, lse, delta, g, ext=ext)
        dkv_l = _ca_bwd_dkv_pallas(q, kv5, labels, q_self, q_upper, kv_len,
                                   layer, lse, delta, g, ext=ext)
    dkv5 = _expand_dkv(dkv_l, kv5, layer)
    zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dq, dkv5, zero(labels), zero(q_self), zero(q_upper),
            zero(jnp.asarray(0, jnp.int32)), zero(jnp.asarray(0, jnp.int32)),
            zero(ext))


_ca_hybrid_ext.defvjp(_ca_hybrid_ext_fwd, _ca_hybrid_ext_bwd)


def _ca_chunked(q, k, v, labels, q_self, q_upper, extra_mask=None,
                chunk: int = 1024, return_stats: bool = False):
    """Differentiable online-softmax cross-attention (XLA scan over S).

    MXU dots run in the INPUT dtype with fp32 accumulation: bf16 training
    inputs get full-rate bf16 passes (forward and, through the VJP, the
    gradient matmuls) while fp32 parity runs stay fp32. Softmax statistics
    (m, l, exp) are always fp32.

    return_stats: also return the per-row log-sum-exp [B, G, N, H, 1] for
    cross-shard softmax merges (parallel/sharded_attention). In this mode
    fully-masked rows are safe: out = 0, lse = -1e30 sentinel (an empty
    memory shard must not NaN the combine)."""
    b, g, n, h, dh = q.shape
    s_cap = k.shape[2]
    wd = _dot_dtype(q.dtype)
    scale = jnp.asarray(1.0 / math.sqrt(dh), wd)
    qf = (q.astype(wd) * scale).transpose(0, 1, 3, 2, 4)   # B,G,H,N,Dh

    c = min(chunk, s_cap)
    pad = (-s_cap) % c
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=-1)
        if extra_mask is not None:
            extra_mask = jnp.pad(extra_mask, ((0, 0), (0, 0), (0, pad)),
                                 constant_values=True)
    nb = (s_cap + pad) // c
    kc = k.reshape(b, h, nb, c, dh).transpose(2, 0, 1, 3, 4)      # nb,B,H,c,Dh
    vc = v.reshape(b, h, nb, c, dh).transpose(2, 0, 1, 3, 4)
    lc = labels.reshape(b, nb, c).transpose(1, 0, 2)               # nb,B,c
    xs = (kc, vc, lc)
    if extra_mask is not None:
        ec = extra_mask.reshape(b, g, nb, c).transpose(2, 0, 1, 3)  # nb,B,G,c
        xs = xs + (ec,)

    def body(carry, inp):
        m, l, acc = carry
        if extra_mask is not None:
            k_c, v_c, lbl, ext = inp
        else:
            k_c, v_c, lbl = inp
            ext = None
        s = jnp.einsum("bghnd,bhcd->bghnc", qf, k_c.astype(qf.dtype),
                       preferred_element_type=jnp.float32)
        lb = lbl[:, None, :]                                      # B,1,c
        allow = (lb >= 0) & (lb != q_self[..., None]) & (lb < q_upper[..., None])
        if ext is not None:
            allow = allow & (~ext)
        s = jnp.where(allow[:, :, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        if return_stats:
            # clamp so an all-masked row (m stays -inf) yields p = 0 and
            # corr = exp(0) instead of exp(-inf - (-inf)) = NaN
            mc = jnp.maximum(m_new, -1e30)
            p = jnp.exp(s - mc)
            corr = jnp.exp(jnp.maximum(m, -1e30) - mc)
        else:
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bghnc,bhcd->bghnd",
                                      p.astype(qf.dtype),
                                      v_c.astype(qf.dtype),
                                      preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    # init carries derived from qf (not fresh constants) so that under
    # shard_map they inherit qf's varying-axes type and the scan carry
    # type-checks; XLA folds the zero-multiplies away
    zero_row = jnp.zeros_like(qf[..., :1], dtype=jnp.float32)
    m0 = zero_row + _NEG_INF
    l0 = zero_row
    acc0 = jnp.zeros_like(qf, dtype=jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)
    out = (acc / jnp.maximum(l, 1e-30)).transpose(0, 1, 3, 2, 4).astype(
        q.dtype)
    if return_stats:
        lse = (jnp.maximum(m, -1e30)
               + jnp.log(jnp.maximum(l, 1e-30)))           # B,G,H,N,1
        return out, lse.transpose(0, 1, 3, 2, 4)           # B,G,N,H,1
    return out


def _ca_pallas(q, kv, labels, q_self, q_upper, kv_len, layer=None,
               block_k: Optional[int] = None, block_q: Optional[int] = None,
               interpret: bool = None, return_stats: bool = False,
               ext=None, kv_scales=None):
    """Flash CA kernel over the packed KV cache.

    The cache stays in HBM; (k|v) blocks are DMA'd as one contiguous stream
    with double buffering. The KV loop bound is the *dynamic* fill level of
    the cache, so a fixed-capacity memory costs no compute or bandwidth
    beyond its live tokens. Masking is computed in-kernel from token labels.

    ``kv`` is the full per-layer cache [L, B, H, S, 2*Dh]; ``layer`` selects
    the L row in-kernel (zero-copy read of the persistent buffer).

    ``kv_scales`` ([L, B, H, 2, S] float32, memory.quantize_kv layout)
    enables the 8-bit quantized cache read: kv holds fp8/int8, blocks are
    dequantized in-flight -- the k scale folds into the score columns after
    the QK dot, the v scale into the probability columns before the PV dot
    (both (rows, bk) elementwise ops, noise next to the MXU dots). Halves
    the DMA bytes per token vs bf16.
    """
    interpret = _resolve_interpret(interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, g, n, h, dh = q.shape
    if kv.ndim == 4:
        kv = kv[None]
    if kv_scales is not None and kv_scales.ndim == 4:
        kv_scales = kv_scales[None]
    if layer is None:
        layer = jnp.int32(0)
    s_cap = kv.shape[3]
    assert kv.shape[1:] == (b, h, s_cap, 2 * dh), kv.shape
    # measured on v5e (scripts/bench_ca_kernel.py): streaming shapes
    # (single-view queries, n <= 1024) run ~37% faster with 1024-token KV
    # blocks and the whole query set as one block (44 -> 60 TF/s on a
    # 64-keyframe update); the big render shapes prefer 512/512. Fall back
    # to 512 KV blocks when the capacity rounding is finer than 1024.
    # (_ca_prep holds the shared defaults + lane-aligned q tiling; labels
    # are pre-tiled as [rows, 1, bk] so DMA slices address only the
    # untiled major dim -- Mosaic rejects sub-tile row slices.)
    bk, bq, n_qb, q_pad, len_and_layer, labels_tiled = _ca_prep(
        q, kv, labels, kv_len, layer, block_k, block_q,
        align128=return_stats)
    stripe = None if block_q is not None else _fold_stripe(g, n)
    scale = 1.0 / math.sqrt(dh)

    qt = q.transpose(0, 1, 3, 2, 4)  # B,G,H,N,Dh
    if stripe is not None:
        # folded-G: all images' rows in one program per (b, h); per-image
        # masks applied per row stripe inside the kernel
        qt = _fold_rows(qt, stripe)
        bq, n_qb, q_pad = g * stripe, 1, 0
        g_grid = 1
    else:
        g_grid = g
        if q_pad:
            qt = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, q_pad), (0, 0)))
    q_self = q_self.astype(jnp.int32)
    q_upper = q_upper.astype(jnp.int32)

    has_ext = ext is not None
    if has_ext:
        if stripe is not None:
            ext_tiled, ext_gpad = _tile_ext_folded(ext, b, g, s_cap, bk)
        else:
            ext_tiled = ext.astype(jnp.int32).reshape(
                b * g * (s_cap // bk), 1, bk)
            ext_gpad = 1
    else:
        ext_tiled = None

    has_scl = kv_scales is not None
    nb_cap = s_cap // bk
    if has_scl:
        # [L, B, H, 2, S] -> per-KV-block rows [L*B*H*nb, 2, bk] so one
        # contiguous DMA fetches a block's (k, v) scale pair
        l_dim = kv.shape[0]
        scl_tiled = kv_scales.astype(jnp.float32).reshape(
            l_dim, b, h, 2, nb_cap, bk).transpose(0, 1, 2, 4, 3, 5).reshape(
            l_dim * b * h * nb_cap, 2, bk)
    else:
        scl_tiled = None

    def kernel(len_ref, qself_ref, qupper_ref,       # scalar prefetch
               q_ref, kv_hbm, lbl_hbm, *rest):       # inputs/outputs/scratch
        if has_ext:
            ext_hbm, *rest = rest
        if has_scl:
            scl_hbm, *rest = rest
        o_ref, *rest = rest
        if return_stats:
            lse_ref, *rest = rest
        kv_buf, lbl_buf, *rest = rest
        if has_ext:
            ext_buf, *rest = rest
        if has_scl:
            scl_buf, *rest = rest
        (sem,) = rest
        bi = pl.program_id(0)
        gi = pl.program_id(1)
        hi = pl.program_id(2)
        length = len_ref[0]
        li = len_ref[1]
        n_blocks = jnp.maximum(pl.cdiv(length, bk), 1)
        qb = q_ref[0, 0, 0]                               # (bq, Dh)

        def dma_kv(slot, idx):
            return pltpu.make_async_copy(
                kv_hbm.at[li, bi, hi, pl.ds(idx * bk, bk), :], kv_buf.at[slot],
                sem.at[slot, 0])

        def dma_l(slot, idx):
            row = bi * (s_cap // bk) + idx
            return pltpu.make_async_copy(
                lbl_hbm.at[row], lbl_buf.at[slot], sem.at[slot, 1])

        def dma_e(slot, idx):
            if stripe is not None:
                row = bi * (s_cap // bk) + idx
            else:
                row = (bi * g + gi) * (s_cap // bk) + idx
            return pltpu.make_async_copy(
                ext_hbm.at[row], ext_buf.at[slot], sem.at[slot, 2])

        def dma_s(slot, idx):
            row = ((li * b + bi) * h + hi) * nb_cap + idx
            return pltpu.make_async_copy(
                scl_hbm.at[row], scl_buf.at[slot],
                sem.at[slot, 3 if has_ext else 2])

        def start(slot, idx):
            dma_kv(slot, idx).start()
            dma_l(slot, idx).start()
            if has_ext:
                dma_e(slot, idx).start()
            if has_scl:
                dma_s(slot, idx).start()

        def allow_rows(lbl, eslot):
            """(rows_or_1, bk) bool mask from per-image label predicates."""
            if stripe is None:
                qs = qself_ref[bi, gi]
                qu = qupper_ref[bi, gi]
                a = (lbl >= 0) & (lbl != qs) & (lbl < qu)  # (1, bk)
                if has_ext:
                    a = a & (ext_buf[eslot] == 0)
                return a
            parts = []
            for si in range(g):
                qs = qself_ref[bi, si]
                qu = qupper_ref[bi, si]
                a = (lbl >= 0) & (lbl != qs) & (lbl < qu)  # (1, bk)
                if has_ext:
                    a = a & (ext_buf[eslot, si][None] == 0)
                parts.append(jnp.broadcast_to(a, (stripe, bk)))
            return jnp.concatenate(parts, axis=0)          # (bq, bk)

        start(0, 0)

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            dma_kv(slot, i).wait()
            dma_l(slot, i).wait()
            if has_ext:
                dma_e(slot, i).wait()
            if has_scl:
                dma_s(slot, i).wait()

            kb = kv_buf[slot, :, :dh]                      # (bk, Dh)
            vb = kv_buf[slot, :, dh:]
            if has_scl:
                # 8-bit cache: cast up for the MXU; scales fold into the
                # score/probability COLUMNS (per key token)
                kb = kb.astype(jnp.bfloat16)
                vb = vb.astype(jnp.bfloat16)
            lbl = lbl_buf[slot]                            # (1, bk)
            # bf16 MXU dot, fp32 accumulation (fp32 operands = 1/4 rate)
            s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            if has_scl:
                s = s * scl_buf[slot, 0:1, :]              # k dequant
            s = jnp.where(allow_rows(lbl, slot), s, _NEG_INF)
            # measured rejections (scripts/bench_ca_kernel.py, r3): bf16
            # exp 55.7->53.5 TF/s; fixed-shift softmax (block-0 row max,
            # no running max/correction) 55.7->57.3 -- inside run noise,
            # not worth the overflow hazard. See docs/PERF.md.
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            if has_scl:
                p = p * scl_buf[slot, 1:2, :]              # v dequant
            acc = acc * corr + jnp.dot(p.astype(vb.dtype), vb,
                                       preferred_element_type=jnp.float32)
            return (m_new, l, acc)

        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, dh), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[0, 0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if return_stats:
            # log-sum-exp per query row (flash-bwd recompute statistic)
            lse_ref[0, 0, 0] = m + jnp.log(jnp.maximum(l, 1e-30))

    vma = _out_vma(q, kv, labels, q_self, q_upper, kv_len, ext, kv_scales)
    out_shapes = [jax.ShapeDtypeStruct((b, g_grid, h, n_qb * bq, dh),
                                       q.dtype, vma=vma)]
    out_specs = [pl.BlockSpec((1, 1, 1, bq, dh),
                              lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi,
                                                          0))]
    if return_stats:
        # trailing singleton keeps the block's last two dims tile-legal
        out_shapes.append(jax.ShapeDtypeStruct((b, g_grid, h, n_qb * bq, 1),
                                               jnp.float32, vma=vma))
        out_specs.append(pl.BlockSpec(
            (1, 1, 1, bq, 1),
            lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi, 0)))

    in_specs = [
        pl.BlockSpec((1, 1, 1, bq, dh),
                     lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        # labels pinned to HBM: if promoted to VMEM, Mosaic cannot
        # take sub-tile-aligned slices of small int arrays
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    n_streams = 2 + int(has_ext) + int(has_scl)
    scratch = [
        pltpu.VMEM((2, bk, 2 * dh), kv.dtype),
        pltpu.VMEM((2, 1, bk), jnp.int32),
        pltpu.SemaphoreType.DMA((2, n_streams)),
    ]
    args = [len_and_layer, q_self, q_upper, qt, kv, labels_tiled]
    if has_ext:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch.insert(2, pltpu.VMEM(
            (2, ext_gpad, bk) if stripe is not None else (2, 1, bk),
            jnp.int32))
        args.append(ext_tiled)
    if has_scl:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch.insert(-1, pltpu.VMEM((2, 2, bk), jnp.float32))
        args.append(scl_tiled)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, g_grid, h, n_qb),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if return_stats else out_specs[0],
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes) if return_stats else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    out, lse = outs if return_stats else (outs, None)
    if stripe is not None:
        out = _unfold_rows(out, g, stripe)                 # B,G,H,stripe,Dh
        if lse is not None:
            lse = _unfold_rows(lse, g, stripe)
    if out.shape[3] != n:
        out = out[:, :, :, :n, :]
    out = out.transpose(0, 1, 3, 2, 4)
    if return_stats:
        # lse keeps the padded [B, G, H, rows, 1] layout (rows = stripe
        # when folded, n_qb*bq otherwise)
        return out, lse
    return out


# ---------------------------------------------------------------------------
# Flash-backward kernels (dQ and dK/dV), replacing the XLA-recompute VJP
# for the Pallas CA path. Standard flash-attention backward with the label
# masks recomputed in-kernel from the saved log-sum-exp:
#
#   p  = allow * exp(q.k^T * scale - lse)
#   dp = g . v^T
#   ds = p * (dp - delta),  delta = rowsum(g * o)
#   dq = ds . k * scale     (per q block, looping kv blocks)
#   dk = ds^T . q * scale;  dv = p^T . g   (per kv block, looping q blocks)
#
# No score/probability tensor is ever materialized in HBM -- the XLA VJP
# of the chunked scan stored ~50 MB of p per (layer, step) residual.
# ---------------------------------------------------------------------------

_FOLD_MAX_ROWS = 2048


def _fold_stripe(g: int, n: int) -> Optional[int]:
    """Folded-G row layout decision: when a step carries several images
    (training updates, offline init), pack every image's (128-aligned)
    query rows into ONE row block of R = g*stripe rows so each (b, h)
    pair runs ONE kernel program with G-x bigger MXU dots, instead of G
    programs of tiny dots (the per-program overhead dominated the update
    CA at flagship training shapes). Per-image masks apply per row
    stripe. Bounded so the f32 score block stays well inside VMEM."""
    stripe = -(-n // 128) * 128
    if g > 1 and g * stripe <= _FOLD_MAX_ROWS:
        return stripe
    return None


def _fold_rows(x, stripe: int):
    """[B, G, H, rows<=stripe, C] -> [B, 1, H, G*stripe, C] (zero-pads
    each image's rows to the stripe)."""
    b, g, h, rows, c = x.shape
    if rows != stripe:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, stripe - rows), (0, 0)))
    return x.transpose(0, 2, 1, 3, 4).reshape(b, 1, h, g * stripe, c)


def _unfold_rows(x, g: int, stripe: int):
    """[B, 1, H, G*stripe, C] -> [B, G, H, stripe, C]."""
    b, _, h, r, c = x.shape
    return x.reshape(b, h, g, stripe, c).transpose(0, 2, 1, 3, 4)


def _ca_prep(q, kv, labels, kv_len, layer, block_k, block_q,
             align128: bool = True):
    """Shared layout plumbing for the CA kernels.

    align128 rounds the query block up to a lane multiple (the backward
    kernels DMA (1, bq) stat rows, which need 128-lane alignment); the
    stats-free serving forward passes align128=False so e.g. the 224
    bucket (196 tokens) runs unpadded (block == array dim is tile-legal
    for the BlockSpec-managed buffers)."""
    b, g, n, h, dh = q.shape
    s_cap = kv.shape[3]
    if block_q is None:
        block_q = 1024 if n <= 1024 else 512
    if block_k is None:
        # big KV blocks pay off when the loop is long (few-view memories
        # would DMA mostly-dead slots: the minimum read is one block)
        block_k = 1024 if (n <= 1024 and s_cap >= 4096
                           and s_cap % 1024 == 0) else 512
    bk = min(block_k, s_cap)
    assert s_cap % bk == 0, (s_cap, bk)
    # lane-aligned q blocks (Mosaic tiling): round the block up to a
    # multiple of 128; the query axis is zero-padded to n_qb*bq
    bq = min(block_q, -(-n // 128) * 128) if align128 else min(block_q, n)
    n_qb = -(-n // bq)
    q_pad = n_qb * bq - n
    len_and_layer = jnp.stack([jnp.asarray(kv_len, jnp.int32).reshape(()),
                               jnp.asarray(layer, jnp.int32).reshape(())])
    labels_tiled = labels.reshape(b * (s_cap // bk), 1, bk)
    return bk, bq, n_qb, q_pad, len_and_layer, labels_tiled


def _tile_ext_folded(ext, b: int, g: int, s_cap: int, bk: int):
    """[B, G, S] dropout mask -> [B*(S/bk), g_pad, bk] rows so one DMA per
    KV block fetches every image's mask (g_pad: sublane-tile padding)."""
    g_pad = -(-g // 8) * 8
    nb = s_cap // bk
    e = ext.astype(jnp.int32).reshape(b, g, nb, bk).transpose(0, 2, 1, 3)
    e = jnp.pad(e, ((0, 0), (0, 0), (0, g_pad - g), (0, 0)))
    return e.reshape(b * nb, g_pad, bk), g_pad


def _pad_rows(x, q_pad):
    """Pad the query axis (axis 3) of [B, G, H, N, ...] with zeros."""
    if not q_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[3] = (0, q_pad)
    return jnp.pad(x, widths)


def _ca_bwd_dq_pallas(q, kv, labels, q_self, q_upper, kv_len, layer,
                      lse, delta, g_out, block_k=None, block_q=None,
                      interpret: bool = None, ext=None):
    interpret = _resolve_interpret(interpret)
    """dQ: same grid/DMA structure as the forward; accumulates
    ds . k over the live KV blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, g, n, h, dh = q.shape
    s_cap = kv.shape[3]
    bk, bq, n_qb, q_pad, len_and_layer, labels_tiled = _ca_prep(
        q, kv, labels, kv_len, layer, block_k, block_q)
    stripe = None if block_q is not None else _fold_stripe(g, n)
    scale = 1.0 / math.sqrt(dh)

    if stripe is not None:
        qt = _fold_rows(q.transpose(0, 1, 3, 2, 4), stripe)
        gt = _fold_rows(g_out.transpose(0, 1, 3, 2, 4), stripe)
        lse = _fold_rows(lse, stripe)       # rows already == stripe
        delta = _fold_rows(delta, stripe)
        bq, n_qb, q_pad = g * stripe, 1, 0
        g_grid = 1
    else:
        qt = _pad_rows(q.transpose(0, 1, 3, 2, 4), q_pad)
        gt = _pad_rows(g_out.transpose(0, 1, 3, 2, 4), q_pad)
        g_grid = g
    # lse/delta carry the padded row count
    has_ext = ext is not None
    if has_ext:
        if stripe is not None:
            ext_tiled, ext_gpad = _tile_ext_folded(ext, b, g, s_cap, bk)
        else:
            ext_tiled = ext.astype(jnp.int32).reshape(
                b * g * (s_cap // bk), 1, bk)
            ext_gpad = 1
    else:
        ext_tiled = None

    def kernel(len_ref, qself_ref, qupper_ref,
               q_ref, g_ref, lse_ref, dlt_ref, kv_hbm, lbl_hbm, *rest):
        if has_ext:
            ext_hbm, dq_ref, kv_buf, lbl_buf, ext_buf, sem = rest
        else:
            dq_ref, kv_buf, lbl_buf, sem = rest
        bi = pl.program_id(0)
        gi = pl.program_id(1)
        hi = pl.program_id(2)
        length = len_ref[0]
        li = len_ref[1]
        n_blocks = jnp.maximum(pl.cdiv(length, bk), 1)
        qb = q_ref[0, 0, 0]                               # (bq, Dh)
        gb = g_ref[0, 0, 0]
        lse = lse_ref[0, 0, 0]                            # (bq, 1)
        dlt = dlt_ref[0, 0, 0]

        def dma_kv(slot, idx):
            return pltpu.make_async_copy(
                kv_hbm.at[li, bi, hi, pl.ds(idx * bk, bk), :],
                kv_buf.at[slot], sem.at[slot, 0])

        def dma_l(slot, idx):
            row = bi * (s_cap // bk) + idx
            return pltpu.make_async_copy(
                lbl_hbm.at[row], lbl_buf.at[slot], sem.at[slot, 1])

        def dma_e(slot, idx):
            if stripe is not None:
                row = bi * (s_cap // bk) + idx
            else:
                row = (bi * g + gi) * (s_cap // bk) + idx
            return pltpu.make_async_copy(
                ext_hbm.at[row], ext_buf.at[slot], sem.at[slot, 2])

        def start(slot, idx):
            dma_kv(slot, idx).start()
            dma_l(slot, idx).start()
            if has_ext:
                dma_e(slot, idx).start()

        def allow_rows(lbl, eslot):
            if stripe is None:
                qs = qself_ref[bi, gi]
                qu = qupper_ref[bi, gi]
                a = (lbl >= 0) & (lbl != qs) & (lbl < qu)
                if has_ext:
                    a = a & (ext_buf[eslot] == 0)
                return a
            parts = []
            for si in range(g):
                qs = qself_ref[bi, si]
                qu = qupper_ref[bi, si]
                a = (lbl >= 0) & (lbl != qs) & (lbl < qu)
                if has_ext:
                    a = a & (ext_buf[eslot, si][None] == 0)
                parts.append(jnp.broadcast_to(a, (stripe, bk)))
            return jnp.concatenate(parts, axis=0)

        start(0, 0)

        def body(i, dq):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            dma_kv(slot, i).wait()
            dma_l(slot, i).wait()
            if has_ext:
                dma_e(slot, i).wait()
            kb = kv_buf[slot, :, :dh]                      # (bk, Dh)
            vb = kv_buf[slot, :, dh:]
            lbl = lbl_buf[slot]                            # (1, bk)
            s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            p = jnp.where(allow_rows(lbl, slot),
                          jnp.exp(s - lse), 0.0)           # (bq, bk)
            dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - dlt)
            dq = dq + jax.lax.dot(ds.astype(kb.dtype), kb,
                                  preferred_element_type=jnp.float32)
            return dq

        dq0 = jnp.zeros((bq, dh), jnp.float32)
        dq = jax.lax.fori_loop(0, n_blocks, body, dq0)
        dq_ref[0, 0, 0] = (dq * scale).astype(dq_ref.dtype)

    qblock = pl.BlockSpec((1, 1, 1, bq, dh),
                          lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi, 0))
    row = pl.BlockSpec((1, 1, 1, bq, 1),
                       lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi, 0))
    in_specs = [qblock, qblock, row, row,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.HBM)]
    scratch = [
        pltpu.VMEM((2, bk, 2 * dh), kv.dtype),
        pltpu.VMEM((2, 1, bk), jnp.int32),
        pltpu.SemaphoreType.DMA((2, 3 if has_ext else 2)),
    ]
    args = [len_and_layer, q_self.astype(jnp.int32),
            q_upper.astype(jnp.int32), qt, gt, lse, delta, kv, labels_tiled]
    if has_ext:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch.insert(2, pltpu.VMEM(
            (2, ext_gpad, bk) if stripe is not None else (2, 1, bk),
            jnp.int32))
        args.append(ext_tiled)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, g_grid, h, n_qb),
        in_specs=in_specs,
        out_specs=qblock,
        scratch_shapes=scratch,
    )
    dq = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, g_grid, h, n_qb * bq, dh), q.dtype,
            vma=_out_vma(q, kv, labels, lse, delta, g_out, ext)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if stripe is not None:
        dq = _unfold_rows(dq, g, stripe)
    if dq.shape[3] != n:
        dq = dq[:, :, :, :n, :]
    return dq.transpose(0, 1, 3, 2, 4)


def _ca_bwd_dkv_pallas(q, kv, labels, q_self, q_upper, kv_len, layer,
                       lse, delta, g_out, block_k=None, block_q=None,
                       interpret: bool = None, ext=None):
    interpret = _resolve_interpret(interpret)
    """dK|dV for ONE layer's cache row [B, H, S, 2*Dh]: each program owns
    one KV block and loops every (image, q-block), recomputing p and
    accumulating ds^T.q and p^T.g. Blocks past the live length write
    zeros. Padded q rows contribute nothing (their g/delta are zero)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, g, n, h, dh = q.shape
    s_cap = kv.shape[3]
    bk, bq, n_qb, q_pad, len_and_layer, labels_tiled = _ca_prep(
        q, kv, labels, kv_len, layer, block_k, block_q)
    stripe = None if block_q is not None else _fold_stripe(g, n)
    scale = 1.0 / math.sqrt(dh)

    if stripe is not None:
        qt = _fold_rows(q.transpose(0, 1, 3, 2, 4), stripe)
        gt = _fold_rows(g_out.transpose(0, 1, 3, 2, 4), stripe)
        lse = _fold_rows(lse, stripe)
        delta = _fold_rows(delta, stripe)
        bq, n_qb = g * stripe, 1
        g_loop = 1      # one folded q row-block covers every image
    else:
        qt = _pad_rows(q.transpose(0, 1, 3, 2, 4), q_pad)  # B,G,H,Nq,Dh
        gt = _pad_rows(g_out.transpose(0, 1, 3, 2, 4), q_pad)
        g_loop = g
    # rows for DMA: address only the untiled major dim (same trick as the
    # labels). q and g are packed side by side into one 128-lane row --
    # Mosaic rejects VMEM buffers whose lane dim (Dh=64) underfills the
    # 128-lane tile, but a :Dh slice of a full 2*Dh row is legal (the
    # forward's kv_buf uses the same pattern).
    qg_rows = jnp.concatenate([qt, gt], axis=-1).reshape(
        b * g_loop * h * n_qb, bq, 2 * dh)
    lse_rows = lse.reshape(b * g_loop * h * n_qb, 1, bq)
    dlt_rows = delta.reshape(b * g_loop * h * n_qb, 1, bq)
    has_ext = ext is not None
    if has_ext:
        if stripe is not None:
            ext_tiled, ext_gpad = _tile_ext_folded(ext, b, g, s_cap, bk)
        else:
            # per (image, kv-block) mask rows; the own block's row per image
            ext_tiled = ext.astype(jnp.int32).reshape(
                b * g * (s_cap // bk), 1, bk)
            ext_gpad = 1
    else:
        ext_tiled = None

    def kernel(len_ref, qself_ref, qupper_ref, *refs):
        if has_ext:
            (qg_hbm, lse_hbm, dlt_hbm, kv_hbm, lbl_hbm, ext_hbm,
             dkv_ref, qg_buf, lse_buf, dlt_buf, kv_buf, lbl_buf,
             ext_buf, sem) = refs
        else:
            (qg_hbm, lse_hbm, dlt_hbm, kv_hbm, lbl_hbm,
             dkv_ref, qg_buf, lse_buf, dlt_buf, kv_buf, lbl_buf,
             sem) = refs
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        ki = pl.program_id(2)
        length = len_ref[0]
        li = len_ref[1]

        @pl.when(ki * bk >= jnp.maximum(length, 1))
        def _():
            dkv_ref[...] = jnp.zeros_like(dkv_ref)

        @pl.when(ki * bk < jnp.maximum(length, 1))
        def _():
            # own KV block + labels (one sync DMA each; reused across the
            # whole q loop)
            cp = pltpu.make_async_copy(
                kv_hbm.at[li, bi, hi, pl.ds(ki * bk, bk), :], kv_buf,
                sem.at[0, 0])
            cp.start()
            lp = pltpu.make_async_copy(
                lbl_hbm.at[bi * (s_cap // bk) + ki], lbl_buf, sem.at[0, 1])
            lp.start()
            cp.wait()
            lp.wait()
            kb = kv_buf[:, :dh]
            vb = kv_buf[:, dh:]
            lbl = lbl_buf[0][None]                        # (1, bk)

            def row_id(gi, qi):
                return ((bi * g_loop + gi) * h + hi) * n_qb + qi

            def dma_qg(slot, gi, qi):
                return pltpu.make_async_copy(
                    qg_hbm.at[row_id(gi, qi)], qg_buf.at[slot],
                    sem.at[slot, 0])

            def dma_s(slot, gi, qi):
                return pltpu.make_async_copy(
                    lse_hbm.at[row_id(gi, qi)], lse_buf.at[slot],
                    sem.at[slot, 2])

            def dma_d(slot, gi, qi):
                return pltpu.make_async_copy(
                    dlt_hbm.at[row_id(gi, qi)], dlt_buf.at[slot],
                    sem.at[slot, 3])

            def dma_e(slot, gi):
                if stripe is not None:
                    row = bi * (s_cap // bk) + ki
                else:
                    row = (bi * g + gi) * (s_cap // bk) + ki
                return pltpu.make_async_copy(
                    ext_hbm.at[row], ext_buf.at[slot], sem.at[slot, 1])

            def start(slot, j):
                gi, qi = jax.lax.div(j, n_qb), jax.lax.rem(j, n_qb)
                dma_qg(slot, gi, qi).start()
                dma_s(slot, gi, qi).start()
                dma_d(slot, gi, qi).start()
                if has_ext:
                    dma_e(slot, gi).start()

            def wait(slot, j):
                gi, qi = jax.lax.div(j, n_qb), jax.lax.rem(j, n_qb)
                dma_qg(slot, gi, qi).wait()
                dma_s(slot, gi, qi).wait()
                dma_d(slot, gi, qi).wait()
                if has_ext:
                    dma_e(slot, gi).wait()

            start(0, 0)
            n_j = g_loop * n_qb

            def body(j, carry):
                dk, dv = carry
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < n_j)
                def _():
                    start(jax.lax.rem(j + 1, 2), j + 1)

                wait(slot, j)
                gi = jax.lax.div(j, n_qb)
                qb = qg_buf[slot, :, :dh]                  # (bq, Dh)
                gb = qg_buf[slot, :, dh:]
                lse_r = lse_buf[slot][0][:, None]          # (bq, 1)
                dlt_r = dlt_buf[slot][0][:, None]
                s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale
                if stripe is None:
                    qs = qself_ref[bi, gi]
                    qu = qupper_ref[bi, gi]
                    allow = (lbl >= 0) & (lbl != qs) & (lbl < qu)
                    if has_ext:
                        allow = allow & (ext_buf[slot][0][None] == 0)
                else:
                    parts = []
                    for si in range(g):
                        qs = qself_ref[bi, si]
                        qu = qupper_ref[bi, si]
                        a = (lbl >= 0) & (lbl != qs) & (lbl < qu)
                        if has_ext:
                            a = a & (ext_buf[slot, si][None] == 0)
                        parts.append(jnp.broadcast_to(a, (stripe, bk)))
                    allow = jnp.concatenate(parts, axis=0)  # (bq, bk)
                p = jnp.where(allow, jnp.exp(s - lse_r), 0.0)  # (bq, bk)
                dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = p * (dp - dlt_r)
                dv = dv + jax.lax.dot_general(
                    p.astype(gb.dtype), gb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk = dk + jax.lax.dot_general(
                    ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return dk, dv

            dk0 = jnp.zeros((bk, dh), jnp.float32)
            dv0 = jnp.zeros((bk, dh), jnp.float32)
            dk, dv = jax.lax.fori_loop(0, n_j, body, (dk0, dv0))
            dkv_ref[0, 0] = jnp.concatenate(
                [dk * scale, dv], axis=-1).astype(dkv_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, h, s_cap // bk),
        in_specs=([pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.HBM)]
                  + ([pl.BlockSpec(memory_space=pltpu.HBM)]
                     if has_ext else [])),
        out_specs=pl.BlockSpec((1, 1, bk, 2 * dh),
                               lambda bi, hi, ki, *_: (bi, hi, ki, 0)),
        scratch_shapes=([
            pltpu.VMEM((2, bq, 2 * dh), q.dtype),
            pltpu.VMEM((2, 1, bq), jnp.float32),
            pltpu.VMEM((2, 1, bq), jnp.float32),
            pltpu.VMEM((bk, 2 * dh), kv.dtype),
            pltpu.VMEM((1, bk), jnp.int32)]
            + ([pltpu.VMEM((2, ext_gpad, bk) if stripe is not None
                           else (2, 1, bk), jnp.int32)] if has_ext else [])
            + [pltpu.SemaphoreType.DMA((2, 4))]),
    )
    args = [len_and_layer, q_self.astype(jnp.int32),
            q_upper.astype(jnp.int32), qg_rows, lse_rows, dlt_rows, kv,
            labels_tiled]
    if has_ext:
        args.append(ext_tiled)
    dkv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, h, s_cap, 2 * dh), kv.dtype,
            vma=_out_vma(q, kv, labels, lse, delta, g_out, ext)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return dkv


def _ca_bwd_fused_pallas(q, kv, labels, q_self, q_upper, kv_len, layer,
                         lse, delta, g_out, block_k=None,
                         interpret: bool = None, ext=None):
    interpret = _resolve_interpret(interpret)
    """Fused dQ + dK/dV backward in ONE kernel launch (folded-G layout).

    The separate dQ and dK/dV kernels each re-DMA q/kv and recompute the
    probability block p; at training shapes (196-token images, head_dim
    64) the per-launch overhead dominated the math, so the backward paid
    twice for work it could share. This kernel keeps the dK/dV grid
    (b, h, kv-block) -- each program owns one KV block, recomputes
    p/ds once, writes its block's dk|dv, and accumulates the running dq
    directly in the (revisited) dq output block, which is scaled on the
    final KV block of each (b, h). Requires the folded-G row layout
    (one q row-block per (b, h)); callers fall back to the two kernels
    otherwise.

    Returns (dq [B,G,N,H,Dh], dkv [B,H,S,2*Dh]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, g, n, h, dh = q.shape
    s_cap = kv.shape[3]
    bk, _, _, _, len_and_layer, labels_tiled = _ca_prep(
        q, kv, labels, kv_len, layer, block_k, None)
    stripe = _fold_stripe(g, n)
    assert stripe is not None, "fused CA backward requires folded-G rows"
    scale = 1.0 / math.sqrt(dh)
    nb = s_cap // bk

    qt = _fold_rows(q.transpose(0, 1, 3, 2, 4), stripe)
    gt = _fold_rows(g_out.transpose(0, 1, 3, 2, 4), stripe)
    lse = _fold_rows(lse, stripe)       # rows already == stripe
    delta = _fold_rows(delta, stripe)
    bq = g * stripe

    qg_rows = jnp.concatenate([qt, gt], axis=-1).reshape(b * h, bq, 2 * dh)
    lse_rows = lse.reshape(b * h, 1, bq)
    dlt_rows = delta.reshape(b * h, 1, bq)
    has_ext = ext is not None
    if has_ext:
        ext_tiled, ext_gpad = _tile_ext_folded(ext, b, g, s_cap, bk)
    else:
        ext_tiled = None

    def kernel(len_ref, qself_ref, qupper_ref, *refs):
        if has_ext:
            (qg_hbm, lse_hbm, dlt_hbm, kv_hbm, lbl_hbm, ext_hbm,
             dq_ref, dkv_ref, qg_buf, lse_buf, dlt_buf, kv_buf, lbl_buf,
             ext_buf, sem) = refs
        else:
            (qg_hbm, lse_hbm, dlt_hbm, kv_hbm, lbl_hbm,
             dq_ref, dkv_ref, qg_buf, lse_buf, dlt_buf, kv_buf, lbl_buf,
             sem) = refs
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        ki = pl.program_id(2)
        length = len_ref[0]
        li = len_ref[1]

        @pl.when(ki * bk >= jnp.maximum(length, 1))
        def _():
            dkv_ref[...] = jnp.zeros_like(dkv_ref)

        @pl.when(ki * bk < jnp.maximum(length, 1))
        def _():
            row = bi * h + hi
            copies = [
                pltpu.make_async_copy(
                    kv_hbm.at[li, bi, hi, pl.ds(ki * bk, bk), :], kv_buf,
                    sem.at[0]),
                pltpu.make_async_copy(
                    lbl_hbm.at[bi * nb + ki], lbl_buf, sem.at[1]),
                pltpu.make_async_copy(qg_hbm.at[row], qg_buf, sem.at[2]),
                pltpu.make_async_copy(lse_hbm.at[row], lse_buf, sem.at[3]),
                pltpu.make_async_copy(dlt_hbm.at[row], dlt_buf, sem.at[4]),
            ]
            if has_ext:
                copies.append(pltpu.make_async_copy(
                    ext_hbm.at[bi * nb + ki], ext_buf, sem.at[5]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            kb = kv_buf[:, :dh]
            vb = kv_buf[:, dh:]
            lbl = lbl_buf[0][None]                         # (1, bk)
            qb = qg_buf[:, :dh]                            # (bq, Dh)
            gb = qg_buf[:, dh:]
            lse_r = lse_buf[0][:, None]                    # (bq, 1)
            dlt_r = dlt_buf[0][:, None]
            s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            parts = []
            for si in range(g):
                qs = qself_ref[bi, si]
                qu = qupper_ref[bi, si]
                a = (lbl >= 0) & (lbl != qs) & (lbl < qu)
                if has_ext:
                    a = a & (ext_buf[si][None] == 0)
                parts.append(jnp.broadcast_to(a, (stripe, bk)))
            allow = jnp.concatenate(parts, axis=0)         # (bq, bk)
            p = jnp.where(allow, jnp.exp(s - lse_r), 0.0)
            dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - dlt_r)
            dv = jax.lax.dot_general(p.astype(gb.dtype), gb,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds.astype(qb.dtype), qb,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dkv_ref[0, 0] = jnp.concatenate(
                [dk * scale, dv], axis=-1).astype(dkv_ref.dtype)
            dqc = jax.lax.dot(ds.astype(kb.dtype), kb,
                              preferred_element_type=jnp.float32)

            @pl.when(ki == 0)
            def _():
                dq_ref[0, 0, 0] = dqc

            @pl.when(ki > 0)
            def _():
                dq_ref[0, 0, 0] = dq_ref[0, 0, 0] + dqc

        # the dq block is revisited across ki (innermost); scale once on
        # the final KV block -- even if that block is past the live length
        @pl.when(ki == nb - 1)
        def _():
            dq_ref[0, 0, 0] = dq_ref[0, 0, 0] * scale

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.HBM)]
    if has_ext:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    out_specs = (
        pl.BlockSpec((1, 1, 1, bq, dh), lambda bi, hi, ki, *_: (bi, 0, hi,
                                                                0, 0)),
        pl.BlockSpec((1, 1, bk, 2 * dh), lambda bi, hi, ki, *_: (bi, hi,
                                                                 ki, 0)),
    )
    _vma = _out_vma(q, kv, labels, lse, delta, g_out, ext)
    out_shapes = (
        jax.ShapeDtypeStruct((b, 1, h, bq, dh), jnp.float32, vma=_vma),
        jax.ShapeDtypeStruct((b, h, s_cap, 2 * dh), kv.dtype, vma=_vma),
    )
    scratch = [
        pltpu.VMEM((bq, 2 * dh), q.dtype),
        pltpu.VMEM((1, bq), jnp.float32),
        pltpu.VMEM((1, bq), jnp.float32),
        pltpu.VMEM((bk, 2 * dh), kv.dtype),
        pltpu.VMEM((1, bk), jnp.int32),
    ]
    if has_ext:
        scratch.append(pltpu.VMEM((ext_gpad, bk), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, h, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    args = [len_and_layer, q_self.astype(jnp.int32),
            q_upper.astype(jnp.int32), qg_rows, lse_rows, dlt_rows, kv,
            labels_tiled]
    if has_ext:
        args.append(ext_tiled)
    dq, dkv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    dq = _unfold_rows(dq, g, stripe)
    if dq.shape[3] != n:
        dq = dq[:, :, :, :n, :]
    return dq.transpose(0, 1, 3, 2, 4).astype(q.dtype), dkv
