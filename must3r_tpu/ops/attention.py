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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = jnp.iinfo(jnp.int32).max
_NEG_INF = -1e30


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
               interpret: bool = False):
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
        out_shape=jax.ShapeDtypeStruct((b, h, n_q * bq, dh), q.dtype),
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
                           impl: Optional[str] = None):
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

    Returns: [B, G, N, H, Dh].
    """
    b, g, n, h, dh = q.shape
    if layer is None:
        kv5 = kv[None]
        layer = jnp.int32(0)
    else:
        kv5 = kv
        layer = jnp.asarray(layer, jnp.int32)
    s_cap = kv5.shape[3]
    if q_self is None:
        q_self = jnp.full((b, g), -2, jnp.int32)
    if q_upper is None:
        q_upper = jnp.full((b, g), INT32_MAX, jnp.int32)
    if kv_len is None:
        kv_len = jnp.int32(s_cap)
    impl = impl or _default_impl(dh)
    if impl == "pallas" and extra_mask is None:
        # differentiable: pallas forward, XLA-recompute backward
        return _ca_hybrid(q, kv5, labels, q_self, q_upper, kv_len, layer)
    k, v = jnp.split(jax.lax.dynamic_index_in_dim(kv5, layer, 0, False),
                     2, axis=-1)
    return _ca_chunked(q, k, v, labels, q_self, q_upper, extra_mask)


def _ca_chunked_from_packed(q, kv5, labels, q_self, q_upper, layer):
    k, v = jnp.split(jax.lax.dynamic_index_in_dim(kv5, layer, 0, False),
                     2, axis=-1)
    return _ca_chunked(q, k, v, labels, q_self, q_upper, None)


@jax.custom_vjp
def _ca_hybrid(q, kv5, labels, q_self, q_upper, kv_len, layer):
    return _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer)


def _ca_hybrid_fwd(q, kv5, labels, q_self, q_upper, kv_len, layer):
    out = _ca_pallas(q, kv5, labels, q_self, q_upper, kv_len, layer)
    return out, (q, kv5, labels, q_self, q_upper, layer)


def _ca_hybrid_bwd(res, g):
    q, kv5, labels, q_self, q_upper, layer = res
    _, vjp = jax.vjp(
        lambda q_, kv_: _ca_chunked_from_packed(q_, kv_, labels, q_self,
                                                q_upper, layer), q, kv5)
    dq, dkv = vjp(g)
    zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dq, dkv, zero(labels), zero(q_self), zero(q_upper),
            zero(jnp.asarray(0, jnp.int32)), zero(jnp.asarray(0, jnp.int32)))


_ca_hybrid.defvjp(_ca_hybrid_fwd, _ca_hybrid_bwd)


def _ca_chunked(q, k, v, labels, q_self, q_upper, extra_mask=None,
                chunk: int = 1024):
    """Differentiable online-softmax cross-attention (XLA scan over S).

    MXU dots run in the INPUT dtype with fp32 accumulation: bf16 training
    inputs get full-rate bf16 passes (forward and, through the VJP, the
    gradient matmuls) while fp32 parity runs stay fp32. Softmax statistics
    (m, l, exp) are always fp32."""
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
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bghnc,bhcd->bghnd",
                                      p.astype(qf.dtype),
                                      v_c.astype(qf.dtype),
                                      preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((b, g, h, n, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, g, h, n, 1), jnp.float32)
    acc0 = jnp.zeros((b, g, h, n, dh), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 1, 3, 2, 4).astype(q.dtype)


def _ca_pallas(q, kv, labels, q_self, q_upper, kv_len, layer=None,
               block_k: Optional[int] = None, block_q: Optional[int] = None,
               interpret: bool = False):
    """Flash CA kernel over the packed KV cache.

    The cache stays in HBM; (k|v) blocks are DMA'd as one contiguous stream
    with double buffering. The KV loop bound is the *dynamic* fill level of
    the cache, so a fixed-capacity memory costs no compute or bandwidth
    beyond its live tokens. Masking is computed in-kernel from token labels.

    ``kv`` is the full per-layer cache [L, B, H, S, 2*Dh]; ``layer`` selects
    the L row in-kernel (zero-copy read of the persistent buffer).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, g, n, h, dh = q.shape
    if kv.ndim == 4:
        kv = kv[None]
    if layer is None:
        layer = jnp.int32(0)
    s_cap = kv.shape[3]
    assert kv.shape[1:] == (b, h, s_cap, 2 * dh), kv.shape
    # measured on v5e (scripts/bench_ca_kernel.py): streaming shapes
    # (single-view queries, n <= 1024) run ~37% faster with 1024-token KV
    # blocks and the whole query set as one block (44 -> 60 TF/s on a
    # 64-keyframe update); the big render shapes prefer 512/512. Fall back
    # to 512 KV blocks when the capacity rounding is finer than 1024.
    if block_q is None:
        block_q = 1024 if n <= 1024 else 512
    if block_k is None:
        block_k = 1024 if (n <= 1024 and s_cap % 1024 == 0) else 512
    bk = min(block_k, s_cap)
    assert s_cap % bk == 0, (
        f"memory capacity {s_cap} must be a multiple of block_k={bk}; "
        "round capacities up when allocating the memory")
    scale = 1.0 / math.sqrt(dh)

    qt = q.transpose(0, 1, 3, 2, 4)  # B,G,H,N,Dh
    # tile the query axis so the f32 score block (bq x bk) fits VMEM
    bq = min(block_q, n)
    n_qb = -(-n // bq)
    q_pad = n_qb * bq - n
    if q_pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, q_pad), (0, 0)))
    len_and_layer = jnp.stack([jnp.asarray(kv_len, jnp.int32).reshape(()),
                               jnp.asarray(layer, jnp.int32).reshape(())])
    q_self = q_self.astype(jnp.int32)
    q_upper = q_upper.astype(jnp.int32)
    # labels pre-tiled as [rows, 1, bk]: DMA slices then address only the
    # untiled major dim, and source/destination tiles are both (1, bk) --
    # Mosaic rejects sub-tile row slices of a plain [B, S] i32 array and
    # 1D<->2D tile mismatches
    labels_tiled = labels.reshape(b * (s_cap // bk), 1, bk)

    def kernel(len_ref, qself_ref, qupper_ref,       # scalar prefetch
               q_ref, kv_hbm, lbl_hbm,               # inputs
               o_ref,                                 # output
               kv_buf, lbl_buf, sem):                 # scratch
        bi = pl.program_id(0)
        gi = pl.program_id(1)
        hi = pl.program_id(2)
        length = len_ref[0]
        li = len_ref[1]
        n_blocks = jnp.maximum(pl.cdiv(length, bk), 1)
        qs = qself_ref[bi, gi]
        qu = qupper_ref[bi, gi]
        qb = q_ref[0, 0, 0]                               # (N, Dh)

        def dma_kv(slot, idx):
            return pltpu.make_async_copy(
                kv_hbm.at[li, bi, hi, pl.ds(idx * bk, bk), :], kv_buf.at[slot],
                sem.at[slot, 0])

        def dma_l(slot, idx):
            row = bi * (s_cap // bk) + idx
            return pltpu.make_async_copy(
                lbl_hbm.at[row], lbl_buf.at[slot], sem.at[slot, 1])

        def start(slot, idx):
            dma_kv(slot, idx).start()
            dma_l(slot, idx).start()

        start(0, 0)

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            dma_kv(slot, i).wait()
            dma_l(slot, i).wait()

            kb = kv_buf[slot, :, :dh]                      # (bk, Dh)
            vb = kv_buf[slot, :, dh:]
            lbl = lbl_buf[slot]                            # (1, bk)
            # bf16 MXU dot, fp32 accumulation (fp32 operands = 1/4 rate)
            s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            allow = (lbl >= 0) & (lbl != qs) & (lbl < qu)  # (1, bk)
            s = jnp.where(allow, s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.dot(p.astype(vb.dtype), vb,
                                       preferred_element_type=jnp.float32)
            return (m_new, l, acc)

        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, dh), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[0, 0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, g, h, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, bq, dh),
                         lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            # labels pinned to HBM: if promoted to VMEM, Mosaic cannot
            # take sub-tile-aligned slices of small int arrays
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, bq, dh),
                               lambda bi, gi, hi, qi, *_: (bi, gi, hi, qi,
                                                           0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk, 2 * dh), kv.dtype),
            pltpu.VMEM((2, 1, bk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, h, n_qb * bq, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(len_and_layer, q_self, q_upper, qt, kv, labels_tiled)
    if q_pad:
        out = out[:, :, :, :n, :]
    return out.transpose(0, 1, 3, 2, 4)
