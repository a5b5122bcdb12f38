"""The MUSt3R token memory as a functional, fixed-capacity pytree.

The reference keeps memory as a Python list of 12 dynamically-growing
tensors plus labels/counters (``must3r/model/decoder.py:141-147,337``) and
edits it with concat / boolean indexing
(``must3r/engine/inference.py:204-227``). None of that is jit-compatible.

TPU-native design: one preallocated HBM buffer per state, static capacity,
and every reference edit (append / evict-by-label / update-in-place /
relabel) becomes a masked write at static shape:

  * ``kv``      [L, B, H, S, 2*Dh]   packed per-head (k | v) cache, bf16.
                With Dh=64 a row is 128 lanes -- one TPU vreg.
  * ``labels``  [B, S] int32         image label per token, -1 = free slot.
  * ``length``  int32                high-water mark; the CA kernel's KV
                                     loop stops here, so capacity is free.
  * ``n_imgs``, ``protected_imgs``, ``protected_tokens``  int32 counters
    (reference memory-state tuple, ``decoder.py:141-147``).

All functions are pure; under ``jit`` with ``donate_argnums`` the updates
happen in-place in HBM.

Layout invariant: an image's tokens are always appended as ONE contiguous
run per batch element (``append_tokens``), and ``compact`` preserves slot
order among live tokens (stable sort) -- so a label's slots form a single
contiguous segment at all times. ``update_label_tokens`` and
``refresh_label_from_segment`` rely on this and locate the segment
independently per batch element (offsets may differ across the batch after
per-element eviction patterns diverge).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max

# Quantized KV storage (serving capacity lever, SURVEY §5.7): tokens are
# stored in 8-bit with one float32 scale per (token, k|v half); the CA
# kernel dequantizes in-flight. Halves the cache's HBM footprint -- a chip
# that held a 100-keyframe memory in bf16 holds ~200 keyframes quantized.
QUANT_DTYPES = {
    "fp8": (jnp.float8_e4m3fn, 448.0),   # e4m3 max finite
    "int8": (jnp.int8, 127.0),
}


@jax.tree_util.register_dataclass
@dataclass
class MemoryState:
    kv: jax.Array               # [L, B, H, S, 2*Dh]; bf16, or 8-bit quantized
    labels: jax.Array           # [B, S] int32; -1 = free
    length: jax.Array           # [] int32 high-water mark
    n_imgs: jax.Array           # [] int32 images ever committed
    protected_imgs: jax.Array   # [] int32
    protected_tokens: jax.Array  # [] int32
    # [L, B, H, 2, S] float32 per-(token, k|v-half) dequant scales; None for
    # full-precision storage. deq(x) = x * scale regardless of 8-bit format.
    kv_scale: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.kv.shape[3]

    @property
    def depth(self) -> int:
        return self.kv.shape[0]


def _quant_max(dtype) -> Optional[float]:
    for qdt, qmax in QUANT_DTYPES.values():
        if jnp.dtype(dtype) == qdt:
            return qmax
    return None


def quantize_kv(new_kv: jax.Array, dtype):
    """Per-token symmetric quantization of packed (k | v) tokens.

    Args:
      new_kv: [..., T, 2*Dh] float tokens (k | v packed on features).
      dtype: jnp.float8_e4m3fn or jnp.int8.
    Returns:
      (q [..., T, 2*Dh] dtype, scale [..., 2, T] float32) with
      deq(q) = q * scale -- identical dequant rule for both formats.
    """
    qmax = _quant_max(dtype)
    assert qmax is not None, dtype
    dh = new_kv.shape[-1] // 2
    x = new_kv.astype(jnp.float32)
    halves, scales = [], []
    for lo, hi in ((0, dh), (dh, 2 * dh)):
        h = x[..., lo:hi]
        amax = jnp.max(jnp.abs(h), axis=-1)                 # [..., T]
        s = jnp.maximum(amax / qmax, 1e-30)
        q = h / s[..., None]
        if jnp.dtype(dtype) == jnp.int8:
            q = jnp.round(q)
        halves.append(q.astype(dtype))
        scales.append(s)
    return (jnp.concatenate(halves, axis=-1),
            jnp.stack(scales, axis=-2))                     # [..., 2, T]


def dequantize_kv(kv: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_kv` (XLA fallback path; the Pallas CA
    kernel dequantizes in-flight instead).

    kv: [..., S, 2*Dh] quantized; scale: [..., 2, S] -> [..., S, 2*Dh]."""
    dh = kv.shape[-1] // 2
    x = kv.astype(jnp.float32)
    k = x[..., :dh] * scale[..., 0, :, None]
    v = x[..., dh:] * scale[..., 1, :, None]
    return jnp.concatenate([k, v], axis=-1).astype(dtype)


def round_capacity(n_tokens: int, multiple: int = 1024) -> int:
    """Round a capacity up to the CA kernel's block size."""
    return -(-n_tokens // multiple) * multiple


def init_memory(depth: int, batch: int, num_heads: int, head_dim: int,
                capacity: int, dtype=jnp.bfloat16) -> MemoryState:
    """Fresh empty memory (reference `_get_empty_memory`, decoder.py:141-147).

    dtype may be a quantized storage format (jnp.float8_e4m3fn / jnp.int8,
    see QUANT_DTYPES), in which case a per-token scale array is allocated."""
    scale = None
    if _quant_max(dtype) is not None:
        scale = jnp.zeros((depth, batch, num_heads, 2, capacity),
                          jnp.float32)
    return MemoryState(
        kv=jnp.zeros((depth, batch, num_heads, capacity, 2 * head_dim), dtype),
        labels=jnp.full((batch, capacity), -1, jnp.int32),
        length=jnp.int32(0),
        n_imgs=jnp.int32(0),
        protected_imgs=jnp.int32(0),
        protected_tokens=jnp.int32(0),
        kv_scale=scale,
    )


def _coerce_kv(mem: MemoryState, new_kv: jax.Array):
    """(quantized values, scales-or-None) for tokens entering the cache."""
    if mem.kv_scale is None:
        return new_kv.astype(mem.kv.dtype), None
    return quantize_kv(new_kv, mem.kv.dtype)


def append_tokens(mem: MemoryState, new_kv: jax.Array,
                  new_labels: jax.Array) -> MemoryState:
    """Append G*N tokens at the high-water mark.

    Args:
      new_kv: [L, B, H, T, 2*Dh] prepared tokens (T = G*N), float; quantized
        on entry when the cache stores 8-bit.
      new_labels: [B, T] int32 labels for the new tokens.

    Mirrors the reference's per-layer ``torch.concatenate`` grow
    (decoder.py:306,330) as one dynamic-update-slice at static shape.
    """
    t = new_kv.shape[3]
    new_q, new_s = _coerce_kv(mem, new_kv)
    kv = jax.lax.dynamic_update_slice(
        mem.kv, new_q, (0, 0, 0, mem.length, 0))
    scale = mem.kv_scale
    if new_s is not None:
        scale = jax.lax.dynamic_update_slice(
            scale, new_s, (0, 0, 0, 0, mem.length))
    labels = jax.vmap(
        lambda lab, new: jax.lax.dynamic_update_slice(lab, new, (mem.length,))
    )(mem.labels, new_labels.astype(jnp.int32))
    return MemoryState(kv=kv, labels=labels, length=mem.length + t,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens, kv_scale=scale)


def write_tokens_at(mem: MemoryState, new_kv: jax.Array, offset) -> MemoryState:
    """Overwrite the KV values of tokens starting at ``offset`` (labels,
    length, counters unchanged). Used by the feedback rewrite and by
    refinement passes."""
    new_q, new_s = _coerce_kv(mem, new_kv)
    kv = jax.lax.dynamic_update_slice(
        mem.kv, new_q, (0, 0, 0, offset, 0))
    scale = mem.kv_scale
    if new_s is not None:
        scale = jax.lax.dynamic_update_slice(
            scale, new_s, (0, 0, 0, 0, offset))
    return MemoryState(kv=kv, labels=mem.labels, length=mem.length,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens, kv_scale=scale)


def commit_images(mem: MemoryState, n_new_imgs: int,
                  tokens_per_img: int = 0,
                  protected_limit=None) -> MemoryState:
    """Advance the image counter after an update step; optionally grow the
    protected prefix (reference decoder.py:455-459)."""
    n_imgs = mem.n_imgs + jnp.int32(n_new_imgs)
    if protected_limit is None:
        # inference semantics: everything committed is protected
        # (decoder.py:251,337: protected_imgs = mem_nimgs)
        protected_imgs = n_imgs
        protected_tokens = mem.length
    else:
        new_prot = jnp.minimum(jnp.int32(protected_limit),
                               mem.protected_imgs + jnp.int32(n_new_imgs))
        grow = new_prot - mem.protected_imgs
        protected_tokens = (mem.protected_tokens
                            + grow * jnp.int32(tokens_per_img))
        protected_imgs = new_prot
    return MemoryState(kv=mem.kv, labels=mem.labels, length=mem.length,
                       n_imgs=n_imgs, protected_imgs=protected_imgs,
                       protected_tokens=protected_tokens,
                       kv_scale=mem.kv_scale)


def evict_label(mem: MemoryState, label) -> MemoryState:
    """Invalidate all tokens of one image (reference `_remove_from_mem`,
    inference.py:204-212). The slots become holes (label -1): the CA kernel
    masks them; ``compact`` reclaims them."""
    labels = jnp.where(mem.labels == jnp.int32(label), -1, mem.labels)
    return MemoryState(kv=mem.kv, labels=labels, length=mem.length,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens,
                       kv_scale=mem.kv_scale)


def relabel(mem: MemoryState, old_label, new_label) -> MemoryState:
    """Rename an image's tokens (reference `_restore_label_in_mem`,
    inference.py:215-218)."""
    labels = jnp.where(mem.labels == jnp.int32(old_label),
                       jnp.int32(new_label), mem.labels)
    return MemoryState(kv=mem.kv, labels=labels, length=mem.length,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens,
                       kv_scale=mem.kv_scale)


def update_label_tokens(mem: MemoryState, label, new_kv: jax.Array,
                        new_labels_row: jax.Array) -> MemoryState:
    """Replace the KV values of every token carrying ``label`` with new
    values, in storage order (reference `_update_in_mem`,
    inference.py:412-443: refinement passes overwrite a seen image's tokens).

    Args:
      new_kv: [L, B, H, T, 2*Dh] replacement tokens for this image
        (T = tokens per image).
      new_labels_row: [B, T] labels the replacements carry (== label).

    Invariant (see module docstring): an image's tokens are appended as one
    contiguous run and `compact` preserves slot order (stable sort), so the
    slot range is [start_b, start_b+T) per batch element, where
    start_b = argmax(labels[b] == label). Batch elements may hold the image
    at different offsets; each gets its own dynamic-update-slice.
    """
    del new_labels_row
    hit = (mem.labels == jnp.int32(label))                 # [B, S]
    starts = jnp.argmax(hit, axis=1).astype(jnp.int32)     # [B]
    exists = jnp.any(hit, axis=1)                          # [B]
    new_q, new_s = _coerce_kv(mem, new_kv)

    def upd(kv_b, new_b, start):
        return jax.lax.dynamic_update_slice(kv_b, new_b, (0, 0, start, 0))

    kv = jax.vmap(upd, in_axes=(1, 1, 0), out_axes=1)(mem.kv, new_q, starts)
    # only apply where the label exists; otherwise keep as-is
    kv = jnp.where(exists[None, :, None, None, None], kv, mem.kv)
    scale = mem.kv_scale
    if new_s is not None:
        def upd_s(s_b, new_b, start):
            return jax.lax.dynamic_update_slice(s_b, new_b, (0, 0, 0, start))

        scale = jax.vmap(upd_s, in_axes=(1, 1, 0), out_axes=1)(
            scale, new_s, starts)
        scale = jnp.where(exists[None, :, None, None], scale, mem.kv_scale)
    return MemoryState(kv=kv, labels=mem.labels, length=mem.length,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens, kv_scale=scale)


def refresh_label_from_segment(mem: MemoryState, old_label, seg_start,
                               n_tokens: int) -> MemoryState:
    """Copy the KV values of the contiguous segment
    [seg_start, seg_start + n_tokens) over the slots carrying
    ``old_label``, without touching labels or counters.

    With a following :func:`evict_label` of the segment's label this
    implements the reference's keyframe-refresh bookkeeping in
    `inference_video_multi_ar` (`_update_in_mem` + `_remove_from_mem`,
    inference.py:204-227). Label 0 (the reference image) is never updated
    (values kept), matching the reference's skip.

    Batch-correct: the target run may sit at a different offset per batch
    element (same contiguity invariant as :func:`update_label_tokens`)."""
    hit = mem.labels == jnp.int32(old_label)               # [B, S]
    pos = jnp.argmax(hit, axis=1).astype(jnp.int32)        # [B]
    ok = jnp.any(hit, axis=1) & (jnp.int32(old_label) > 0)  # [B]

    def refresh(kv_b, pos_b):
        # kv_b: [L, H, S, 2*Dh] one batch element
        new_b = jax.lax.dynamic_slice(
            kv_b, (0, 0, seg_start, 0),
            (*kv_b.shape[:2], n_tokens, kv_b.shape[3]))
        return jax.lax.dynamic_update_slice(kv_b, new_b, (0, 0, pos_b, 0))

    kv = jax.vmap(refresh, in_axes=(1, 0), out_axes=1)(mem.kv, pos)
    kv = jnp.where(ok[None, :, None, None, None], kv, mem.kv)
    scale = mem.kv_scale
    if scale is not None:
        def refresh_s(s_b, pos_b):
            # s_b: [L, H, 2, S] one batch element
            new_b = jax.lax.dynamic_slice(
                s_b, (0, 0, 0, seg_start), (*s_b.shape[:3], n_tokens))
            return jax.lax.dynamic_update_slice(s_b, new_b, (0, 0, 0, pos_b))

        scale = jax.vmap(refresh_s, in_axes=(1, 0), out_axes=1)(scale, pos)
        scale = jnp.where(ok[None, :, None, None], scale, mem.kv_scale)
    return MemoryState(kv=kv, labels=mem.labels, length=mem.length,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens, kv_scale=scale)


def set_n_imgs(mem: MemoryState, n_imgs) -> MemoryState:
    """Host-driven label counter override (the reference resets
    mem_nimgs = len(img_labels) after video bookkeeping,
    inference.py:341)."""
    return MemoryState(kv=mem.kv, labels=mem.labels, length=mem.length,
                       n_imgs=jnp.int32(n_imgs),
                       protected_imgs=mem.protected_imgs,
                       protected_tokens=mem.protected_tokens,
                       kv_scale=mem.kv_scale)


def compact(mem: MemoryState) -> MemoryState:
    """Pack live tokens to the front, reclaiming evicted holes.

    O(S log S) host-free gather; call occasionally (e.g. when holes exceed
    25% of length) -- the label masks keep results identical either way.
    The stable sort preserves slot order among live tokens, keeping each
    image's run contiguous (the invariant `update_label_tokens` relies on).
    Each batch element packs independently; `length` becomes the max live
    count (slots past a shorter element's count stay label -1, which the
    CA kernel masks).
    """
    live = mem.labels >= 0                                   # [B, S]

    def pack(kv_b, lab_b, live_b):
        order = jnp.argsort(~live_b, stable=True)            # live first
        return jnp.take(kv_b, order, axis=2), jnp.take(lab_b, order)

    kv, labels = jax.vmap(pack, in_axes=(1, 0, 0), out_axes=(1, 0))(
        mem.kv, mem.labels, live)
    scale = mem.kv_scale
    if scale is not None:
        def pack_s(s_b, live_b):
            order = jnp.argsort(~live_b, stable=True)
            return jnp.take(s_b, order, axis=3)

        scale = jax.vmap(pack_s, in_axes=(1, 0), out_axes=1)(scale, live)
    new_len = jnp.max(jnp.sum(live, axis=1)).astype(jnp.int32)
    return MemoryState(kv=kv, labels=labels, length=new_len,
                       n_imgs=mem.n_imgs, protected_imgs=mem.protected_imgs,
                       protected_tokens=jnp.minimum(mem.protected_tokens,
                                                    new_len),
                       kv_scale=scale)


def truncate(mem: MemoryState, length, n_imgs=None) -> MemoryState:
    """Roll back to an earlier high-water mark (drop the tokens appended
    after it). The SLAM tentative-update-then-maybe-discard pattern
    (slam/model.py:499-527) becomes: run update, keep either the new state
    or ``truncate`` -- no recompute. Stale values past `length` are
    harmless: their labels are -1 and the CA kernel never reads past the
    high-water mark."""
    keep = jax.lax.broadcasted_iota(jnp.int32, mem.labels.shape, 1) < length
    labels = jnp.where(keep, mem.labels, -1)
    n_imgs = mem.n_imgs if n_imgs is None else jnp.int32(n_imgs)
    return MemoryState(kv=mem.kv, labels=labels, length=jnp.int32(length),
                       n_imgs=n_imgs,
                       protected_imgs=jnp.minimum(mem.protected_imgs,
                                                  n_imgs),
                       protected_tokens=jnp.minimum(mem.protected_tokens,
                                                    jnp.int32(length)),
                       kv_scale=mem.kv_scale)
