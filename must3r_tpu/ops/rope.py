"""2D rotary position embedding (RoPE2D) as pure functions.

Behavioral parity with croco's ``RoPE2D`` (used by the reference via
``must3r/model/blocks/pos_embed.py:7-22`` and the curope CUDA kernel): the
head dimension is split into a y-half and an x-half; each half receives 1D
rotary rotation driven by the token's (y, x) patch coordinate. The adaptive
``f0`` factor rescales positions for resolution transfer.

TPU-first design: instead of a stateful module with a cos/sin cache, we
precompute cos/sin tables once per (positions, head_dim) as arrays that ride
along the jitted computation; XLA fuses the elementwise rotation into the
surrounding matmuls. No CUDA kernel needed -- the rotation is pure VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_rope_tables(positions, head_dim: int, base: float = 100.0,
                     f0: float = 1.0, dtype=jnp.float32):
    """Build cos/sin tables for 2D RoPE.

    Args:
      positions: int array [..., N, 2] of (y, x) patch coordinates.
      head_dim: per-head feature dimension (must be divisible by 4).
      base: frequency base (reference 'RoPE100' -> 100.0).
      f0: adaptive position rescale (old_res / new_res).

    Returns:
      (cos, sin), each [..., N, 2, head_dim // 4]: per-axis tables, the last
      dim holding the distinct frequencies of one axis-half.
    """
    assert head_dim % 4 == 0, head_dim
    d_axis = head_dim // 2          # per-axis sub-dimension (y-half / x-half)
    n_freq = d_axis // 2            # distinct frequencies within an axis
    k = jnp.arange(n_freq, dtype=jnp.float32)
    inv_freq = base ** (-2.0 * k / d_axis)                   # [n_freq]
    t = positions.astype(jnp.float32) * f0                   # [..., N, 2]
    angles = t[..., None] * inv_freq                         # [..., N, 2, n_freq]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope2d(tokens, cos, sin):
    """Rotate tokens with precomputed 2D RoPE tables.

    Args:
      tokens: [..., N, H, Dh] (heads next-to-last) or [..., N, Dh].
      cos, sin: [..., N, 2, Dh // 4] from :func:`make_rope_tables`.

    Returns:
      rotated tokens, same shape/dtype as ``tokens``.

    Feature layout matches the reference: the first Dh/2 features are the
    y-half, the last Dh/2 the x-half; within a half, features [0:Dh/4] and
    [Dh/4:Dh/2] form the (x1, x2) rotation pairs ("rotate_half" convention).
    """
    orig_dtype = tokens.dtype
    dh = tokens.shape[-1]
    n_freq = dh // 4
    shape = tokens.shape
    # [..., N, (H,), 2 axes (y|x), 2 rotation halves, n_freq]
    t = tokens.reshape(*shape[:-1], 2, 2, n_freq).astype(cos.dtype)
    if t.ndim == cos.ndim + 2:
        # tokens carry a heads axis between N and Dh: broadcast tables over it
        cos = cos[..., None, :, :]
        sin = sin[..., None, :, :]
    x1 = t[..., 0, :]   # [..., N, (H,), 2, n_freq]
    x2 = t[..., 1, :]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = jnp.stack([o1, o2], axis=-2)
    return out.reshape(shape).astype(orig_dtype)
