"""Patchify / unpatchify primitives.

Parity targets: dust3r's ``PatchEmbedDust3R`` position grid (conv patchify +
cartesian (y, x) patch coordinates) and the reference's pixel-shuffle
``unpatchify`` (``/root/reference/must3r/tools/image.py:9-14``).

TPU note: the conv patchify itself lives in the model (it is a weight-bearing
op); here are the shape-only helpers.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify_positions(h_patches: int, w_patches: int, dtype=jnp.int32):
    """(y, x) coordinate per patch, row-major: [h*w, 2]."""
    ys = jnp.arange(h_patches, dtype=dtype)
    xs = jnp.arange(w_patches, dtype=dtype)
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    return grid.reshape(h_patches * w_patches, 2)


def unpatchify(x, patch_size: int, true_shape):
    """[B, N, P*P*C] tokens -> [B, H, W, C] image.

    Feature layout is channel-major within a patch (c * P*P + i * P + j),
    matching torch ``pixel_shuffle`` semantics used by the reference head
    so converted checkpoints predict identical pixel arrangements.
    """
    b, n, f = x.shape
    h, w = true_shape
    p = patch_size
    hp, wp = h // p, w // p
    assert n == hp * wp, (n, hp, wp)
    c = f // (p * p)
    x = x.reshape(b, hp, wp, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # B, hp, p, wp, p, C
    return x.reshape(b, h, w, c)


def patchify_image(img, patch_size: int):
    """[B, H, W, C] image -> [B, N, P*P*C] tokens (inverse of unpatchify)."""
    b, h, w, c = img.shape
    p = patch_size
    hp, wp = h // p, w // p
    x = img.reshape(b, hp, p, wp, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)        # B, hp, wp, C, p, p
    return x.reshape(b, hp * wp, p * p * c)
