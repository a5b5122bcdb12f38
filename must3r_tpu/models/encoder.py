"""CroCo/DUSt3R-style ViT encoder as a pure function.

Parity target: reference `must3r/model/encoder.py` (`Dust3rEncoder`):
patch_embed (16x16 conv -> here an equivalent patchify+matmul, which is how
XLA lowers the conv onto the MXU anyway), 24 pre-norm SA blocks with RoPE2D,
final LayerNorm; the forward is forced fp32 (`encoder.py:46-52`).

TPU-first: the 24 homogeneous blocks run under `lax.scan` over stacked
params -- one compiled block body instead of 24 inlined copies (faster
compiles, identical runtime after XLA loop unrolling heuristics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from must3r_tpu.config import EncoderConfig
from must3r_tpu.models.layers import (
    encoder_block,
    init_encoder_block,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from must3r_tpu.ops.patch import patchify_image
from must3r_tpu.ops.rope import make_rope_tables


def init_encoder(key, cfg: EncoderConfig):
    kp, kb = jax.random.split(key)
    keys = jax.random.split(kb, cfg.depth)
    blocks = [init_encoder_block(k, cfg.embed_dim, cfg.mlp_ratio)
              for k in keys]
    # stack per-layer params for scan: leaves become [depth, ...]
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embed": init_linear(
            kp, cfg.patch_size * cfg.patch_size * 3, cfg.embed_dim),
        "blocks": blocks,
        "norm": init_layer_norm(cfg.embed_dim),
    }


def encoder_forward(params, cfg: EncoderConfig, img, positions,
                    dtype=jnp.float32, remat: bool = False,
                    impl: Optional[str] = None):
    """Encode images to patch tokens.

    Args:
      img: [B, H, W, 3] normalized images (landscape storage).
      positions: [B, N, 2] int (y, x) patch coords (portrait views carry
        swapped coords -- see tools.image).
      dtype: compute dtype. The reference forces fp32 (encoder.py:46) for
        CUDA-AMP stability; on TPU, bf16 matmuls accumulate in fp32
        natively (preferred_element_type), so bf16 is the production
        setting -- fp32 remains the parity mode. LayerNorm stats always
        run fp32 either way.

    Returns:
      tokens [B, N, embed_dim] float32.
    """
    img = img.astype(jnp.float32)
    x = linear(params["patch_embed"],
               patchify_image(img, cfg.patch_size)).astype(dtype)
    cos, sin = make_rope_tables(positions, cfg.head_dim, base=cfg.rope.base,
                                f0=cfg.rope.f0, dtype=jnp.float32)

    def body(x, blk_params):
        x = encoder_block(blk_params, x, (cos, sin), cfg.num_heads,
                          cfg.ln_eps, impl=impl)
        return x, None

    if remat:
        # training: save only the per-layer carries, recompute block
        # internals in the backward pass (trades ~1 extra forward for the
        # dominant share of activation memory)
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    return layer_norm(params["norm"], x.astype(jnp.float32), cfg.ln_eps)
