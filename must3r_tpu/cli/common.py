"""Shared CLI helpers: model construction/loading for all entry points."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Honor $JAX_PLATFORMS even when the hosting environment preloaded jax:
# the axon sitecustomize explicitly config.update()s jax_platforms to
# "axon,cpu", clobbering the user's env choice. Restore the env value ONLY
# when the current config is that axon override -- never fight other
# in-process selections (e.g. a test conftest forcing "cpu" would
# otherwise be reverted to a possibly-unreachable TPU backend here).
_plat = os.environ.get("JAX_PLATFORMS")
_cur = jax.config.jax_platforms or ""
if _plat and _cur != _plat and _cur.startswith("axon"):
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass  # backend already live; keep whatever the host chose


def enable_compile_cache():
    """Persistent XLA compilation cache shared by every entry point
    (bench.py, CLIs, scripts/prewarm.py): each program compiles once per
    machine; later cold starts replay from disk in seconds instead of
    minutes of (remote) compiles. Override the location with
    $MUST3R_CACHE_DIR; disable with MUST3R_CACHE_DIR=''."""
    cache = os.environ.get("MUST3R_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_must3r"))
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_or_init_model(chkpt: Optional[str], preset: str = "512",
                       img_size: Optional[int] = None, seed: int = 0):
    """Load a checkpoint (native dir or reference .pth) or random-init a
    preset. Returns (params, enc_cfg, dec_cfg)."""
    from must3r_tpu.config import must3r_224_configs, must3r_512_configs, set_image_size
    from must3r_tpu.models import init_decoder, init_encoder

    if chkpt:
        if os.path.isdir(chkpt):
            from must3r_tpu.checkpoint import load_checkpoint
            params, enc_cfg, dec_cfg, _, _ = load_checkpoint(chkpt)
        elif chkpt.endswith(".npz"):
            from must3r_tpu.checkpoint import load_params_npz
            params, enc_cfg, dec_cfg = load_params_npz(chkpt)
        else:
            from must3r_tpu.checkpoint import convert_torch_checkpoint
            params, enc_cfg, dec_cfg = convert_torch_checkpoint(
                chkpt, img_size=img_size)
        return params, enc_cfg, dec_cfg

    if preset == "tiny":
        # smoke-test scale (CI / CPU)
        from must3r_tpu.config import DecoderConfig, EncoderConfig
        enc_cfg = EncoderConfig(img_size=(64, 64), patch_size=16,
                                embed_dim=64, depth=2, num_heads=2)
        dec_cfg = DecoderConfig(img_size=(64, 64), enc_embed_dim=64,
                                patch_size=16, embed_dim=32,
                                output_dim=16 * 16 * 7, depth=2,
                                num_heads=2)
    else:
        enc_cfg, dec_cfg = (must3r_224_configs() if preset == "224"
                            else must3r_512_configs())
    if img_size is not None:
        enc_cfg = set_image_size(enc_cfg, img_size)
        dec_cfg = set_image_size(dec_cfg, img_size)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}
    return params, enc_cfg, dec_cfg


def make_core(params, enc_cfg, dec_cfg, amp: str = "bf16", kv_quant=None):
    from must3r_tpu.engine import InferenceCore

    dtype = jnp.bfloat16 if amp in ("bf16", "bfloat16") else jnp.float32
    return InferenceCore(params["encoder"], params["decoder"], enc_cfg,
                         dec_cfg, dtype=dtype, kv_quant=kv_quant)
