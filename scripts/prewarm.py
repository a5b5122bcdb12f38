"""Populate the persistent compile cache with the standard program set.

First compiles on a fresh host are minutes each (remote Mosaic/XLA
compiles through the TPU tunnel); a cold `slam.py` or
`get_reconstruction.py` start used to pay that per shape. This script
compiles the standard bucket set ONCE into the persistent cache
(`~/.cache/jax_must3r`, override $MUST3R_CACHE_DIR) -- afterwards every
CLI cold-starts in seconds (they all call
`cli.common.enable_compile_cache`).

Programs warmed per preset/bucket:
  * encoder chunk (max_bs batch)
  * decoder update G in {1, 2} + render (the offline/video driver set)
  * fused offline pipeline for --views (the get_reconstruction fast path)
  * SLAM fused frame step (the slam.py per-frame program)
  * one training step shape per preset (--train)

Usage:
  python scripts/prewarm.py                 # 512 preset, all 512 buckets
  python scripts/prewarm.py --preset 224
  python scripts/prewarm.py --buckets 512x384 --views 10 --train
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from must3r_tpu.cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BUCKETS_512 = ["512x384", "512x336", "512x288", "512x256", "512x160"]
BUCKETS_224 = ["224x224"]


def parse_bucket(s):
    w, h = s.split("x")
    return int(h), int(w)


def warm_bucket(core, enc_cfg, dec_cfg, hw, n_views, max_bs):
    from must3r_tpu.engine import make_fused_offline
    from must3r_tpu.engine.inference import view_positions

    h, w = hw
    n = (h // enc_cfg.patch_size) * (w // enc_cfg.patch_size)
    imgs = jnp.zeros((n_views, h, w, 3), jnp.float32)
    pos = view_positions((h, w), enc_cfg.patch_size, batch_shape=(n_views,))

    t0 = time.time()
    x = core.encode_all(imgs, pos, max_bs=max_bs)
    mem = core.new_memory(n_views, (h, w))
    for g in (2, 1):
        mem, _ = core.update(mem, x[None, :g], pos[None, :g])
    out = core.render(mem, x[None], pos[None])
    jax.block_until_ready(out)
    print(f"  update/render {h}x{w}: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    fused = make_fused_offline(core, n_views, (h, w), compute_cam=True)
    out = fused(imgs)
    jax.block_until_ready(out)
    print(f"  fused offline {n_views}v {h}x{w}: {time.time() - t0:.1f}s",
          flush=True)


def warm_slam(params, enc_cfg, dec_cfg, res):
    from must3r_tpu.engine.inference import view_positions
    from must3r_tpu.slam.model import Must3rSLAM, SlamConfig

    t0 = time.time()
    slam = Must3rSLAM(params, enc_cfg, dec_cfg,
                      SlamConfig(res=res, max_keyframes=64))
    h, w = (384, 512) if res == 512 else (224, 224)
    frame = jnp.zeros((1, h, w, 3), jnp.uint8)
    pos = view_positions((h, w), enc_cfg.patch_size, batch_shape=(1,))
    slam._hw = (h, w)
    slam._ensure_memory((h, w))
    mem, packed, _ = slam._frame_fn(slam.params, slam.mem, frame, pos,
                                    False, 500.0)
    jax.block_until_ready(packed)
    print(f"  slam frame step @{res}: {time.time() - t0:.1f}s", flush=True)


def warm_train(enc_cfg, dec_cfg, hw):
    import dataclasses

    from must3r_tpu.engine.train import (TrainSettings, cosine_schedule,
                                         make_optimizer, make_train_step,
                                         trainable_subset)
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.ops.patch import patchify_positions

    t0 = time.time()
    dec_cfg = dataclasses.replace(dec_cfg, causal=True)
    ts = TrainSettings(mem_batches=(5, 5, 5, 5), n_render=2, dropout_p=0.1,
                       dtype="bfloat16")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}
    opt = make_optimizer(cosine_schedule(1e-4, 10, 1000))
    opt_state = opt.init(trainable_subset(params, ts))
    step = make_train_step(enc_cfg, dec_cfg, ts, opt)
    h, w = hw
    b, v = 1, 20
    npatch = (h // 16) * (w // 16)
    npos = np.asarray(patchify_positions(h // 16, w // 16))
    batch = {
        "img": jnp.zeros((b, v, h, w, 3), jnp.float32),
        "pos": jnp.asarray(np.broadcast_to(npos, (b, v, npatch, 2))),
        "pts3d": jnp.ones((b, v, h, w, 3), jnp.float32),
        "camera_pose": jnp.asarray(np.broadcast_to(
            np.eye(4, dtype=np.float32), (b, v, 4, 4))),
        "valid_mask": jnp.ones((b, v, h, w), bool),
        "sky_mask": jnp.zeros((b, v, h, w), bool),
        "is_metric_scale": jnp.zeros((b,), bool),
        "render_ids": jnp.asarray([v - 2, v - 1], jnp.int32),
    }
    _, _, loss, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    print(f"  train step 20v @{h}x{w}: {time.time() - t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="512", choices=["224", "512"])
    ap.add_argument("--buckets", nargs="*", default=None,
                    help="e.g. 512x384 512x336 (default: preset set)")
    ap.add_argument("--views", type=int, default=10,
                    help="fused-offline view count to warm")
    ap.add_argument("--max_bs", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="also warm the training step")
    ap.add_argument("--skip_slam", action="store_true")
    args = ap.parse_args()

    from must3r_tpu.cli.common import load_or_init_model, make_core

    params, enc_cfg, dec_cfg = load_or_init_model(None, args.preset)
    core = make_core(params, enc_cfg, dec_cfg)
    buckets = args.buckets or (BUCKETS_224 if args.preset == "224"
                               else BUCKETS_512)
    t0 = time.time()
    for bspec in buckets:
        hw = parse_bucket(bspec)
        print(f"bucket {bspec}:", flush=True)
        warm_bucket(core, enc_cfg, dec_cfg, hw, args.views, args.max_bs)
    if not args.skip_slam:
        warm_slam(params, enc_cfg, dec_cfg,
                  512 if args.preset == "512" else 224)
    if args.train:
        warm_train(enc_cfg, dec_cfg,
                   (224, 224) if args.preset == "224" else (384, 512))
    print(f"prewarm done in {time.time() - t0:.1f}s "
          f"(cache: {os.environ.get('MUST3R_CACHE_DIR', '~/.cache/jax_must3r')})")


if __name__ == "__main__":
    main()
