"""Scale soak at benchmark lengths (VERDICT r2 item 6), on the real chip.

1. SLAM/VO: a 500-frame 512x384 synthetic stream through Must3rSLAM;
   reports fps per 100-frame window (drift as the keyframe memory grows)
   and the final keyframe count.
2. Video reconstruction: a 120-frame sequence with a capacity that
   forces repeated mid-run compactions, checked for pointmap parity
   against an uncompacted run (engine/video.py length-bound/compact
   interplay at serving scale).

Writes a JSON summary to docs/SOAK_VO.json and prints it.
Run: PYTHONPATH=. python scripts/soak_vo.py [--frames 500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from must3r_tpu.cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def synth_frames(n, h, w, seed=0):
    """Deterministic moving-texture frames (uint8)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h * 2, w * 2, 3), dtype=np.uint8)
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        dy = int((h // 2) * (0.5 + 0.5 * np.sin(i / 37.0)))
        dx = int((w // 2) * (0.5 + 0.5 * np.cos(i / 53.0)))
        out[i] = base[dy:dy + h, dx:dx + w]
    return out


def _configs(tiny: bool):
    if tiny:
        # CPU-runnable towers: the soak then exercises the HOST pipeline
        # (keyframe bookkeeping, memory growth, compaction cadence) at
        # benchmark sequence lengths without a chip
        from must3r_tpu.config import DecoderConfig, EncoderConfig
        enc_cfg = EncoderConfig(img_size=(64, 64), patch_size=16,
                                embed_dim=64, depth=2, num_heads=2)
        dec_cfg = DecoderConfig(img_size=(64, 64), enc_embed_dim=64,
                                patch_size=16, embed_dim=32,
                                output_dim=16 * 16 * 7, depth=2,
                                num_heads=2)
        return enc_cfg, dec_cfg
    from must3r_tpu.config import must3r_512_configs
    return must3r_512_configs()


def soak_slam(frames, tiny=False):
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.slam.model import Must3rSLAM, SlamConfig

    enc_cfg, dec_cfg = _configs(tiny)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}
    # tiny mode: random weights never trip the keyframe rule, so force
    # (overlap thr 0 / conf thr 0) -- the soak must GROW the memory to
    # max_keyframes and exercise the capacity/eviction path
    cfg = SlamConfig(res=64, max_keyframes=128,
                     keyframe_overlap_thr=-1.0, min_conf_keyframe=0.0) \
        if tiny else SlamConfig(res=512, max_keyframes=128)
    slam = Must3rSLAM(params, enc_cfg, dec_cfg, cfg,
                      dtype=jnp.float32 if tiny else jnp.bfloat16)

    n = len(frames)
    windows = []
    t0 = time.perf_counter()
    t_win = t0
    for i, frame in enumerate(frames):
        slam(frame, frame_id=i)
        if (i + 1) % 100 == 0:
            now = time.perf_counter()
            windows.append(round(100.0 / (now - t_win), 2))
            t_win = now
            print(f"  frame {i + 1}/{n}: window fps={windows[-1]}, "
                  f"keyframes={len(slam.keyframes)}", flush=True)
    total = time.perf_counter() - t0
    return {
        "frames": n,
        "fps_windows": windows,
        "fps_mean": round(n / total, 2),
        "fps_drift_pct": round(100.0 * (windows[0] - windows[-1])
                               / max(windows[0], 1e-9), 1)
        if len(windows) >= 2 else 0.0,
        "keyframes": len(slam.keyframes),
    }


def soak_video(n_frames=120, tiny=False):
    from must3r_tpu.engine import InferenceCore
    import must3r_tpu.engine.video as video_mod
    import must3r_tpu.memory as memory_mod
    from must3r_tpu.engine.video import video_reconstruction
    from must3r_tpu.models import init_decoder, init_encoder

    enc_cfg, dec_cfg = _configs(tiny)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg),
                         init_decoder(k2, dec_cfg), enc_cfg, dec_cfg,
                         dtype=jnp.float32 if tiny else jnp.bfloat16)
    h, w = (48, 64) if tiny else (384, 512)
    rngj = jax.random.PRNGKey(1)
    imgs = jax.random.normal(rngj, (n_frames, h, w, 3), jnp.float32)

    compacts = []
    orig = memory_mod.compact

    def counting(mem):
        compacts.append(int(np.asarray(mem.length)))
        return orig(mem)

    video_mod.compact = counting
    try:
        t0 = time.perf_counter()
        # keyframe every 3rd (default): ~40 keyframes + 25-frame window
        # live vs a 60-image capacity -> repeated compactions
        tight = video_reconstruction(core, imgs, img_hw=(h, w),
                                     capacity_images=60, compute_cam=False)
        t_tight = time.perf_counter() - t0
    finally:
        video_mod.compact = orig
    n_compact = len(compacts)

    t0 = time.perf_counter()
    loose = video_reconstruction(core, imgs, img_hw=(h, w),
                                 capacity_images=n_frames + 8,
                                 compute_cam=False)
    t_loose = time.perf_counter() - t0

    scale = float(np.mean(np.abs(loose["pts3d"])))
    diff = float(np.max(np.abs(tight["pts3d"] - loose["pts3d"])))
    return {
        "frames": n_frames,
        "compactions": n_compact,
        "keyframes_equal": tight["keyframes"] == loose["keyframes"],
        "pts3d_max_abs_diff": diff,
        "pts3d_mean_abs": scale,
        "fps_tight": round(n_frames / t_tight, 2),
        "fps_loose": round(n_frames / t_loose, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--video_frames", type=int, default=120)
    ap.add_argument("--skip_slam", action="store_true")
    ap.add_argument("--skip_video", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-runnable towers (host-pipeline soak)")
    args = ap.parse_args()

    report = {}
    if not args.skip_video:
        print("video compaction soak...", flush=True)
        report["video"] = soak_video(args.video_frames, args.tiny)
        print(json.dumps(report["video"], indent=2), flush=True)
    if not args.skip_slam:
        print(f"slam soak ({args.frames} frames)...", flush=True)
        frames = synth_frames(args.frames, *((48, 64) if args.tiny else (384, 512)))
        report["slam"] = soak_slam(frames, args.tiny)
        print(json.dumps(report["slam"], indent=2), flush=True)

    os.makedirs("docs", exist_ok=True)
    with open("docs/SOAK_VO_TINY.json" if args.tiny else "docs/SOAK_VO.json", "w") as f:
        json.dump(report, f, indent=2)
    print('wrote soak report')


if __name__ == "__main__":
    main()
