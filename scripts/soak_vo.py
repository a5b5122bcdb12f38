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


def synth_scene_frames(n, h, w, seed=0, orbits=1.25):
    """3D-coherent video: render a SyntheticScenes plane scene along a
    smooth orbit. The moving-texture stream above has no parallax, so a
    trained net's overlap gate is vacuous on it; this one has real
    geometry and revisits viewpoints, so the gate must actually reject."""
    from must3r_tpu.datasets.synthetic import SyntheticScenes, _look_at

    ds = SyntheticScenes(n_planes=6)
    scene = ds._scene(seed)
    focal = 0.9 * w
    k = np.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                   np.float32)
    out = np.empty((n, h, w, 3), np.uint8)
    poses = np.empty((n, 4, 4), np.float32)
    for i in range(n):
        ang = 2 * np.pi * orbits * i / n
        eye = np.asarray([4.0 * np.sin(ang), 0.5 * np.sin(2 * ang),
                          -4.0 * np.cos(ang)], np.float32)
        c2w = _look_at(eye, (0.0, 0.0, 0.0))
        img, _ = ds._render(scene, c2w, k, (h, w))
        out[i] = img
        poses[i] = c2w
    return out, poses


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


def _load_weights(path, res):
    """Trained params + configs from a native checkpoint, with the
    reference's resolution-transfer rewrite (adaptive RoPE) when the soak
    resolution differs from the training one (set_image_size; reference
    model/__init__.py:66-108)."""
    from must3r_tpu.checkpoint import load_checkpoint
    from must3r_tpu.config import set_image_size

    params, enc_cfg, dec_cfg, _, _ = load_checkpoint(path)
    if max(enc_cfg.img_size) != res:
        enc_cfg = set_image_size(enc_cfg, res)
        dec_cfg = set_image_size(dec_cfg, res)
    return params, enc_cfg, dec_cfg


def soak_slam(frames, tiny=False, weights=None, kv_quant=None, res=None,
              max_keyframes=128, capture_traj=False, slam_kw=None):
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.slam.model import Must3rSLAM, SlamConfig

    if weights is not None:
        params, enc_cfg, dec_cfg = _load_weights(weights, res or 224)
        cfg = SlamConfig(res=res or 224, max_keyframes=max_keyframes,
                         kv_quant=kv_quant, **(slam_kw or {}))
    else:
        enc_cfg, dec_cfg = _configs(tiny)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"encoder": init_encoder(k1, enc_cfg),
                  "decoder": init_decoder(k2, dec_cfg)}
        # tiny/random mode: random weights never trip the keyframe rule,
        # so force (overlap thr 0 / conf thr 0) -- the soak must GROW the
        # memory to max_keyframes and exercise the capacity/eviction path
        cfg = SlamConfig(res=64, max_keyframes=max_keyframes,
                         keyframe_overlap_thr=-1.0, min_conf_keyframe=0.0,
                         kv_quant=kv_quant) \
            if tiny else SlamConfig(res=res or 512,
                                    max_keyframes=max_keyframes,
                                    kv_quant=kv_quant, **(slam_kw or {}))
    slam = Must3rSLAM(params, enc_cfg, dec_cfg, cfg,
                      dtype=jnp.float32 if tiny else jnp.bfloat16)

    n = len(frames)
    windows = []
    kf_trace = []
    rss_trace = []
    t0 = time.perf_counter()
    t_win = t0
    import gc

    def _rss_gb():
        # CURRENT rss (not ru_maxrss peak): shows whether the periodic
        # gc below actually releases the axon client's per-dispatch host
        # buffers or they are retained by native-side references
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9

    done = 0
    for i, frame in enumerate(frames):
        slam(frame, frame_id=i)
        done = i + 1
        if done % 25 == 0:
            # if the retention is python-side (buffers alive until a gen-2
            # collection), this caps it; native retention shows up as a
            # monotone rss_trace regardless
            gc.collect()
            rss_trace.append(round(_rss_gb(), 2))
            # host-RSS watchdog: the axon tunnel client has been observed
            # retaining per-dispatch host buffers at flagship-512 shapes
            # (the r4 500-frame soak was OOM-killed at 130 GB, dmesg);
            # bail with the partial result instead of dying wordlessly
            if rss_trace[-1] > 90.0:
                print(f"  RSS {rss_trace[-1]} GB at frame {done} -- "
                      f"stopping early (host-buffer retention)", flush=True)
                break
        if done % 100 == 0:
            now = time.perf_counter()
            windows.append(round(100.0 / (now - t_win), 2))
            kf_trace.append(len(slam.keyframes))
            t_win = now
            print(f"  frame {done}/{n}: window fps={windows[-1]}, "
                  f"keyframes={len(slam.keyframes)}, "
                  f"rss={rss_trace[-1] if rss_trace else 0} GB", flush=True)
    n = done
    total = time.perf_counter() - t0
    # drift: steady-state only -- window 0 contains every first-shape
    # compile, so including it made the metric read compile time, not
    # memory-growth slowdown (the r3 artifact's -881% was exactly that)
    steady = windows[1:] if len(windows) >= 3 else windows
    out = {
        "frames": n,
        "fps_windows": windows,
        "fps_mean": round(n / total, 2),
        "fps_steady_mean": round(sum(steady) / max(len(steady), 1), 2),
        "fps_drift_pct": round(100.0 * (steady[0] - steady[-1])
                               / max(steady[0], 1e-9), 1)
        if len(steady) >= 2 else 0.0,
        "keyframes": len(slam.keyframes),
        "keyframes_per_window": kf_trace,
        "keyframe_ratio": round(len(slam.keyframes) / n, 3),
        "kv_quant": kv_quant,
        "rss_gb_trace": rss_trace,
    }
    if capture_traj:
        out["_trajectory"] = np.stack(slam.all_poses)
    return out


def _traj_delta(pa, pb):
    """Max rotation (deg) / translation deltas between two trajectories."""
    ra = pa[:, :3, :3]
    rb = pb[:, :3, :3]
    rel = np.einsum("nij,nkj->nik", ra, rb)          # ra @ rb^T
    cos = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot_deg = np.degrees(np.arccos(cos))
    t = np.linalg.norm(pa[:, :3, 3] - pb[:, :3, 3], axis=-1)
    scale = max(float(np.linalg.norm(pb[:, :3, 3], axis=-1).mean()), 1e-9)
    return {"rot_deg_max": round(float(rot_deg.max()), 3),
            "t_abs_max": round(float(t.max()), 4),
            "t_rel_max": round(float(t.max() / scale), 4)}


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
    ap.add_argument("--weights", default=None,
                    help="native checkpoint (trained demo) -- the keyframe "
                    "gate then runs for real instead of forced-open")
    ap.add_argument("--res", type=int, default=None,
                    help="SLAM resolution (adaptive-RoPE transfer when it "
                    "differs from the checkpoint's training size)")
    ap.add_argument("--max_keyframes", type=int, default=128)
    ap.add_argument("--quant_parity", action="store_true",
                    help="run bf16 + int8 caches on the same stream and "
                    "report trajectory deltas")
    ap.add_argument("--min_conf", type=float, default=None,
                    help="override SlamConfig.min_conf_keyframe: an "
                    "underfit demo net at a transferred resolution emits "
                    "near-floor confidence (~1.01 vs the reference-scale "
                    "1.5 default), pinning the keyframe gate shut")
    ap.add_argument("--overlap_thr", type=float, default=None,
                    help="override SlamConfig.keyframe_overlap_thr")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    report = {}
    if not args.skip_video:
        print("video compaction soak...", flush=True)
        report["video"] = soak_video(args.video_frames, args.tiny)
        print(json.dumps(report["video"], indent=2), flush=True)
    if not args.skip_slam:
        print(f"slam soak ({args.frames} frames)...", flush=True)
        if args.weights is not None:
            res = args.res or 224
            hw = (res * 3 // 4, res) if res >= 384 else (res, res)
            frames, _ = synth_scene_frames(args.frames, *hw)
        else:
            hw = (48, 64) if args.tiny else (384, 512)
            frames = synth_frames(args.frames, *hw)
        runs = [None, "int8"] if args.quant_parity else [None]
        slam_kw = {}
        if args.min_conf is not None:
            slam_kw["min_conf_keyframe"] = args.min_conf
        if args.overlap_thr is not None:
            slam_kw["keyframe_overlap_thr"] = args.overlap_thr
        trajs = {}
        for kvq in runs:
            tag = kvq or "bf16"
            r = soak_slam(frames, args.tiny, weights=args.weights,
                          kv_quant=kvq, res=args.res,
                          max_keyframes=args.max_keyframes,
                          capture_traj=args.quant_parity,
                          slam_kw=slam_kw)
            trajs[tag] = r.pop("_trajectory", None)
            report["slam" if kvq is None else f"slam_{tag}"] = r
            print(json.dumps(r, indent=2), flush=True)
        if args.quant_parity and trajs.get("bf16") is not None:
            same_schedule = (report["slam"]["keyframes_per_window"]
                             == report["slam_int8"]["keyframes_per_window"]
                             and report["slam"]["keyframes"]
                             == report["slam_int8"]["keyframes"])
            if same_schedule:
                report["quant_traj_parity"] = _traj_delta(trajs["int8"],
                                                          trajs["bf16"])
            else:
                # pose-vs-pose deltas are meaningless across different
                # maps: near the overlap threshold the int8 cache's
                # <=0.6% storage error legitimately flips borderline
                # keyframe decisions, after which every later pose is
                # anchored to a different memory. Storage-error-only
                # parity (deterministic schedule) is QUANT_CAPACITY.json.
                report["quant_traj_parity"] = {
                    "schedule_diverged": True,
                    "keyframes": [report["slam"]["keyframes"],
                                  report["slam_int8"]["keyframes"]],
                    "note": "trajectory delta suppressed; see "
                            "docs/QUANT_CAPACITY.json for fixed-schedule "
                            "storage-error parity",
                }
            print(json.dumps(report["quant_traj_parity"], indent=2),
                  flush=True)

    os.makedirs("docs", exist_ok=True)
    out = args.out or ("docs/SOAK_VO_TINY.json" if args.tiny
                       else "docs/SOAK_VO.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
