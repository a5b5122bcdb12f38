"""Characterize the 8-bit KV-cache's accuracy cost on TRAINED weights.

The unit tests pin the quantized cache's numerics against the float cache
on random weights; this measures what int8/fp8 storage does to the
quantities users consume (pointmaps, confidence, focal, pose) with a
trained model on in-distribution data — the number PERF.md quotes.

Usage:
  PYTHONPATH=. python scripts/quant_accuracy.py \
      [--ckpt /tmp/demo_train_tiny/checkpoint-final] [--scenes 8]

Train a suitable checkpoint first (15 min on CPU):
  PYTHONPATH=. python scripts/train_synthetic_demo.py 3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capacity_run(args):
    """Capacity-scale churn characterization (VERDICT r3 next #6).

    The toy measurement above touches each token's quantizer once; the
    capacity story that motivates int8 (~2x keyframes per chip) lives in
    the opposite regime: 100+ keyframes, non-keyframes evicted out of a
    sliding window, the buffer compacted every time live+new would
    overflow, and a refinement pass that REFRESHES every keyframe's tokens
    in place (quantize -> serve -> requantize churn). This drives
    engine/video.py::video_reconstruction over a 3D-coherent synthetic
    orbit with a deterministic keyframe schedule (identical decisions for
    every cache format, so deltas measure storage error only) and reports
    pointmap/pose error vs keyframe count per window."""
    import importlib.util

    from must3r_tpu.checkpoint import load_checkpoint
    from must3r_tpu.datasets.base import normalize_image
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.video import video_reconstruction
    from must3r_tpu.ops.pose import inv_se3

    spec = importlib.util.spec_from_file_location(
        "soak_vo", os.path.join(os.path.dirname(__file__), "soak_vo.py"))
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)

    params, enc_cfg, dec_cfg, _, _ = load_checkpoint(args.ckpt)
    res = max(enc_cfg.img_size)
    h, w = enc_cfg.img_size
    frames_u8, _ = soak.synth_scene_frames(args.frames, h, w, seed=5,
                                           orbits=1.5)
    imgs = jnp.asarray(np.stack([normalize_image(f) for f in frames_u8]))

    # every-2nd-frame keyframes: args.frames=220 -> ~110 keyframes;
    # capacity sized so the final ~20% of the run compacts repeatedly
    kf_fn = lambda fid, r, s: (fid % 2 == 0)                 # noqa: E731
    cap_imgs = args.frames // 2 + 12

    def run(kv_quant):
        core = InferenceCore(params["encoder"], params["decoder"], enc_cfg,
                             dec_cfg, dtype=jnp.bfloat16, kv_quant=kv_quant)
        return video_reconstruction(
            core, imgs, init_num_images=2, local_context_size=12,
            num_refinement_iterations=1, is_keyframe_fn=kf_fn,
            capacity_images=cap_imgs, compute_cam=True)

    base = run(None)
    n_kf = len(base["keyframes"])
    win = max(args.frames // 8, 8)
    report = {"ckpt": args.ckpt, "frames": args.frames, "res": res,
              "keyframes": n_kf, "capacity_images": cap_imgs,
              "refinement_iterations": 1, "windows": {}}
    for q in args.quants:
        got = run(q)
        assert got["keyframes"] == base["keyframes"], "schedule diverged"
        rows = []
        for lo in range(0, args.frames, win):
            hi = min(lo + win, args.frames)
            pb = np.asarray(base["pts3d"][lo:hi])
            pg = np.asarray(got["pts3d"][lo:hi])
            scale = max(float(np.abs(pb).mean()), 1e-9)
            rot = []
            for cb, cg in zip(base["c2w"][lo:hi], got["c2w"][lo:hi]):
                rel = np.asarray(inv_se3(jnp.asarray(cb))) @ np.asarray(cg)
                c = np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)
                rot.append(float(np.degrees(np.arccos(c))))
            rows.append({
                "frames": [lo, hi],
                "keyframes_so_far": sum(1 for k in base["keyframes"]
                                        if k < hi),
                "pts3d_rel_rmse": round(float(np.sqrt(np.mean(
                    (pg - pb) ** 2))) / scale, 5),
                "pose_rot_deg_max": round(max(rot), 4),
            })
            print(q, json.dumps(rows[-1]), flush=True)
        report["windows"][q] = rows
    out = args.out or "docs/QUANT_CAPACITY.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/demo_train_tiny/checkpoint-final")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--quants", nargs="+", default=["int8", "fp8"])
    ap.add_argument("--capacity", action="store_true",
                    help="capacity-scale churn mode: 100+ keyframes with "
                         "eviction/compaction/refinement requantization, "
                         "error drift vs keyframe count")
    ap.add_argument("--frames", type=int, default=220)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.capacity:
        capacity_run(args)
        return

    from must3r_tpu.checkpoint import load_checkpoint
    from must3r_tpu.datasets import SyntheticScenes
    from must3r_tpu.engine import InferenceCore, offline_reconstruction
    from must3r_tpu.ops.pose import inv_se3

    params, enc_cfg, dec_cfg, _, _ = load_checkpoint(args.ckpt)
    # in-distribution bucket: the demo trains at (W=64, H=48); dataset
    # resolutions use the dust3r (W, H) convention
    hw = (64, 48) if max(enc_cfg.img_size) <= 64 else enc_cfg.img_size
    ds = SyntheticScenes(num_views=args.views, resolutions=(hw,),
                         epoch_size=args.scenes, seed=321)

    def run(kv_quant):
        core = InferenceCore(params["encoder"], params["decoder"], enc_cfg,
                             dec_cfg, dtype=jnp.bfloat16, kv_quant=kv_quant)
        outs = []
        for i in range(args.scenes):
            views = ds[(i, 0, args.views)]
            imgs = jnp.asarray(np.stack([v["img"] for v in views]))
            outs.append(offline_reconstruction(core, imgs,
                                               compute_cam=True))
        return outs

    base = run(None)
    report = {}
    for q in args.quants:
        got = run(q)
        pm_rel, conf_mae, focal_rel, rot_deg = [], [], [], []
        for b, g in zip(base, got):
            scale = float(np.abs(np.asarray(b["pts3d"])).mean())
            pm_rel.append(float(np.sqrt(np.mean(
                (np.asarray(g["pts3d"]) - np.asarray(b["pts3d"])) ** 2)))
                / max(scale, 1e-9))
            conf_mae.append(float(np.mean(np.abs(
                np.asarray(g["conf"]) - np.asarray(b["conf"])))))
            fb = np.asarray(b["focal"])
            focal_rel.append(float(np.max(
                np.abs(np.asarray(g["focal"]) - fb)
                / np.maximum(np.abs(fb), 1e-9))))
            for cb, cg in zip(np.asarray(b["c2w"]), np.asarray(g["c2w"])):
                rel = np.asarray(inv_se3(jnp.asarray(cb))) @ cg
                c = np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)
                rot_deg.append(float(np.degrees(np.arccos(c))))
        report[q] = {
            "pts3d_rel_rmse": max(pm_rel),
            "conf_mae": max(conf_mae),
            "focal_rel_err_max": max(focal_rel),
            "pose_rot_deg_max": max(rot_deg),
        }
        print(q, json.dumps(report[q]), flush=True)
    print(json.dumps({"ckpt": args.ckpt, "scenes": args.scenes,
                      "views": args.views, "report": report}, indent=2))


if __name__ == "__main__":
    main()
