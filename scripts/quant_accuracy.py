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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/demo_train_tiny/checkpoint-final")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--quants", nargs="+", default=["int8", "fp8"])
    args = ap.parse_args()

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
