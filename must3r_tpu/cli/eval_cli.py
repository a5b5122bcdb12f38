"""Evaluation CLI (reference `eval.py`): per-view L21 pointmap metrics for
varying numbers of memory views."""

from __future__ import annotations

import argparse
import json
import os


def get_args_parser():
    p = argparse.ArgumentParser("must3r eval")
    p.add_argument("--chkpt", default=None)
    p.add_argument("--preset", default="512", choices=["224", "512", "tiny"])
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--dataset", required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_views", type=int, nargs="+", default=[2, 4])
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--amp", default="bf16", choices=["bf16", "fp32", "bfloat16", "float32"])
    p.add_argument("--pose_eval", action="store_true", default=False)
    p.add_argument("--pose_mode", default="procrustes",
                   choices=["procrustes", "pnp"],
                   help="published pose protocols: procrustes | pnp "
                        "(assets/evals.md:128-191)")
    p.add_argument("--depth_eval", action="store_true", default=False)
    p.add_argument("--recon_eval", action="store_true", default=False,
                   help="Acc/Comp/NC cloud metrics (assets/evals.md:44-46)")
    p.add_argument("--conf_thr", type=float, default=1.5)
    p.add_argument("--output", default=None, help="json report path")
    return p


def main(argv=None):
    args = get_args_parser().parse_args(argv)
    from must3r_tpu.cli.common import (enable_compile_cache,
                                       load_or_init_model, make_core)
    enable_compile_cache()
    from must3r_tpu.cli.train_cli import build_dataset
    from must3r_tpu.datasets import get_data_loader
    from must3r_tpu.engine.evaluate import evaluate

    params, enc_cfg, dec_cfg = load_or_init_model(
        args.chkpt, args.preset, img_size=args.image_size)
    core = make_core(params, enc_cfg, dec_cfg, args.amp)
    dataset = build_dataset(args.dataset)
    loader = get_data_loader(dataset, args.batch_size,
                             patch_size=dec_cfg.patch_size)
    report = evaluate(core, loader, num_views_list=args.num_views,
                      max_batches=args.max_batches,
                      pose_eval=args.pose_eval,
                      pose_mode=args.pose_mode,
                      depth_eval=args.depth_eval)
    if args.recon_eval:
        from must3r_tpu.engine.evaluate import evaluate_reconstruction
        report["reconstruction"] = evaluate_reconstruction(
            core, loader, num_mem_views=max(args.num_views),
            max_batches=args.max_batches, conf_thr=args.conf_thr)
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {args.output}")


if __name__ == "__main__":
    main()
