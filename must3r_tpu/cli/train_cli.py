"""Training CLI (reference `train.py`): typed flags instead of eval()'d
constructor strings; dataset specs still accept the reference's algebra
('10*SyntheticScenes(...) + SyntheticScenes(...)') through a restricted
expression parser over registered dataset classes."""

from __future__ import annotations

import argparse
import ast


def get_args_parser():
    p = argparse.ArgumentParser("must3r train")
    p.add_argument("--preset", default="512", choices=["224", "512", "tiny"])
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--chkpt", default=None,
                   help="init weights (native dir or reference .pth)")
    p.add_argument("--dataset", required=True,
                   help="e.g. \"SyntheticScenes(num_views=6, "
                        "resolutions=((64,48),), epoch_size=64)\"")
    p.add_argument("--output_dir", default="./output")
    # schedule / curriculum (reference flags)
    p.add_argument("--memory_num_views", type=int, default=4)
    p.add_argument("--min_memory_num_views", type=int, default=2)
    p.add_argument("--memory_batch_views", type=int, default=None)
    p.add_argument("--causal", action="store_true", default=False)
    p.add_argument("--render_once", action="store_true", default=False)
    p.add_argument("--max_render_count", type=int, default=None,
                   help="cap rendered views per step by random subsampling"
                        " (reference train.py:445-448)")
    p.add_argument("--disable_render", action="store_true", default=False,
                   help="skip the render pass; loss over first-pass views"
                        " only (reference train.py:449)")
    p.add_argument("--random_blocks", action="store_true", default=False,
                   help="non-causal randomized grouping (reference"
                        " train.py:177-186), power-of-two quantized")
    # optimization
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--blr", type=float, default=1.5e-4)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=None)
    p.add_argument("--finetune_encoder", action="store_true", default=False)
    p.add_argument("--mem_dropout", type=float, default=0.0)
    p.add_argument("--dropout_mode", default="temporary",
                   choices=["temporary", "permanent"])
    p.add_argument("--loss_in_log", action="store_true", default=False)
    p.add_argument("--alpha", type=float, default=0.2)
    p.add_argument("--amp", default="bfloat16",
                   choices=["bfloat16", "float32", "bf16", "fp32"])
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--keep_freq", type=int, default=5)
    p.add_argument("--print_freq", type=int, default=20)
    # distributed (torchrun replacement; also via MUST3R_* env vars):
    # --batch_size is PER PROCESS (reference semantics, README.md:242)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host training")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--dp_mesh", action="store_true", default=False,
                   help="train over a dp mesh spanning all visible "
                        "devices (implied by multi-process mode)")
    return p


def build_dataset(spec: str):
    """Parse the reference's dataset algebra over registered classes with
    literal kwargs -- no eval()."""
    from must3r_tpu import datasets as ds_mod

    registry = {"SyntheticScenes": ds_mod.SyntheticScenes,
                "Co3d": ds_mod.Co3d, "ScanNetpp": ds_mod.ScanNetpp,
                "SceneDirDataset": ds_mod.SceneDirDataset,
                "Co3dPreprocessed": ds_mod.Co3dPreprocessed,
                "ScanNetppPreprocessed": ds_mod.ScanNetppPreprocessed}

    def build(node):
        if isinstance(node, ast.BinOp):
            if isinstance(node.op, ast.Add):
                return build(node.left) + build(node.right)
            if isinstance(node.op, ast.Mult):
                if isinstance(node.left, ast.Constant):
                    return node.left.value * build(node.right)
                return build(node.left) * node.right.value
            if isinstance(node.op, ast.MatMult):
                if isinstance(node.right, ast.Constant):
                    return build(node.left) @ node.right.value
                return build(node.right) @ node.left.value
            raise ValueError(f"unsupported operator {node.op}")
        if isinstance(node, ast.Call):
            name = node.func.id
            assert name in registry, f"unknown dataset {name}"

            def lit(v):
                # bare names (reference passes `transform=ColorJitter`,
                # README.md:242) become strings resolved by the dataset
                if isinstance(v, ast.Name):
                    return v.id
                return ast.literal_eval(v)

            kwargs = {kw.arg: lit(kw.value) for kw in node.keywords}
            args = [lit(a) for a in node.args]
            return registry[name](*args, **kwargs)
        raise ValueError(f"cannot parse dataset node {ast.dump(node)}")

    return build(ast.parse(spec, mode="eval").body)


def main(argv=None):
    import jax

    args = get_args_parser().parse_args(argv)
    from must3r_tpu.parallel import init_distributed

    # before any backend use: multi-host bring-up (reference
    # init_distributed_mode, engine/train.py:224)
    multi = init_distributed(args.coordinator, args.num_processes,
                             args.process_id)

    from must3r_tpu.cli.common import (enable_compile_cache,
                                       load_or_init_model)
    enable_compile_cache()
    import dataclasses as dc

    from must3r_tpu.datasets import get_data_loader
    from must3r_tpu.engine.loop import Trainer, TrainLoopConfig
    from must3r_tpu.engine.train import TrainSettings
    from must3r_tpu.parallel import make_mesh, process_count, process_index

    params, enc_cfg, dec_cfg = load_or_init_model(
        args.chkpt, args.preset, img_size=args.image_size, seed=args.seed)
    dec_cfg = dc.replace(dec_cfg, causal=True,
                         mem_dropout=args.mem_dropout,
                         dropout_mode=args.dropout_mode)

    dataset = build_dataset(args.dataset)
    # each process loads only its own shard of the global batch
    # (replaces DistributedSampler, SURVEY §5.8)
    loader = get_data_loader(dataset, args.batch_size,
                             world_size=process_count(),
                             rank=process_index(),
                             num_workers=args.num_workers,
                             patch_size=dec_cfg.patch_size)
    mesh = make_mesh() if (multi or args.dp_mesh) else None

    ts = TrainSettings(
        finetune_encoder=args.finetune_encoder,
        dropout_p=args.mem_dropout, dropout_mode=args.dropout_mode,
        alpha=args.alpha, loss_in_log=args.loss_in_log,
        dtype={"bf16": "bfloat16", "fp32": "float32"}.get(args.amp,
                                                          args.amp))
    cfg = TrainLoopConfig(
        epochs=args.epochs, warmup_epochs=args.warmup_epochs, blr=args.blr,
        lr=args.lr, min_lr=args.min_lr, weight_decay=args.weight_decay,
        accum_iter=args.accum_iter, batch_size=args.batch_size,
        memory_num_views=args.memory_num_views,
        min_memory_num_views=args.min_memory_num_views,
        memory_batch_views=args.memory_batch_views, causal=args.causal,
        render_once=args.render_once, keep_freq=args.keep_freq,
        max_render_count=args.max_render_count,
        disable_render=args.disable_render,
        random_blocks=args.random_blocks,
        layer_decay=args.layer_decay,
        print_freq=args.print_freq, seed=args.seed,
        output_dir=args.output_dir)

    # --batch_size is PER PROCESS and is *sharded* (not replicated) over
    # this process's local devices, so the true global batch is
    # batch_size * process_count — NOT * device_count (which would
    # overscale lr ~4x on multi-chip hosts).
    trainer = Trainer(enc_cfg, dec_cfg, params, loader, cfg, ts,
                      n_devices=process_count(), mesh=mesh)
    stats = trainer.train()
    print("final:", stats)


if __name__ == "__main__":
    main()
