"""End-to-end learning demonstration: train a small MUSt3R on the
synthetic GT dataset and show pointmap + pose metrics improving.

Writes a JSON report (docs/LEARNING_DEMO.json) with before/after eval.
Run on TPU: PYTHONPATH=. python scripts/train_synthetic_demo.py
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_must3r"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.datasets import SyntheticScenes, get_data_loader
from must3r_tpu.engine import InferenceCore
from must3r_tpu.engine.evaluate import evaluate
from must3r_tpu.engine.loop import Trainer, TrainLoopConfig
from must3r_tpu.engine.train import TrainSettings
from must3r_tpu.models import init_decoder, init_encoder

import sys as _sys

if "--preset224" in _sys.argv:
    # flagship towers (ViT-L encoder / ViT-B decoder) at 224^2 on the
    # synthetic dataset -- full-architecture learning evidence
    from must3r_tpu.config import must3r_224_configs
    import dataclasses as _dc

    ENC, DEC = must3r_224_configs()
    DEC = _dc.replace(DEC, causal=True)
    RES = ((224, 224),)
    RENDER_HW = (224, 224)
    BATCH = 1
    FINETUNE_ENC = False      # frozen encoder, like the reference default
    BLR = 6e-4
else:
    ENC = EncoderConfig(img_size=(64, 64), patch_size=16, embed_dim=256,
                        depth=6, num_heads=4)
    DEC = DecoderConfig(img_size=(64, 64), enc_embed_dim=256, patch_size=16,
                        embed_dim=192, output_dim=16 * 16 * 7, depth=4,
                        num_heads=3, feedback=FeedbackType.SINGLE_MLP,
                        causal=True)
    RES = ((64, 48),)
    RENDER_HW = (48, 64)
    BATCH = 4
    FINETUNE_ENC = True
    BLR = 3e-3


def make_eval_loader():
    ds = SyntheticScenes(num_views=4, resolutions=RES,
                         epoch_size=8 * BATCH, render_hw=RENDER_HW,
                         seed=123)
    return get_data_loader(ds, batch_size=BATCH)


def run_eval(params):
    core = InferenceCore(params["encoder"], params["decoder"], ENC, DEC,
                         dtype=jnp.bfloat16)
    return evaluate(core, make_eval_loader(), num_views_list=(2,),
                    pose_eval=True, verbose=False)["views2"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 and \
        sys.argv[1].isdigit() else 20
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, ENC),
              "decoder": init_decoder(k2, DEC)}

    before = run_eval(params)
    print("before:", before, flush=True)

    tag_dir = "224" if "--preset224" in sys.argv else "tiny"
    train_ds = SyntheticScenes(num_views=4, resolutions=RES,
                               epoch_size=160 * BATCH, render_hw=RENDER_HW,
                               seed=7)
    loader = get_data_loader(train_ds, batch_size=BATCH)
    ts = TrainSettings(finetune_encoder=FINETUNE_ENC, dtype="bfloat16",
                       dropout_p=0.05)
    cfg = TrainLoopConfig(epochs=epochs, warmup_epochs=1.0, blr=BLR,
                          batch_size=BATCH, memory_num_views=4, causal=True,
                          memory_batch_views=2, keep_freq=0, print_freq=8,
                          output_dir="/tmp/demo_train_" + tag_dir, seed=1)
    t0 = time.time()
    trainer = Trainer(ENC, DEC, params, loader, cfg, ts)
    stats = trainer.train()
    wall = time.time() - t0

    after = run_eval(trainer.params)
    print("after:", after, flush=True)

    tag = "224-flagship" if "--preset224" in sys.argv else "tiny"
    report = {"config": tag,
              "encoder": f"{ENC.depth}x{ENC.embed_dim}",
              "decoder": f"{DEC.depth}x{DEC.embed_dim}", "epochs": epochs,
              "steps": epochs * len(loader), "train_wall_s": round(wall, 1),
              "final_loss": stats.get("loss"),
              "eval_before": before, "eval_after": after}
    os.makedirs("docs", exist_ok=True)
    out_name = ("docs/LEARNING_DEMO_224.json"
                if "--preset224" in sys.argv else "docs/LEARNING_DEMO.json")
    with open(out_name, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
