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

ENC = EncoderConfig(img_size=(64, 64), patch_size=16, embed_dim=256,
                    depth=6, num_heads=4)
DEC = DecoderConfig(img_size=(64, 64), enc_embed_dim=256, patch_size=16,
                    embed_dim=192, output_dim=16 * 16 * 7, depth=4,
                    num_heads=3, feedback=FeedbackType.SINGLE_MLP,
                    causal=True)


def make_eval_loader():
    ds = SyntheticScenes(num_views=4, resolutions=((64, 48),),
                         epoch_size=16, render_hw=(48, 64), seed=123)
    return get_data_loader(ds, batch_size=4)


def run_eval(params):
    core = InferenceCore(params["encoder"], params["decoder"], ENC, DEC,
                         dtype=jnp.bfloat16)
    return evaluate(core, make_eval_loader(), num_views_list=(2,),
                    pose_eval=True, verbose=False)["views2"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, ENC),
              "decoder": init_decoder(k2, DEC)}

    before = run_eval(params)
    print("before:", before, flush=True)

    train_ds = SyntheticScenes(num_views=4, resolutions=((64, 48),),
                               epoch_size=64, render_hw=(48, 64), seed=7)
    loader = get_data_loader(train_ds, batch_size=4)
    ts = TrainSettings(finetune_encoder=True, dtype="bfloat16",
                       dropout_p=0.05)
    cfg = TrainLoopConfig(epochs=epochs, warmup_epochs=1.0, blr=3e-3,
                          batch_size=4, memory_num_views=4, causal=True,
                          memory_batch_views=2, keep_freq=0, print_freq=8,
                          output_dir="/tmp/demo_train", seed=1)
    t0 = time.time()
    trainer = Trainer(ENC, DEC, params, loader, cfg, ts)
    stats = trainer.train()
    wall = time.time() - t0

    after = run_eval(trainer.params)
    print("after:", after, flush=True)

    report = {"encoder": "6x256", "decoder": "4x192", "epochs": epochs,
              "steps": epochs * len(loader), "train_wall_s": round(wall, 1),
              "final_loss": stats.get("loss"),
              "eval_before": before, "eval_after": after}
    os.makedirs("docs", exist_ok=True)
    with open("docs/LEARNING_DEMO.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
