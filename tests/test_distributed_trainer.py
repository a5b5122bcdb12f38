"""Multi-process Trainer test (VERDICT r2 item 4): the REAL
make_train_step/Trainer composition — donated buffers, schedule draws,
checkpointing — across 2 jax.distributed processes x 2 CPU devices each,
compared against a single-process run over the identical global batches.

Covers (reference DDP training, must3r/engine/train.py:224,303-310):
  * per-process loaders assemble one global batch per step
    (make_array_from_process_local_data path in parallel.global_batch)
  * GSPMD-psummed gradients give the SAME losses as single-process
  * schedule draws stay in lockstep across ranks (shapes stay static)
  * only process 0 writes checkpoints
  * auto-resume works across a full 2-process restart
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
import numpy as np
import jax

mode = sys.argv[1]            # 'multi' | 'single'
out_dir = sys.argv[2]
epochs = int(sys.argv[3])

from must3r_tpu.parallel import (init_distributed, is_main_process,
                                 make_mesh, process_count, process_index)

if mode == "multi":
    ok = init_distributed()
    assert ok and process_count() == 2
    ws, rank = 2, process_index()
else:
    ws, rank = 1, 0

from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.datasets import SyntheticScenes, get_data_loader
from must3r_tpu.engine.loop import Trainer, TrainLoopConfig
from must3r_tpu.engine.train import TrainSettings

ENC = EncoderConfig(img_size=(64, 64), patch_size=16, embed_dim=64,
                    depth=2, num_heads=2)
DEC = DecoderConfig(img_size=(64, 64), enc_embed_dim=64, patch_size=16,
                    embed_dim=48, output_dim=16 * 16 * 7, depth=2,
                    num_heads=2, causal=True)

ds = SyntheticScenes(num_views=4, resolutions=((64, 48),), epoch_size=16,
                     min_memory_num_views=3, max_memory_num_views=3,
                     seed=5)

if mode == "multi":
    loader = get_data_loader(ds, batch_size=2, world_size=2, rank=rank,
                             patch_size=16)
else:
    a = get_data_loader(ds, batch_size=2, world_size=2, rank=0,
                        patch_size=16)
    b = get_data_loader(ds, batch_size=2, world_size=2, rank=1,
                        patch_size=16)

    class ConcatLoader:
        # replays the exact global batches of the 2-process run:
        # global batch k = concat(rank0 local k, rank1 local k) -- the
        # row order make_array_from_process_local_data produces
        def __len__(self):
            return len(a)

        def set_epoch(self, e):
            a.set_epoch(e)
            b.set_epoch(e)

        def __iter__(self):
            for ba, bb in zip(a, b):
                out = {}
                for k, v in ba.items():
                    if isinstance(v, np.ndarray) and v.ndim >= 1:
                        out[k] = np.concatenate([v, bb[k]], axis=0)
                    else:
                        assert v == bb[k], (k, v, bb[k])
                        out[k] = v
                yield out

    loader = ConcatLoader()

mesh = make_mesh(4, mp=1, axis_names=("dp", "mp"))
ts = TrainSettings(dtype="float32", dropout_p=0.0)
cfg = TrainLoopConfig(epochs=epochs, warmup_epochs=0.5, lr=1e-3,
                      batch_size=2, memory_num_views=3,
                      min_memory_num_views=3, memory_batch_views=2,
                      causal=True, keep_freq=0, print_freq=1000,
                      seed=11, output_dir=out_dir)

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
from must3r_tpu.models import init_decoder, init_encoder
params = {"encoder": init_encoder(k1, ENC), "decoder": init_decoder(k2, DEC)}

trainer = Trainer(ENC, DEC, params, loader, cfg, ts, mesh=mesh)
resumed_at = trainer.start_epoch if trainer.try_resume() else None
# (try_resume is also called inside train(); calling it twice is
# idempotent -- we want the epoch for the assertion)
if resumed_at is not None:
    resumed_at = trainer.start_epoch
losses = []
for epoch in range(trainer.start_epoch, cfg.epochs):
    trainer.loader.set_epoch(epoch)
    stats = trainer.train_one_epoch(epoch)
    losses.append(round(stats["loss"], 6))
    trainer.save(epoch, "last")
print("RESULT " + json.dumps({
    "rank": rank, "is_main": is_main_process(),
    "resumed_at": resumed_at, "losses": losses}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(extra):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.update({"JAX_PLATFORMS": "cpu"})
    env.update(extra)
    if "XLA_FLAGS" in env:   # starved-rendezvous watchdogs (conftest.py)
        env["XLA_FLAGS"] += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    return env


def _run_multi(out_dir, epochs):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = _env({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "MUST3R_COORDINATOR": f"127.0.0.1:{port}",
            "MUST3R_NUM_PROCESSES": "2",
            "MUST3R_PROCESS_ID": str(rank),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, "multi", out_dir, str(epochs)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=540) for p in procs]
    results = []
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-4000:]}"
        import json
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out
        results.append(json.loads(line[-1][len("RESULT "):]))
    return results


@pytest.mark.timeout(1200)
@pytest.mark.slow
def test_multi_process_trainer_matches_single_and_resumes(tmp_path):
    import json

    multi_dir = str(tmp_path / "multi")
    single_dir = str(tmp_path / "single")

    # ---- phase 1: 2-process Trainer, 2 epochs --------------------------
    results = _run_multi(multi_dir, 2)
    assert results[0]["is_main"] and not results[1]["is_main"]
    assert results[0]["losses"] == results[1]["losses"]  # psum lockstep
    assert len(results[0]["losses"]) == 2
    # rank-0-only checkpoint write happened
    assert os.path.isdir(os.path.join(multi_dir, "checkpoint-last"))

    # ---- phase 2: single process over the SAME global batches ----------
    env = _env({"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
    p = subprocess.run(
        [sys.executable, "-c", _WORKER, "single", single_dir, "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, p.stderr[-4000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
    single = json.loads(line[-1][len("RESULT "):])
    for lm, ls in zip(results[0]["losses"], single["losses"]):
        assert abs(lm - ls) < 1e-4 * max(1.0, abs(ls)), (
            results[0]["losses"], single["losses"])

    # ---- phase 3: resume across a full 2-process restart ---------------
    results2 = _run_multi(multi_dir, 3)
    for r in results2:
        assert r["resumed_at"] == 2, r       # both ranks resumed at epoch 2
        assert len(r["losses"]) == 1         # only epoch 2 ran
    assert results2[0]["losses"] == results2[1]["losses"]
