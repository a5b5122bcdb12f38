"""Multi-host scaffolding tests (SURVEY §5.8, the torchrun/NCCL
replacement).

The real check is a genuine 2-process `jax.distributed` bring-up over
localhost (CPU backend): each process owns 2 virtual devices, a 4-device
dp mesh spans both, per-process local batches assemble into one global
array, and a GSPMD-jitted step produces identical (psum-reduced) results
on every process while only process 0 writes.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np

import jax
import jax.numpy as jnp

from must3r_tpu.parallel import (global_batch, init_distributed,
                                 is_main_process, local_batch_size,
                                 make_mesh, process_count, replicate)

ok = init_distributed()
assert ok, "init_distributed() did not come up"
assert process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh(4, mp=1, axis_names=("dp", "mp"))
rank = jax.process_index()

# host-local shard of a global batch of 4: each process loads rows it owns
gbs = 4
lbs = local_batch_size(gbs)
assert lbs == 2
full = np.arange(gbs * 3, dtype=np.float32).reshape(gbs, 3)
local = full[rank * lbs:(rank + 1) * lbs]
batch = global_batch(mesh, {"x": local, "render_ids": np.asarray([0])})
assert batch["x"].shape == (gbs, 3)

params = replicate(mesh, {"w": jnp.ones((3,), jnp.float32)})

@jax.jit
def step(params, batch):
    # mean over the GLOBAL batch: GSPMD inserts the cross-host psum
    return jnp.mean(batch["x"] @ params["w"])

loss = float(step(params, batch))
want = float(full.sum(1).mean())
assert abs(loss - want) < 1e-5, (loss, want)
assert is_main_process() == (rank == 0)
print(f"RANK{rank} OK loss={loss}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_smoke():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "MUST3R_COORDINATOR": f"127.0.0.1:{port}",
            "MUST3R_NUM_PROCESSES": "2",
            "MUST3R_PROCESS_ID": str(rank),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=240) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert f"RANK{rank} OK" in out


def test_local_batch_size_single_process():
    from must3r_tpu.parallel import local_batch_size
    assert local_batch_size(8) == 8


def test_sampler_feature_draws_align_across_ranks():
    """With world_size > 1 the k-th batch of every rank must carry the SAME
    (ar_idx, memory_num_views): the rank slices are one global batch per
    step under GSPMD (static shapes)."""
    from must3r_tpu.datasets import SyntheticScenes
    from must3r_tpu.datasets.base import BatchedRandomSampler

    ds = SyntheticScenes(num_views=4, resolutions=((64, 48), (64, 32)),
                         epoch_size=32, min_memory_num_views=2)
    streams = []
    for rank in range(2):
        s = BatchedRandomSampler(ds, batch_size=4, world_size=2, rank=rank)
        s.set_epoch(3)
        streams.append(list(s))
    assert len(streams[0]) == len(streams[1]) > 0
    for a, b in zip(streams[0], streams[1]):
        assert a[1:] == b[1:]          # same (ar, mv) at the same step
    # and the sample partition is disjoint
    s0 = {t[0] for t in streams[0]}
    s1 = {t[0] for t in streams[1]}
    assert not (s0 & s1)
