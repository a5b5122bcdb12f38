"""Multi-host bring-up: the torchrun/NCCL replacement (SURVEY §5.8).

Reference: croco `init_distributed_mode` reads torchrun env vars and calls
`torch.distributed.init_process_group('nccl')`
(reference must3r/engine/train.py:224; launch recipe README.md:242), DDP
wraps the modules, and rank-0 gating guards checkpoint/log writes
(engine/io.py `save_on_master`).

TPU-native equivalent:
  * `init_distributed()` -> `jax.distributed.initialize()` when a
    coordinator is configured (flags or MUST3R_* env vars); afterwards
    `jax.devices()` spans every host's chips and one `Mesh` covers the
    slice. Single-process runs are a no-op.
  * gradient all-reduce: not explicit -- GSPMD inserts the psum from the
    dp-sharded batch (parallel/__init__.py), exactly replacing DDP.
  * `is_main_process()` replaces rank-0 gating for checkpoint/log writes.
  * `global_batch()` replaces DistributedSampler + per-rank DataLoader
    hand-off: every process loads only its own shard of the global batch
    (`BatchedRandomSampler(world_size, rank)`) and
    `jax.make_array_from_process_local_data` assembles the logically
    global array without any cross-host copy.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None
                     ) -> bool:
    """Initialize jax.distributed from args or MUST3R_COORDINATOR /
    MUST3R_NUM_PROCESSES / MUST3R_PROCESS_ID env vars (our torchrun
    env-var contract). Returns True when multi-process mode came up;
    False = single-process (no-op)."""
    coord = coordinator or os.environ.get("MUST3R_COORDINATOR")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("MUST3R_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("MUST3R_PROCESS_ID", "-1") or -1)
    if not coord or nproc <= 1 or pid < 0:
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid,
                               local_device_ids=local_device_ids)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for checkpoint/log writes (croco `is_main_process` /
    `save_on_master`, reference engine/io.py + train.py:322-343)."""
    return jax.process_index() == 0


def global_batch(mesh: Mesh, batch: dict,
                 replicated_keys: Sequence[str] = ("render_ids",)) -> dict:
    """Assemble a per-process local batch into globally-sharded arrays.

    Every leaf except ``replicated_keys`` has its leading axis sharded
    over the mesh's 'dp' axis. Single-process: a plain device_put with the
    same shardings (identical compiled program either way)."""
    multi = jax.process_count() > 1

    def put(x, spec):
        s = NamedSharding(mesh, spec)
        if multi and spec != P():
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return {k: put(v, P() if k in replicated_keys else P("dp"))
            for k, v in batch.items()}


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch (must divide evenly so shapes
    stay static per step)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n
