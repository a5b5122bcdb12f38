"""Device mesh + sharding helpers (replaces torch DDP/NCCL, SURVEY §5.8).

The reference trains data-parallel with DDP over NCCL
(`must3r/engine/train.py:303-310`). TPU-native equivalent: a
`jax.sharding.Mesh` over ('dp', 'mp'); the batch axis rides 'dp', the
independent per-view encoder work and attention heads can ride 'mp'.
Gradient reduction is inserted by GSPMD from the sharding constraints --
no hand-written collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence] = None,
              axis_names: Tuple[str, str] = ("dp", "mp")) -> Mesh:
    """Build a 2-axis mesh (default ('dp', 'mp')). dp = n_devices // mp."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    assert n % mp == 0, (n, mp)
    arr = np.asarray(devices[:n]).reshape(n // mp, mp)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays with B sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def constrain(x, mesh: Mesh, *spec):
    """with_sharding_constraint shorthand."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


from must3r_tpu.parallel.distributed import (  # noqa: E402,F401
    global_batch,
    init_distributed,
    is_main_process,
    local_batch_size,
    process_count,
    process_index,
)
from must3r_tpu.parallel.sharded_attention import (  # noqa: E402,F401
    shard_memory,
    sharded_memory_cross_attention,
)
