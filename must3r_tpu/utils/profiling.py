"""Tracing / profiling utilities (SURVEY §5.1).

The reference only has ad-hoc telemetry (tqdm VRAM postfixes, SLAM fps
prints). First-class equivalents here:
  * `trace(logdir)` -- jax.profiler context writing a TensorBoard-viewable
    trace of device execution.
  * `PhaseTimer` -- wall-clock phase timers with result materialization
    (device timings through remote tunnels need an output fetch, not just
    block_until_ready).
  * `device_memory_stats()` -- per-device HBM usage (the CUDA
    max_memory_allocated analog).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/prof'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def materialize(tree) -> float:
    """Force full device execution by fetching a scalar touching every
    output leaf; returns the (meaningless) checksum."""
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number)]
    if not leaves:
        return 0.0
    return float(sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in leaves))


class PhaseTimer:
    """Accumulating named phase timers.

        t = PhaseTimer()
        with t.phase("encode"):
            out = encode(...)
        t.materializing_phase("decode", lambda: step(...))
        print(t.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def materializing_phase(self, name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        materialize(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        rows = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            ms = 1000 * self.totals[k]
            rows.append(f"{k}: {ms:.1f} ms total, "
                        f"{ms / max(self.counts[k], 1):.2f} ms/call "
                        f"x{self.counts[k]}")
        return "\n".join(rows)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use", -1),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use",
                                                      -1),
                           "bytes_limit": s.get("bytes_limit", -1)}
        except Exception:
            out[str(d)] = {}
    return out
