"""Microbenchmark the memory cross-attention kernel on the real chip.

Shapes mirror the offline render phase at 512x384 (flattened G: one big
query set vs the full memory) and the streaming update step (G=1, one
view's queries). Prints TF/s per variant; used to drive ROADMAP items
"two heads per pass" / fp8 KV (docs/PERF.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from must3r_tpu.ops.attention import memory_cross_attention


def flops(b, g, n, h, dh, s):
    return 2 * 2 * b * g * h * n * s * dh     # QK^T + PV


def bench(call, q, kv, labels, iters=20):
    """Pure device time per iteration: run the op in an on-device scan
    inside ONE jitted dispatch (the remote tunnel costs ~26 ms per
    dispatch/fetch, docs/PERF.md, so per-call host timing is meaningless).
    A data dependency through the carry defeats CSE."""

    @jax.jit
    def loop(q, kv, labels):
        def body(c, _):
            o = call(q + c, kv, labels)
            return jnp.max(o[..., :1, :1]).astype(q.dtype) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None,
                            length=iters)
        return c

    float(loop(q, kv, labels))           # warmup + compile, one fetch
    t0 = time.perf_counter()
    float(loop(q, kv, labels))
    return (time.perf_counter() - t0 - 0.026) / iters   # subtract tunnel RT


def main():
    key = jax.random.PRNGKey(0)
    h, dh = 12, 64
    cases = {
        # render phase: 10 views x 768 tokens flattened, memory = 10 views
        "render_10v_512": dict(b=1, g=1, n=7680, s=7680),
        # streaming update: 1 view queries vs 64-keyframe memory
        "update_1v_64kf": dict(b=1, g=1, n=768, s=49152),
    }
    which = sys.argv[1:] or list(cases)
    for name in which:
        c = cases[name]
        b, g, n, s = c["b"], c["g"], c["n"], c["s"]
        q = jax.random.normal(key, (b, g, n, h, dh), jnp.bfloat16)
        kv = jax.random.normal(key, (12, b, h, s, 2 * dh), jnp.bfloat16)
        labels = jnp.zeros((b, s), jnp.int32)

        for impl in ("pallas", "chunked"):
            def call(q, kv, lab, impl=impl):
                return memory_cross_attention(q, kv, lab,
                                              layer=jnp.int32(3), impl=impl)

            dt = bench(call, q, kv, labels)
            tf = flops(b, g, n, h, dh, s) / dt / 1e12
            print(f"{name:18s} {impl:8s} {dt * 1e3:7.3f} ms  {tf:6.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
