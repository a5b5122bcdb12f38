"""Benchmark: offline multi-view reconstruction throughput at 512x384.

North-star metric (BASELINE.json): views/sec for the flagship
(MUSt3R_512-sized) model running the offline pipeline -- encode every view,
stream them through the memory decoder (schedule [2, 1, 1, ...]), then
render every view against the final memory and run postprocess.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against an estimated 25 views/s for the CUDA+xformers reference on
a single A100 at this resolution (ViT-L encode + ViT-B decode + render,
~0.7 TFLOP/view end-to-end).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the fused pipeline compiles once per
# machine; subsequent bench invocations start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_must3r"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ASSUMED_BASELINE_VIEWS_PER_SEC = 25.0
N_VIEWS = 10
H, W = 384, 512


def main():
    from must3r_tpu.config import must3r_512_configs
    from must3r_tpu.engine import InferenceCore, make_fused_offline
    from must3r_tpu.models import init_decoder, init_encoder

    enc_cfg, dec_cfg = must3r_512_configs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.bfloat16)
    fused = make_fused_offline(core, N_VIEWS, (H, W), compute_cam=True)

    imgs = jax.random.normal(jax.random.PRNGKey(1), (N_VIEWS, H, W, 3),
                             jnp.float32)

    def run(n: int = 1):
        # dispatch n reconstructions, then force full materialization with
        # ONE host fetch (block_until_ready alone is not reliable through
        # remote tunnels; per-output fetches would add round trips)
        outs = [fused(imgs) for _ in range(n)]
        s = sum(jnp.sum(v) for o in outs for v in o.values())
        return float(s)

    run()  # warmup + compile
    # steady-state throughput: pipeline 4 runs per measurement so fixed
    # per-dispatch latency is amortized as in production serving
    reps = 4
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(reps)
        times.append((time.perf_counter() - t0) / reps)
    best = min(times)
    views_per_sec = N_VIEWS / best

    print(json.dumps({
        "metric": f"views_per_sec_offline_{W}x{H}_{N_VIEWS}views",
        "value": round(views_per_sec, 3),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / ASSUMED_BASELINE_VIEWS_PER_SEC,
                             3),
    }))


if __name__ == "__main__":
    main()
