"""Microbench: XLA matmul emitter at MUSt3R's per-image token shapes.

Hypothesis (round 4, VERDICT #2): the train step's [V, 196, D] @ [D, K]
dots hit XLA's batched emitter with M=196 per matmul (196 rows are not
sublane-tile aligned, so flattening the leading dims is a relayout copy
-- the measured rejection in models/layers.py::linear). Padding each
image to 208 tokens (multiple of 16, the bf16 sublane tile) makes
[V, 208, D] -> [V*208, D] a free bitcast, so the same weights run as ONE
large-M matmul.

Configs mirror the hot train-step dots:
  encoder qkv   [20,196,1024] @ [1024,3072]
  encoder mlp   [20,196,1024] @ [1024,4096]
  decoder qkv   [5,196,768]   @ [768,2304]
  decoder mlp   [5,196,768]   @ [768,3072]

Variants per config:
  batched   x[V,196,D] @ w          (today's emitter)
  pad208    x[V,208,D] -> reshape [V*208,D] @ w -> reshape back
  flat      x[V*196,D] @ w          (ideal M, layout already flat)

Also a 3-op chain (LN -> dot -> gelu) per variant to include the
elementwise neighbourhood XLA fuses around the dot.

Usage: python scripts/bench_flat_matmul.py [--dtype bf16] [--reps 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_must3r"))


def timed(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))                      # force through the tunnel
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = fn(*args)
    float(jnp.sum(acc))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--reps", type=int, default=64)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    configs = [
        ("enc_qkv", 20, 1024, 3072),
        ("enc_mlp", 20, 1024, 4096),
        ("dec_qkv", 5, 768, 2304),
        ("dec_mlp", 5, 768, 3072),
    ]
    n, npad = 196, 208
    key = jax.random.PRNGKey(0)

    for name, v, d, k in configs:
        x = jax.random.normal(key, (v, n, d), dt)
        xp = jax.random.normal(key, (v, npad, d), dt)
        xf = jax.random.normal(key, (v * n, d), dt)
        w = jax.random.normal(key, (d, k), dt)

        @jax.jit
        def f_batched(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.float32
                           ).astype(x.dtype)

        @jax.jit
        def f_pad(x, w):
            vv, nn, dd = x.shape
            y = jnp.dot(x.reshape(vv * nn, dd), w,
                        preferred_element_type=jnp.float32)
            return y.reshape(vv, nn, -1).astype(x.dtype)

        @jax.jit
        def f_flat(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.float32
                           ).astype(x.dtype)

        def chain(dot_fn):
            @jax.jit
            def f(x, w):
                xf32 = x.astype(jnp.float32)
                mu = jnp.mean(xf32, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf32 - mu), axis=-1,
                               keepdims=True)
                xn = ((xf32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(
                    x.dtype)
                return jax.nn.gelu(dot_fn(xn, w), approximate=False)
            return f

        flops = 2 * v * n * d * k
        flops_pad = 2 * v * npad * d * k
        rows = []
        for label, fn, xx, fl in [
            ("batched", f_batched, x, flops),
            ("pad208 ", f_pad, xp, flops_pad),
            ("flat   ", f_flat, xf, flops),
        ]:
            t = timed(fn, (xx, w), args.reps)
            tc = timed(chain(fn if label != "flat   " else f_flat),
                       (xx, w), args.reps)
            # effective rate normalized to the USEFUL flops (196 rows)
            rows.append((label, t * 1e6, flops / t / 1e12,
                         tc * 1e6, flops / tc / 1e12))
        print(f"-- {name}: [V={v},N,{d}] @ [{d},{k}] --")
        for label, us, tf, cus, ctf in rows:
            print(f"  {label} dot {us:8.1f} us  {tf:6.1f} TF/s"
                  f"   ln+dot+gelu {cus:8.1f} us  {ctf:6.1f} TF/s")


if __name__ == "__main__":
    main()
