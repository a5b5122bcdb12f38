"""Decompose the 224/20-view training step (bench.py train_step config)
into phases to attribute the MFU gap (VERDICT r2 item 1).

Measures, on the current backend:
  enc_fwd     encoder forward alone (frozen path)
  loss_fwd    full loss_fn forward (no grad)
  grad        value_and_grad of loss_fn (no optimizer)
  step        full train step (grad + optimizer + apply)

Each timed after warmup, min over reps. Also prints effective TF/s from
an analytic FLOP model of the step.

Usage: python scripts/profile_train.py [--trace /tmp/tbtrace] [--dropout 0.1]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_must3r"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def flops_model(b, v, hw, n_render, cap):
    """Analytic FLOPs per step (matmul-only, fwd; bwd = 2x fwd on decoder)."""
    n = (hw // 16) ** 2
    # encoder ViT-L: 24 blocks, d=1024, mlp 4x
    d = 1024
    enc_param_flops = 24 * (4 * d * d + 8 * d * d) * 2  # qkv+proj + mlp, x2
    enc_attn = 24 * 4 * n * d  # per token: 2*(QK+PV)*n*d
    toks = b * v * n
    enc = toks * (enc_param_flops + enc_attn)
    # decoder ViT-B 12 blocks d=768: sa(4d^2)+ca(4d^2)+mlp(8d^2) proj x2
    dd = 768
    dec_param_flops = 12 * (4 * dd * dd + 4 * dd * dd + 8 * dd * dd) * 2
    dec_sa = 12 * 4 * n * dd
    dec_ca = 12 * 4 * cap * dd  # per query token vs cap kv (upper bound)
    dtoks = b * (v + n_render) * n
    dec_fwd = dtoks * (dec_param_flops + dec_sa) + dtoks * dec_ca
    return enc, dec_fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--remat", default="1")
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1,
                    help="per-chip batch size (throughput lever A/B)")
    ap.add_argument("--scan_steps", action="store_true",
                    help="lax.scan over update steps (A/B vs unrolled)")
    args = ap.parse_args()

    from must3r_tpu.config import must3r_224_configs
    from must3r_tpu.engine.train import (TrainSettings, cast_frozen_params,
                                         cosine_schedule, make_loss_fn,
                                         make_optimizer, make_train_step,
                                         trainable_subset)
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.models.encoder import encoder_forward
    from must3r_tpu.ops.patch import patchify_positions

    enc_cfg, dec_cfg = must3r_224_configs()
    dec_cfg = dataclasses.replace(dec_cfg, causal=True)
    v = args.views
    nb = v // 5
    remat = {"1": True, "0": False}.get(args.remat, args.remat)
    ts = TrainSettings(mem_batches=(5,) * nb, n_render=2,
                       dropout_p=args.dropout, dtype="bfloat16",
                       remat=remat, scan_steps=args.scan_steps)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}
    opt = make_optimizer(cosine_schedule(1e-4, 10, 1000), weight_decay=0.05)
    opt_state = opt.init(trainable_subset(params, ts))
    # production path: Trainer holds the frozen tower in the compute dtype
    params = cast_frozen_params(params, ts)
    loss_fn = make_loss_fn(enc_cfg, dec_cfg, ts)

    b, hw = args.batch, 224
    npatch = (hw // 16) ** 2
    npos = np.asarray(patchify_positions(hw // 16, hw // 16))
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((b, v, hw, hw, 3)),
                           jnp.float32),
        "pos": jnp.asarray(np.broadcast_to(npos, (b, v, npatch, 2))),
        "pts3d": jnp.asarray(rng.standard_normal((b, v, hw, hw, 3)) + 3.0,
                             jnp.float32),
        "camera_pose": jnp.asarray(np.broadcast_to(
            np.eye(4, dtype=np.float32), (b, v, 4, 4))),
        "valid_mask": jnp.ones((b, v, hw, hw), bool),
        "sky_mask": jnp.zeros((b, v, hw, hw), bool),
        "is_metric_scale": jnp.zeros((b,), bool),
        "render_ids": jnp.asarray([v - 2, v - 1], jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    imgs_f = batch["img"].reshape(b * v, hw, hw, 3)
    pos_f = batch["pos"].reshape(b * v, npatch, 2)

    enc_fn = jax.jit(lambda p: encoder_forward(p["encoder"], enc_cfg,
                                               imgs_f, pos_f))
    fwd_fn = jax.jit(lambda p, ba, k: loss_fn(p, ba, k)[0])
    grad_fn = jax.jit(jax.grad(lambda p, ba, k: loss_fn(p, ba, k)[0]))

    def timeit(name, fn, reps=3):
        out = fn()
        jax.block_until_ready(out)  # compile+warm
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / reps)
        t = min(times)
        print(f"{name:12s} {t * 1e3:8.1f} ms", flush=True)
        return t

    t_enc = timeit("enc_fwd", lambda: enc_fn(params))
    t_fwd = timeit("loss_fwd", lambda: fwd_fn(params, batch, key))
    t_grad = timeit("grad", lambda: grad_fn(params, batch, key))

    # the step metric uses the PRODUCTION program (donated params/opt
    # state, as Trainer and bench.py run it): the non-donated twin above
    # carries input->output buffer copies of the whole parameter set
    dstep = make_train_step(enc_cfg, dec_cfg, ts, opt, donate=True)
    dp_, do_ = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy,
                                                            opt_state)

    def chained_step():
        nonlocal dp_, do_
        dp_, do_, loss, _ = dstep(dp_, do_, batch, key)
        return loss

    t_step = timeit("step", chained_step)

    from must3r_tpu.memory import round_capacity
    cap = round_capacity(v * npatch, ts.capacity_block)
    enc_f, dec_f = flops_model(b, v, hw, ts.n_render, cap)
    tot_fwd = enc_f + dec_f
    tot_step = enc_f + 3 * dec_f  # bwd 2x + remat refwd 1x (decoder only)
    print(f"\nanalytic FLOPs: enc {enc_f/1e12:.2f}T dec_fwd {dec_f/1e12:.2f}T"
          f" step(total w/ remat) {tot_step/1e12:.2f}T")
    print(f"enc_fwd   : {enc_f / t_enc / 1e12:6.1f} TF/s")
    print(f"loss_fwd  : {tot_fwd / t_fwd / 1e12:6.1f} TF/s")
    print(f"grad      : {tot_step / t_grad / 1e12:6.1f} TF/s")
    print(f"step      : {tot_step / t_step / 1e12:6.1f} TF/s "
          f"({1.0 / t_step:.2f} it/s)")
    print(f"throughput: {b / t_step:.2f} samples/s, "
          f"{b * v / t_step:.1f} views/s (batch {b})")
    print(f"opt overhead (step - grad): {(t_step - t_grad) * 1e3:.1f} ms")
    print(f"bwd+remat (grad - fwd):     {(t_grad - t_fwd) * 1e3:.1f} ms")
    print(f"decoder fwd (fwd - enc):    {(t_fwd - t_enc) * 1e3:.1f} ms")

    if args.trace:
        # production program: donated params/opt_state (as Trainer runs it)
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = chained_step()
            jax.block_until_ready(out)
        print(f"trace written to {args.trace} (donated step)")


if __name__ == "__main__":
    main()
