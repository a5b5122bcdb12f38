"""Attribute the sp=2 sharded-serving overhead (VERDICT r3 weak #3).

bench.py's `sharded_sp2` config measured 1.5-1.7x sharded/unsharded on an
update+render loop. This decomposes that ratio into its candidate causes
on the same 2-device virtual CPU mesh:

  update     decoder update step (append into the sharded KV buffer --
             GSPMD must lower a dynamic_update_slice with a dynamic start
             on the sharded axis)
  render     decoder render step (the sharded CA read + psum combine)
  ca_op      the CA op alone: sharded_memory_cross_attention vs the
             unsharded chunked path on identical logical shapes
  ca_nopsum  the per-shard partial-flash compute without the combine
             (isolates the psum + renormalization cost)
  append     memory.append_tokens alone on a sharded vs unsharded buffer

Self-re-executes with a clean CPU env (the axon preload would otherwise
grab the TPU). Run: python scripts/attr_sp2.py [--sp 2]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _reexec_cpu(n_dev):
    if os.environ.get("_ATTR_SP2_CHILD"):
        return
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.update({"JAX_PLATFORMS": "cpu", "_ATTR_SP2_CHILD": "1",
                "XLA_FLAGS": (env.get("XLA_FLAGS", "") +
                              f" --xla_force_host_platform_device_count={n_dev}"
                              " --xla_cpu_collective_call_warn_stuck_"
                              "timeout_seconds=120"
                              " --xla_cpu_collective_call_terminate_"
                              "timeout_seconds=1200"
                              ).strip()})
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    _reexec_cpu(args.sp)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from must3r_tpu.config import DecoderConfig, EncoderConfig
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.inference import view_positions
    from must3r_tpu.memory import append_tokens
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.ops.attention import memory_cross_attention
    from must3r_tpu.parallel import make_mesh, shard_memory
    from must3r_tpu.parallel.sharded_attention import (
        _partial_flash, sharded_memory_cross_attention)
    from jax.sharding import PartitionSpec as P

    h, w, p = 384, 512, 16
    enc_cfg = EncoderConfig(img_size=(h, w), patch_size=p, embed_dim=256,
                            depth=2, num_heads=4)
    dec_cfg = DecoderConfig(img_size=(h, w), enc_embed_dim=256, patch_size=p,
                            embed_dim=768, output_dim=p * p * 7, depth=2,
                            num_heads=12)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc_p, dec_p = init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg)
    n = (h // p) * (w // p)
    n_views = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, n_views, n, 256),
                          jnp.float32)
    pos = view_positions((h, w), p, batch_shape=(1, n_views))
    mesh = make_mesh(args.sp, mp=args.sp, axis_names=("dp", "sp"))

    def timeit(fn, iters=args.iters):
        fn()                                   # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    report = {"sp": args.sp}

    # --- full-step decomposition: update vs render -----------------------
    for tag, mesh_arg in (("base", None), ("sp", mesh)):
        core = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg,
                             dtype=jnp.float32, impl="chunked",
                             mesh=mesh_arg)
        mem0 = core.new_memory(n_views + args.iters + 4, (h, w))
        mem0, _ = core.update(mem0, x[:, :2], pos[:, :2])
        for i in range(2, n_views):
            mem0, _ = core.update(mem0, x[:, i:i + 1], pos[:, i:i + 1])
        holder = {"mem": mem0}

        def upd():
            holder["mem"], toks = core.update(holder["mem"], x[:, 7:8],
                                              pos[:, 7:8])
            return toks

        def ren():
            return core.render(holder["mem"], x[:, :2], pos[:, :2])

        report[f"update_ms_{tag}"] = timeit(upd) * 1e3
        print(f"update_ms_{tag}: {report[f'update_ms_{tag}']:.2f}",
              flush=True)
        report[f"render_ms_{tag}"] = timeit(ren) * 1e3
        print(f"render_ms_{tag}: {report[f'render_ms_{tag}']:.2f}",
              flush=True)

    # --- CA op alone ------------------------------------------------------
    hh, dh = dec_cfg.num_heads, dec_cfg.head_dim
    s_cap = 16384
    q = jax.random.normal(k1, (1, 2, n, hh, dh), jnp.float32)
    kv = jax.random.normal(k2, (1, hh, s_cap, 2 * dh), jnp.float32)
    labels = jnp.where(jnp.arange(s_cap) < 6 * n, 0, -1)[None].astype(
        jnp.int32)

    ca_base = jax.jit(lambda q, kv, lab: memory_cross_attention(
        q, kv, lab, impl="chunked"))
    report["ca_ms_base"] = timeit(
        lambda: ca_base(q, kv, labels)) * 1e3

    kv_sh = jax.device_put(kv, jax.sharding.NamedSharding(
        mesh, P(None, None, "sp", None)))
    lab_sh = jax.device_put(labels, jax.sharding.NamedSharding(
        mesh, P(None, "sp")))
    ca_sp = jax.jit(lambda q, kv, lab: sharded_memory_cross_attention(
        mesh, q, kv, lab))
    report["ca_ms_sp"] = timeit(lambda: ca_sp(q, kv_sh, lab_sh)) * 1e3

    # per-shard compute without the combine: psum/renorm cost = sp - nopsum
    qs = jnp.full((1, 2), -2, jnp.int32)
    qu = jnp.full((1, 2), 2**31 - 1, jnp.int32)

    def nopsum(qv, kvv, lab):
        def local(qv, kvv, lab):
            m, l, acc = _partial_flash(qv, kvv, lab, qs, qu)
            return (acc / jnp.maximum(l, 1e-30)).astype(qv.dtype)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(None, None, "sp", None), P(None, "sp")),
            out_specs=P("sp"))(qv, kvv, lab)

    nopsum_j = jax.jit(nopsum)
    report["ca_ms_sp_nopsum"] = timeit(
        lambda: nopsum_j(q, kv_sh, lab_sh)) * 1e3

    # --- append alone ------------------------------------------------------
    from must3r_tpu.memory import init_memory
    new_kv = jax.random.normal(k1, (dec_cfg.depth, 1, hh, n, 2 * dh),
                               jnp.float32)
    new_lab = jnp.zeros((1, n), jnp.int32)

    for tag, shard in (("base", False), ("sp", True)):
        mem = init_memory(dec_cfg.depth, 1, hh, dh, s_cap,
                          dtype=jnp.float32)
        if shard:
            mem = shard_memory(mesh, mem)
        app = jax.jit(lambda m, nk, nl: append_tokens(m, nk, nl))
        holder = {"m": mem}

        def do_append():
            holder["m"] = app(holder["m"], new_kv, new_lab)
            return holder["m"].kv

        report[f"append_ms_{tag}"] = timeit(do_append) * 1e3

    for k in ("update", "render", "ca", "append"):
        b, s = report[f"{k}_ms_base"], report[f"{k}_ms_sp"]
        report[f"{k}_overhead_x"] = s / b
    report = {k: (round(v, 3) if isinstance(v, float) else v)
              for k, v in report.items()}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
