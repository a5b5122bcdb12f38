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

import math

import jax
import jax.numpy as jnp

from must3r_tpu.ops.attention import memory_cross_attention

_NEG_INF = float("-inf")


def _ca_pallas_2h(q, kv, labels, kv_len, layer, block_k=None, block_q=None):
    """EXPERIMENT (VERDICT r2 item 3): two heads per kernel program.

    Same flash loop as ops.attention._ca_pallas, but the grid's head axis
    is halved and each program runs BOTH heads' QK/softmax/PV chains over
    a shared label DMA. The two chains are data-independent, giving the
    Mosaic scheduler the freedom to overlap head A's VPU softmax with
    head B's MXU dots -- the overlap that deferred-PV pipelining within a
    single chain could not buy (docs/PERF.md). Simplified to the serving
    shapes the microbench uses: g=1, no dropout mask, no quantized cache,
    no folded rows, no LSE output, and masking is `label >= 0` ONLY — the
    production kernel's q_self self-exclusion and q_upper label-causality
    predicates are dropped, so this variant must NOT be promoted to
    ops/attention.py without restoring them. Precondition (same as the
    production _ca_prep): labels at positions >= kv_len must be -1 and
    kv_len > 0, else a fully-masked block yields NaN via
    exp(-inf - (-inf)). Parity vs the production chunked path:
    `python scripts/bench_ca_kernel.py --check`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, g, n, h, dh = q.shape
    assert g == 1 and h % 2 == 0
    s_cap = kv.shape[3]
    bk = min(block_k or (1024 if (n <= 1024 and s_cap % 1024 == 0)
                         else 512), s_cap)
    bq = min(block_q or (1024 if n <= 1024 else 512), -(-n // 128) * 128)
    n_qb = -(-n // bq)
    q_pad = n_qb * bq - n
    scale = 1.0 / math.sqrt(dh)
    assert s_cap % bk == 0, (s_cap, bk)   # mirrors production _ca_prep
    len_and_layer = jnp.stack([jnp.asarray(kv_len, jnp.int32).reshape(()),
                               jnp.asarray(layer, jnp.int32).reshape(())])
    labels_tiled = labels.reshape(b * (s_cap // bk), 1, bk)

    qt = q.transpose(0, 1, 3, 2, 4)                    # B,G,H,N,Dh
    if q_pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, q_pad), (0, 0)))

    def kernel(len_ref, q_ref, kv_hbm, lbl_hbm, o_ref, kv_buf, lbl_buf, sem):
        bi = pl.program_id(0)
        hp = pl.program_id(1)                          # head pair
        length = len_ref[0]
        li = len_ref[1]
        n_blocks = jnp.maximum(pl.cdiv(length, bk), 1)

        def dma_kv(slot, idx, j):
            return pltpu.make_async_copy(
                kv_hbm.at[li, bi, hp * 2 + j, pl.ds(idx * bk, bk), :],
                kv_buf.at[slot, j], sem.at[slot, j])

        def dma_l(slot, idx):
            row = bi * (s_cap // bk) + idx
            return pltpu.make_async_copy(
                lbl_hbm.at[row], lbl_buf.at[slot], sem.at[slot, 2])

        def start(slot, idx):
            dma_kv(slot, idx, 0).start()
            dma_kv(slot, idx, 1).start()
            dma_l(slot, idx).start()

        start(0, 0)
        qb = [q_ref[0, 0, j] for j in range(2)]        # (bq, Dh) x2

        def body(i, carry):
            m, l, acc = carry                          # lists of 2
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            dma_kv(slot, i, 0).wait()
            dma_kv(slot, i, 1).wait()
            dma_l(slot, i).wait()
            lbl = lbl_buf[slot]                        # (1, bk)
            allow = lbl >= 0
            m_n, l_n, a_n = [], [], []
            for j in range(2):
                kb = kv_buf[slot, j, :, :dh]
                vb = kv_buf[slot, j, :, dh:]
                s = jax.lax.dot_general(
                    qb[j], kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(allow, s, _NEG_INF)
                mj = jnp.maximum(m[j], jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - mj)
                corr = jnp.exp(m[j] - mj)
                lj = l[j] * corr + jnp.sum(p, axis=-1, keepdims=True)
                aj = acc[j] * corr + jnp.dot(
                    p.astype(vb.dtype), vb,
                    preferred_element_type=jnp.float32)
                m_n.append(mj)
                l_n.append(lj)
                a_n.append(aj)
            return (m_n, l_n, a_n)

        m0 = [jnp.full((bq, 1), _NEG_INF, jnp.float32) for _ in range(2)]
        l0 = [jnp.zeros((bq, 1), jnp.float32) for _ in range(2)]
        a0 = [jnp.zeros((bq, dh), jnp.float32) for _ in range(2)]
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, a0))
        for j in range(2):
            o_ref[0, 0, j] = (acc[j] / jnp.maximum(l[j], 1e-30)
                              ).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // 2, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, 2, bq, dh),
                         lambda bi, hi, qi, *_: (bi, 0, hi, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, bq, dh),
                               lambda bi, hi, qi, *_: (bi, 0, hi, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bk, 2 * dh), kv.dtype),
            pltpu.VMEM((2, 1, bk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, h, n_qb * bq, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(len_and_layer, qt, kv, labels_tiled)
    if q_pad:
        out = out[:, :, :, :n, :]
    return out.transpose(0, 1, 3, 2, 4)


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


def check_2h_parity():
    """Numerics of the experimental 2h kernel vs the production chunked
    path (the reproducible form of the PERF.md parity claim). Run on the
    real chip; labels are valid (>=0) up to kv_len and -1 beyond, as the
    kernel's precondition requires."""
    key = jax.random.PRNGKey(0)
    h, dh = 12, 64
    worst = 0.0
    for name, (n, s, kv_len) in {
        "render_10v_512": (7680, 7680, 7680),
        "update_1v_64kf": (768, 49152, 49152),
        "partial_fill": (768, 49152, 9216),
    }.items():
        kq, kk = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        q = jax.random.normal(kq, (1, 1, n, h, dh), jnp.bfloat16)
        kv = jax.random.normal(kk, (12, 1, h, s, 2 * dh), jnp.bfloat16)
        labels = jnp.where(jnp.arange(s) < kv_len, 0, -1)[None].astype(
            jnp.int32)
        got = _ca_pallas_2h(q, kv, labels, kv_len=kv_len,
                            layer=jnp.int32(3))
        want = memory_cross_attention(q, kv, labels, layer=jnp.int32(3),
                                      impl="chunked")
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        worst = max(worst, err)
        print(f"check {name:18s} max_err={err:.2e}", flush=True)
    assert worst < 5e-3, worst
    print(f"2h parity OK (worst {worst:.2e} bf16)")


def main():
    key = jax.random.PRNGKey(0)
    h, dh = 12, 64
    cases = {
        # render phase: 10 views x 768 tokens flattened, memory = 10 views
        "render_10v_512": dict(b=1, g=1, n=7680, s=7680),
        # streaming update: 1 view queries vs 64-keyframe memory
        "update_1v_64kf": dict(b=1, g=1, n=768, s=49152),
    }
    args = sys.argv[1:]
    if "--check" in args:
        check_2h_parity()
        args.remove("--check")
        if not args:
            return
    which = args or list(cases)
    for name in which:
        c = cases[name]
        b, g, n, s = c["b"], c["g"], c["n"], c["s"]
        q = jax.random.normal(key, (b, g, n, h, dh), jnp.bfloat16)
        kv = jax.random.normal(key, (12, b, h, s, 2 * dh), jnp.bfloat16)
        labels = jnp.zeros((b, s), jnp.int32)

        for impl in ("pallas", "pallas2h", "chunked"):
            if impl == "pallas2h":
                def call(q, kv, lab):
                    return _ca_pallas_2h(q, kv, lab, kv_len=kv.shape[3],
                                         layer=jnp.int32(3))
            else:
                def call(q, kv, lab, impl=impl):
                    return memory_cross_attention(
                        q, kv, lab, layer=jnp.int32(3), impl=impl)

            dt = bench(call, q, kv, labels)
            tf = flops(b, g, n, h, dh, s) / dt / 1e12
            print(f"{name:18s} {impl:8s} {dt * 1e3:7.3f} ms  {tf:6.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
