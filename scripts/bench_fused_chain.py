"""Measure the headroom of fusing the decoder block's LN->qkv/rope/
residual front-end into a custom kernel (VERDICT r3 next #2's named
lever; reference chain: must3r/model/blocks.py CachedDecoderBlock
norm1->attn->norm2->cross_attn->norm3->mlp).

Three measurements at the flagship training shapes (folded G: the update
step sees [5*196, 768] rows, the render step [15*196, 768]):

  matmul-only      jit(x @ W)                      -- the MXU floor
  xla-chain        jit(LN(x) @ W + residual tail)  -- what production pays
  pallas-fused     one kernel: LN rows in VMEM, dot against W tiles,
                   residual add on the way out     -- the proposed lever

If (xla-chain - matmul-only) is already ~0, XLA has fused the
elementwise neighborhood into the dot and the custom kernel has no
headroom by construction; the lever is then retired by measurement
without needing the full backward story. Run on the real chip:
  python scripts/bench_fused_chain.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _ln(x, g, b, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def pallas_ln_matmul(x, g, b, w, block_m=256, block_n=768):
    """One-pass LN + matmul: each program LNs a row-block in VMEM (fp32
    stats) and contracts it against a column tile of w; the LN'd rows
    never round-trip HBM. Grid (M/bm, N/bn); K=768 unsplit (w column tile
    768x768x2B = 1.1 MB VMEM)."""
    from jax.experimental import pallas as pl

    m, k = x.shape
    n = w.shape[1]
    assert m % block_m == 0 and n % block_n == 0, (m, n)

    def kernel(x_ref, g_ref, b_ref, w_ref, o_ref):
        xr = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xr, axis=-1, keepdims=True)
        va = jnp.var(xr, axis=-1, keepdims=True)
        xn = ((xr - mu) * jax.lax.rsqrt(va + 1e-6)
              * g_ref[...].astype(jnp.float32)
              + b_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
        o_ref[...] = jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(m // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, g.reshape(1, k), b.reshape(1, k), w)


def bench(fn, args, iters=30):
    """Device time per iteration: on-device scan in one dispatch, one
    fetch (tunnel RTT would otherwise dominate; see bench_ca_kernel)."""

    @jax.jit
    def loop(*a):
        def body(c, _):
            o = fn(a[0] + c, *a[1:])
            return jnp.max(o[..., :1]).astype(a[0].dtype) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                            length=iters)
        return c

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0 - 0.026) / iters


def main():
    key = jax.random.PRNGKey(0)
    d = 768
    for name, rows, nout in [
        ("update_qkv  [5*196,768]->2304", 5 * 196, 3 * d),
        ("render_qkv  [15*196,768]->2304", 15 * 196, 3 * d),
        ("update_mlp_in [5*196,768]->3072", 5 * 196, 4 * d),
    ]:
        m = -(-rows // 256) * 256          # pad rows to the block like XLA
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (m, d), jnp.bfloat16)
        w = jax.random.normal(ks[1], (d, nout), jnp.bfloat16) * 0.02
        g = jnp.ones((d,), jnp.bfloat16)
        b = jnp.zeros((d,), jnp.bfloat16)
        res = jax.random.normal(ks[2], (m, nout), jnp.bfloat16)

        t_mm = bench(lambda x, w: x @ w, (x, w))
        t_chain = bench(lambda x, g, b, w, r: _ln(x, g, b) @ w + r,
                        (x, g, b, w, res))
        t_fused = bench(lambda x, g, b, w: pallas_ln_matmul(x, g, b, w),
                        (x, g, b, w))
        fl = 2 * m * d * nout
        print(f"{name:34s} matmul {t_mm * 1e6:7.1f} us ({fl / t_mm / 1e12:5.1f} TF/s)"
              f"  xla-chain {t_chain * 1e6:7.1f} us (+{(t_chain - t_mm) * 1e6:6.1f})"
              f"  pallas-fused {t_fused * 1e6:7.1f} us",
              flush=True)
        err = float(jnp.max(jnp.abs(
            pallas_ln_matmul(x, g, b, w).astype(jnp.float32)
            - (_ln(x, g, b) @ w).astype(jnp.float32))))
        print(f"{'':34s} fused-vs-xla max_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
