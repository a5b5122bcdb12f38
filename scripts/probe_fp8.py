"""Probe: can Mosaic (Pallas TPU) load float8_e4m3fn from VMEM and
convert to bf16 on this chip? Decides the fp8-KV kernel strategy
(direct fp8 ref vs int8-bitcast decode vs chunked-only fallback).

Run on the real chip: python scripts/probe_fp8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.bfloat16) * 2.0


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    x = jnp.asarray(np.linspace(-8, 8, 8 * 128).reshape(8, 128),
                    jnp.float8_e4m3fn)
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
        )(x)
        ref = x.astype(jnp.bfloat16) * 2.0
        err = float(jnp.max(jnp.abs(out - ref)))
        print("fp8 VMEM load+convert: OK, max_err", err)
    except Exception as e:  # noqa: BLE001
        print("fp8 VMEM load+convert FAILED:", type(e).__name__,
              str(e)[:500])

    # and a dot after dequant (the kernel's actual use)
    def kernel2(x_ref, w_ref, o_ref):
        xb = x_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(xb, w_ref[...],
                             preferred_element_type=jnp.float32)

    w = jnp.asarray(np.random.default_rng(0).standard_normal((128, 128)),
                    jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x, w)
        ref = jnp.dot(x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref)))
        print("fp8 dequant + MXU dot: OK, max_err", err)
    except Exception as e:  # noqa: BLE001
        print("fp8 dequant + dot FAILED:", type(e).__name__, str(e)[:500])


if __name__ == "__main__":
    main()
