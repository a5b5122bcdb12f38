"""MUSt3R-TPU: a TPU-native multi-view 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of naver/must3r
(feed-forward multi-view pointmap regression with a multi-layer token memory),
built TPU-first:

  * the multi-layer token memory is an explicit, fixed-capacity, per-layer
    KV cache (a pytree of static-shape arrays) threaded through jitted step
    functions -- every memory edit (append / evict / update / relabel) is a
    masked write at static shape (`must3r_tpu.memory`);
  * attention runs through fused Pallas flash kernels with label-based
    masking computed in-kernel (`must3r_tpu.ops.attention`), so the
    reference's O(Nq*Nkv) boolean masks are never materialised;
  * multi-chip scaling uses `jax.sharding.Mesh` + collectives, not NCCL
    (`must3r_tpu.parallel`).

Reference behavioral parity target: /root/reference (naver/must3r @ 2025-10-03).
"""

__version__ = "0.1.0"

from must3r_tpu.config import EncoderConfig, DecoderConfig  # noqa: F401
