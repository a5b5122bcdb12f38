"""Memory-sharded cross-attention: sequence parallelism over the KV cache.

SURVEY §5.7: the long-context axis of MUSt3R is the memory token count
(Nmem = keyframes x tokens/view x 12 layers). When Nmem outgrows one
chip's HBM -- or per-frame latency must scale with chips -- the memory is
sharded along its token axis across the mesh 'sp' axis and cross-attention
runs as an all-gather-free blockwise pass:

  each shard computes a partial flash accumulation (m_i, l_i, acc_i) over
  its local tokens, then one combine renormalizes:

      m   = pmax_i m_i
      l   = sum_i l_i * exp(m_i - m)
      out = sum_i acc_i * exp(m_i - m) / l

  -- exactly the online-softmax merge, so the result is bit-comparable to
  unsharded attention up to float addition order. Communication is one
  psum over [*, N, H, Dh] activations; the KV cache itself never moves.

This is the TPU-native counterpart of ring attention for this workload:
queries are tiny (one view) and the KV cache is huge and static, so
replicating queries + reducing outputs beats rotating KV blocks.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from must3r_tpu.ops.attention import _NEG_INF, INT32_MAX


def _partial_flash(q, kv, labels, q_self, q_upper):
    """Unnormalized flash partials over this shard's tokens.

    q: [B, G, N, H, Dh]; kv: [B, H, S_loc, 2*Dh]; labels: [B, S_loc].
    Returns (m [B,G,H,N,1], l [B,G,H,N,1], acc [B,G,H,N,Dh])."""
    b, g, n, h, dh = q.shape
    k, v = jnp.split(kv, 2, axis=-1)
    qf = q.astype(jnp.float32).transpose(0, 1, 3, 2, 4)   # B,G,H,N,Dh
    s = jnp.einsum("bghnd,bhsd->bghns", qf, k.astype(jnp.float32))
    s = s * (1.0 / math.sqrt(dh))
    lb = labels[:, None, :]
    allow = (lb >= 0) & (lb != q_self[..., None]) & (lb < q_upper[..., None])
    s = jnp.where(allow[:, :, None, None, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # guard all-masked shards: exp(-inf - (-inf)) -> use finite sentinel
    m_safe = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bghns,bhsd->bghnd", p, v.astype(jnp.float32))
    return m_safe, l, acc


def sharded_memory_cross_attention(mesh: Mesh, q, kv, labels, q_self=None,
                                   q_upper=None, axis: str = "sp",
                                   impl=None, kv_len=None,
                                   extra_kv=None, extra_labels=None,
                                   kv_scale=None):
    """Label-masked CA against a memory sharded over `axis` along S.

    Each shard runs the SAME blockwise flash pass as the unsharded path
    (Pallas kernel on TPU, chunked XLA scan elsewhere) returning its local
    (out_i, lse_i); the merge is a softmax over shard lse values:

        out = sum_i out_i * exp(lse_i - m) / sum_i exp(lse_i - m),
        m = pmax_i lse_i

    -- the online-softmax identity, so the result is bit-comparable to
    unsharded attention up to float addition order. (The round-3 version
    computed a DENSE fp32 score tensor per shard; scripts/attr_sp2.py
    attributed ~97% of the 1.5x sp=2 serving overhead to exactly that
    per-shard compute -- the psum combine itself is ~1.4%.)

    Args:
      q: [B, G, N, H, Dh] replicated queries.
      kv: [B, H, S, 2*Dh] -- S sharded over `axis` on the mesh.
      labels: [B, S] -- sharded like kv (evicted slots = -1 keep masking
        correct on every shard; an entirely-empty shard is safe).
      impl: 'pallas' | 'chunked' | None (backend default).
      kv_len: optional scalar global fill level; the Pallas path uses it
        to bound each shard's KV loop at its local fill.
      extra_kv / extra_labels: optional REPLICATED second KV source
        ([B, H, T, 2*Dh] / [B, T]) attended with the same masks and merged
        into the sharded result by the log-sum-exp softmax identity. This
        is how `decoder_update` attends a step's new tokens WITHOUT ever
        writing them into the sharded buffer mid-step: a dynamic-start
        `dynamic_update_slice` on the sharded token axis makes GSPMD
        rewrite every local row (scripts/attr_sp2.py measured it at ~4.5x
        the unsharded append); attending new tokens as a replicated side
        source costs one tiny dense pass and zero communication.
      kv_scale: optional per-(token, k|v) dequant scales [B, H, 2, S] for
        an 8-bit quantized cache (memory.quantize_kv layout), sharded over
        `axis` on S like ``kv``. Each shard dequantizes only its LOCAL
        tokens (Pallas: in-flight inside the kernel; chunked: the local
        slice) -- the int8/fp8 x sp composition multiplies per-chip
        keyframe capacity (SURVEY §5.7's two capacity levers together).
    Returns [B, G, N, H, Dh] replicated.
    """
    from must3r_tpu.ops.attention import _ca_chunked, _ca_pallas, \
        _default_impl

    b, g, n, h, dh = q.shape
    s_loc = kv.shape[2] // mesh.shape[axis]
    if q_self is None:
        q_self = jnp.full((b, g), -2, jnp.int32)
    if q_upper is None:
        q_upper = jnp.full((b, g), INT32_MAX, jnp.int32)
    use = impl or _default_impl(dh)
    has_scl = kv_scale is not None

    def local(qv, kvv, lab, qs, qu, *scl):
        scl = scl[0] if has_scl else None
        if use == "pallas":
            # bound the KV loop at this shard's fill level; a shard past
            # the global fill runs zero blocks -> kernel would NaN on the
            # forced first block, so gate on fill > 0
            if kv_len is None:
                fill = jnp.int32(s_loc)
            else:
                start = jax.lax.axis_index(axis).astype(jnp.int32) * s_loc
                fill = jnp.clip(jnp.int32(kv_len) - start, 0, s_loc)

            def run(_):
                out, lse = _ca_pallas(qv, kvv[None], lab, qs, qu,
                                      jnp.maximum(fill, 1), jnp.int32(0),
                                      return_stats=True,
                                      kv_scales=(scl[None] if has_scl
                                                 else None))
                lse = lse[:, :, :, :n, :].transpose(0, 1, 3, 2, 4)
                return out, lse

            def empty(_):
                return (jnp.zeros((b, g, n, h, dh), qv.dtype),
                        jnp.full((b, g, n, h, 1), -1e30, jnp.float32))

            out_i, lse_i = jax.lax.cond(fill > 0, run, empty, None)
        else:
            kvl = kvv
            if has_scl:
                from must3r_tpu.memory import dequantize_kv
                kvl = dequantize_kv(kvv, scl, qv.dtype)
            k, v = jnp.split(kvl, 2, axis=-1)
            out_i, lse_i = _ca_chunked(qv, k, v, lab, qs, qu,
                                       return_stats=True)
        gm = jnp.maximum(jax.lax.pmax(lse_i, axis), -1e30)
        w = jnp.exp(lse_i - gm)                        # [B,G,N,H,1]
        den = jax.lax.psum(w, axis)
        num = jax.lax.psum(out_i.astype(jnp.float32) * w, axis)
        out = (num / jnp.maximum(den, 1e-30)).astype(qv.dtype)
        # replicated merged lse for a second-source combine outside
        lse = gm + jnp.log(jnp.maximum(den, 1e-30))
        return out, lse

    in_specs = [P(), P(None, None, axis, None), P(None, axis), P(), P()]
    args = [q, kv, labels, q_self, q_upper]
    if has_scl:
        in_specs.append(P(None, None, None, axis))
        args.append(kv_scale)
    # check_vma=False: pallas_call inside a vma-checked shard_map rejects
    # kernel-internal mixed-vma ops (dynamic_slice over scratch + varying
    # blocks) at trace/interpret time -- JAX's own message recommends this
    # switch. Replication of the outputs is guaranteed by the psum/pmax
    # combine above (every shard computes the identical merged value).
    out_s, lse_s = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    )(*args)
    if extra_kv is None:
        return out_s
    from must3r_tpu.ops.attention import _ca_chunked
    k_e, v_e = jnp.split(extra_kv, 2, axis=-1)
    out_e, lse_e = _ca_chunked(q, k_e, v_e, extra_labels, q_self, q_upper,
                               return_stats=True)
    m = jnp.maximum(jnp.maximum(lse_s, lse_e), -1e30)
    w_s = jnp.exp(lse_s - m)
    w_e = jnp.exp(lse_e - m)
    num = (out_s.astype(jnp.float32) * w_s + out_e.astype(jnp.float32) * w_e)
    return (num / jnp.maximum(w_s + w_e, 1e-30)).astype(q.dtype)


def shard_memory(mesh: Mesh, mem, axis: str = "sp"):
    """Place a MemoryState with its token axis sharded over `axis`.

    The capacity must divide the axis size; commits of new tokens into the
    sharded buffer go through :func:`sharded_window_write` (a plain
    dynamic_update_slice across shards would make GSPMD rewrite every
    local row)."""
    kv_sharding = NamedSharding(mesh, P(None, None, None, axis, None))
    lab_sharding = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    import dataclasses

    return dataclasses.replace(
        mem,
        kv=jax.device_put(mem.kv, kv_sharding),
        labels=jax.device_put(mem.labels, lab_sharding),
        length=jax.device_put(mem.length, rep),
        n_imgs=jax.device_put(mem.n_imgs, rep),
        protected_imgs=jax.device_put(mem.protected_imgs, rep),
        protected_tokens=jax.device_put(mem.protected_tokens, rep),
        kv_scale=(None if mem.kv_scale is None else jax.device_put(
            # [L, B, H, 2, S]: token axis 4 sharded like kv's axis 3
            mem.kv_scale, NamedSharding(
                mesh, P(None, None, None, None, axis)))))


def sharded_window_write(mesh: Mesh, buf, new, start, token_axis: int,
                         axis: str = "sp"):
    """Write `new` (replicated, length T on `token_axis`) into `buf`
    (sharded over `token_axis` along mesh `axis`) at dynamic global offset
    `start`, touching only an O(T) window per shard.

    GSPMD lowers a dynamic-start dynamic_update_slice on a sharded axis to
    a full-buffer rewrite on every shard (scripts/attr_sp2.py: 4.5x the
    unsharded append at serving shapes). Here each shard slices the one
    T-row window that can overlap the write range, merges `new` rows in by
    global position, and writes the window back in place -- no
    communication, no O(S_loc) traffic. Requires T <= S_loc; windows may
    straddle shard boundaries or miss a shard entirely (no-op there).
    """
    sp = mesh.shape[axis]
    s_cap = buf.shape[token_axis]
    t = new.shape[token_axis]
    s_loc = s_cap // sp
    assert s_cap % sp == 0 and t <= s_loc, (s_cap, sp, t)
    spec = P(*[axis if i == token_axis else None for i in range(buf.ndim)])
    bshape = [1] * buf.ndim
    bshape[token_axis] = t

    def local(bufl, newl, st):
        newl, st = (jax.lax.pcast(x, axis, to="varying")
                    for x in (newl, st))
        i = jax.lax.axis_index(axis).astype(jnp.int32)
        s0 = i * s_loc
        # one T-row window positioned to cover this shard's overlap with
        # [st, st+t): clamped into local bounds (proof in test)
        oc = jnp.clip(st - s0, 0, s_loc - t)
        cur = jax.lax.dynamic_slice_in_dim(bufl, oc, t, axis=token_axis)
        gpos = s0 + oc + jnp.arange(t, dtype=jnp.int32)
        sel = ((gpos >= st) & (gpos < st + t)).reshape(bshape)
        src = jnp.clip(gpos - st, 0, t - 1)
        rows = jnp.take(newl, src, axis=token_axis).astype(bufl.dtype)
        merged = jnp.where(sel, rows, cur)
        return jax.lax.dynamic_update_slice_in_dim(bufl, merged, oc,
                                                   axis=token_axis)

    return jax.shard_map(local, mesh=mesh, in_specs=(spec, P(), P()),
                         out_specs=spec)(buf, new,
                                         jnp.asarray(start, jnp.int32))
