"""MUSt3R memory decoder as pure functions over a fixed-capacity memory.

Parity target: reference `must3r/model/decoder.py` (`MUSt3R` inference
semantics and `CausalMUSt3R` training semantics). Key behavioral contracts
reproduced here (all verified against the reference source):

  * Layer l's new memory tokens are the activations *entering* layer l
    (decoder.py:304-306): `prepare_y(x)` is appended before the block runs.
  * During the step's own attention, memory holds `prepare_y(raw)`;
    afterwards, the feedback offset (an MLP of the LAST layer's raw new
    tokens) is added to every EARLIER layer's raw tokens and `prepare_y`
    re-runs for storage (decoder.py:323-330, feedback_mechanism.py:39-53).
  * `image2_embed` is added to every image except image 0 of a fresh
    memory (decoder.py:280-287).
  * Update masking: an image never attends its own tokens, except a
    single-image initialization (decoder.py:293-298). Causal training
    restricts to strictly-earlier labels, with the init exception that
    image 0 may attend itself and image 1 (decoder.py:394-400).
  * Render: memory is read-only; no masks beyond slot validity
    (decoder.py:215-216,253).

TPU-first: the reference's dynamic concat/boolean-mask memory becomes
masked writes into the preallocated `MemoryState` (see memory.py); the
12 blocks run under `lax.scan` with the memory buffer as loop carry so XLA
updates it in place in HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from must3r_tpu.config import DecoderConfig, FeedbackType
from must3r_tpu.memory import (INT32_MAX, MemoryState, commit_images,
                               quantize_kv)
from must3r_tpu.models.layers import (
    cross_attn,
    decoder_block,
    decoder_block_post_ca,
    decoder_block_pre_ca,
    init_decoder_block,
    init_layer_norm,
    init_linear,
    init_mlp,
    layer_norm,
    linear,
    mlp,
    prepare_kv,
    self_attn,
)
from must3r_tpu.ops.attention import memory_cross_attention
from must3r_tpu.ops.patch import unpatchify
from must3r_tpu.ops.rope import make_rope_tables


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_decoder(key, cfg: DecoderConfig):
    ks = jax.random.split(key, 5)
    blocks = [init_decoder_block(k, cfg.embed_dim, cfg.num_heads,
                                 cfg.mlp_ratio)
              for k in jax.random.split(ks[0], cfg.depth)]
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "feat_embed": init_linear(ks[1], cfg.enc_embed_dim, cfg.embed_dim),
        "image2_embed": 0.02 * jax.random.normal(
            ks[2], (cfg.embed_dim,), jnp.float32),
        "blocks": blocks,
        "norm_dec": init_layer_norm(cfg.embed_dim),
        "head_proj": init_linear(ks[3], cfg.embed_dim, cfg.output_dim),
    }
    if cfg.feedback == FeedbackType.SINGLE_MLP:
        # zero-init output so feedback starts inactive (reference :26-36)
        params["feedback_norm"] = init_layer_norm(cfg.embed_dim)
        params["feedback"] = init_mlp(ks[4], cfg.embed_dim,
                                      4 * cfg.embed_dim, zero_out=True)
    elif cfg.feedback == FeedbackType.SINGLE_LINEAR:
        params["feedback_norm"] = init_layer_norm(cfg.embed_dim)
        params["feedback"] = init_linear(ks[4], cfg.embed_dim, cfg.embed_dim,
                                         zero=True)
    return params


def _block_slice(blocks, sl):
    return jax.tree.map(lambda a: a[sl], blocks)


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------

def _embed(params, cfg: DecoderConfig, x_enc, n_imgs, is_update: bool,
           dtype):
    """Project encoder tokens to decoder width and add image2_embed
    per the reference's first-image rule."""
    b, g, n, _ = x_enc.shape
    x = linear(params["feat_embed"], x_enc.astype(dtype))
    gidx = jnp.arange(g)
    if is_update:
        # at init (n_imgs==0) image 0 gets no image2_embed
        add = jnp.where((n_imgs == 0) & (gidx == 0), 0.0, 1.0)
    else:
        add = jnp.ones((g,), jnp.float32)
    emb = params["image2_embed"].astype(dtype)
    return x + emb * add[None, :, None, None].astype(dtype)


def _rope(cfg: DecoderConfig, pos):
    return make_rope_tables(pos, cfg.head_dim, base=cfg.rope.base,
                            f0=cfg.rope.f0, dtype=jnp.float32)


def _update_masks(cfg, n_imgs, g: int, causal: bool):
    """Per-image (q_self, q_upper) vectors encoding the reference's update
    attention rules -- see module docstring."""
    gidx = jnp.arange(g, dtype=jnp.int32)
    own = n_imgs.astype(jnp.int32) + gidx                  # [G]
    is_init = n_imgs == 0
    if not causal:
        no_mask = is_init & (g == 1)
        q_self = jnp.where(no_mask, -2, own)
        q_upper = jnp.full((g,), INT32_MAX, jnp.int32)
    else:
        q_self = own
        q_upper = own
        if g > 1:
            # init exception: image 0 attends itself and image 1
            first = is_init & (gidx == 0)
            q_self = jnp.where(first, -2, q_self)
            q_upper = jnp.where(first, 2, q_upper)
        else:
            no_mask = is_init
            q_self = jnp.where(no_mask, -2, q_self)
            q_upper = jnp.where(no_mask, INT32_MAX, q_upper)
    return q_self, q_upper


def _write_step_kv(kv_l, scale_l, new_kv, start):
    """Write one step's prepared tokens into a per-layer cache slice
    ([B, H, S, 2*Dh]), quantizing on entry when the cache stores 8-bit
    (scale_l [B, H, 2, S] given). Returns (kv_att, scale_att, new_q, new_s)
    -- the attention-visible cache plus the (possibly quantized) values to
    persist."""
    if scale_l is None:
        new_q = new_kv.astype(kv_l.dtype)
        kv_att = jax.lax.dynamic_update_slice(kv_l, new_q, (0, 0, start, 0))
        return kv_att, None, new_q, None
    new_q, new_s = quantize_kv(new_kv, kv_l.dtype)
    kv_att = jax.lax.dynamic_update_slice(kv_l, new_q, (0, 0, start, 0))
    scale_att = jax.lax.dynamic_update_slice(scale_l, new_s,
                                             (0, 0, 0, start))
    return kv_att, scale_att, new_q, new_s


# ---------------------------------------------------------------------------
# Update (memory write) forward
# ---------------------------------------------------------------------------

def decoder_update(params, cfg: DecoderConfig, mem: MemoryState, x_enc, pos,
                   causal: Optional[bool] = None, extra_mask=None,
                   dtype=jnp.bfloat16, unroll_layers: bool = False,
                   remat: bool = False, impl: Optional[str] = None,
                   mesh=None) -> Tuple[MemoryState, jax.Array]:
    """One memory-update step over G images.

    Args:
      mem: current MemoryState (donate for in-place HBM update).
      x_enc: [B, G, N, Denc] encoder tokens.
      pos: [B, G, N, 2] patch positions.
      causal: label-causal training semantics (CausalMUSt3R); defaults to
        cfg.causal.
      extra_mask: optional bool [B, G, S] dropout mask (True = blocked).
      mesh: optional Mesh sharding the memory token axis over 'sp'
        (sharded serving, SURVEY §5.7).

    Returns:
      (new MemoryState, final-layer tokens [B, G, N, D] pre-head).
    """
    causal = cfg.causal if causal is None else causal
    b, g, n, _ = x_enc.shape
    depth = cfg.depth
    x = _embed(params, cfg, x_enc, mem.n_imgs, True, dtype)
    rope = _rope(cfg, pos)

    start = mem.length
    t_new = g * n
    kv_len = start + t_new

    # labels for the new tokens, appended up-front so the in-step attention
    # sees them (reference concatenates old+new memory per layer). Under an
    # 'sp' mesh the new tokens+labels are NOT written into the sharded
    # buffers mid-step at all: they ride the CA as a replicated second
    # source (extra_kv) and are committed once at the end with an O(t)
    # windowed write -- a dynamic-start update on the sharded token axis
    # would make GSPMD rewrite every shard's full buffer per layer
    # (scripts/attr_sp2.py).
    gidx = jnp.arange(g, dtype=jnp.int32)
    new_labels = jnp.broadcast_to(
        (mem.n_imgs.astype(jnp.int32) + gidx)[:, None], (g, n)).reshape(-1)
    new_labels = jnp.broadcast_to(new_labels[None], (b, t_new))
    if mesh is None:
        labels = jax.vmap(
            lambda lab, nl: jax.lax.dynamic_update_slice(lab, nl, (start,)))(
            mem.labels, new_labels)
        ca_kv_len = kv_len
        extra_labels = None
    else:
        labels = mem.labels          # old tokens only; bound by ca_kv_len
        ca_kv_len = start
        extra_labels = new_labels

    q_self, q_upper = _update_masks(cfg, mem.n_imgs, g, causal)
    q_self = jnp.broadcast_to(q_self[None], (b, g))
    q_upper = jnp.broadcast_to(q_upper[None], (b, g))

    # The layer scan carries ONLY x. The full KV cache enters as scan xs
    # (per-layer slices, no copy) and the per-layer new tokens come back
    # as stacked ys, written into the cache with ONE dynamic_update_slice
    # after the scan. Carrying the whole [L, B, H, S, 2Dh] buffer instead
    # (the round-1/2 design) made jax.checkpoint save it once PER LAYER
    # for the backward (~1.8 GB of HBM traffic per update step at
    # flagship training shapes) and was the main cause of the ~12%
    # training MFU (VERDICT r2; docs/PERF.md round-3 trace).
    quantized = mem.kv_scale is not None
    if remat and mesh is None:
        assert not quantized, "quantized cache: serving paths only"
        # Rematerialize the projections/MLP but keep the flash-CA kernel
        # OUTSIDE the remat region: with the whole block checkpointed,
        # the backward re-ran the exp-bound CA forward kernel per
        # (layer, step) just to rebuild its custom-VJP residuals
        # (kv_att, lse, out), tripling the kernel's softmax work. Saving
        # those residuals instead costs ~20 MB/layer of HBM at flagship
        # training shapes and removes the whole re-run.
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat == "dots" else None)

        def pre(blk, x):
            raw = x.reshape(b, t_new, cfg.embed_dim)
            new_kv = prepare_kv(blk, raw, cfg.num_heads, cfg.ln_eps)
            x1, qh = decoder_block_pre_ca(blk, x, rope,
                                          num_heads=cfg.num_heads,
                                          ln_eps=cfg.ln_eps, impl=impl)
            return raw, new_kv, x1, qh

        def post(blk, x1, o):
            return decoder_block_post_ca(blk, x1, o, ln_eps=cfg.ln_eps)

        pre = jax.checkpoint(pre, policy=policy)
        post = jax.checkpoint(post, policy=policy)

        def body(x, inp):
            blk, kv_l, scale_l, li = inp
            raw, new_kv, x1, qh = pre(blk, x)
            kv_att = jax.lax.dynamic_update_slice(
                kv_l, new_kv.astype(kv_l.dtype), (0, 0, start, 0))
            o = memory_cross_attention(qh, kv_att, labels, q_self=q_self,
                                       q_upper=q_upper, kv_len=kv_len,
                                       extra_mask=extra_mask, layer=None,
                                       impl=impl)
            x = post(blk, x1, o)
            return x, (raw, new_kv, None)
    else:
        def body(x, inp):
            blk, kv_l, scale_l, li = inp
            raw = x.reshape(b, t_new, cfg.embed_dim)
            new_kv = prepare_kv(blk, raw, cfg.num_heads, cfg.ln_eps)
            if mesh is None:
                kv_att, scale_att, new_q, new_s = _write_step_kv(
                    kv_l, scale_l, new_kv, start)
                extra = None
            else:
                # sharded: attend new tokens as a replicated side source
                # (full-precision -- only the committed copy is quantized)
                kv_att, scale_att = kv_l, scale_l
                if quantized:
                    new_q, new_s = quantize_kv(new_kv, kv_l.dtype)
                else:
                    new_q, new_s = new_kv.astype(kv_l.dtype), None
                extra = new_kv
            x = decoder_block(blk, x, kv_att, rope, labels, q_self=q_self,
                              q_upper=q_upper, kv_len=ca_kv_len,
                              extra_mask=extra_mask, layer=None,
                              num_heads=cfg.num_heads, ln_eps=cfg.ln_eps,
                              impl=impl, mesh=mesh, kv_scale=scale_att,
                              extra_kv=extra, extra_labels=extra_labels)
            return x, (raw, new_q, new_s)

        if remat:
            assert not quantized, "quantized cache: serving paths only"
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if remat == "dots" else None)
            body = jax.checkpoint(body, policy=policy)

    if unroll_layers:
        # python-level layer loop (serving): reads DMA straight out of the
        # persistent HBM cache via the in-kernel layer index -- no
        # per-layer slice copies at all. Compile time grows ~depth x.
        kv_buf = mem.kv
        scale_buf = mem.kv_scale
        raws_l = []
        new_kvs_l = []
        new_ss_l = []
        for li in range(depth):
            blk = _block_slice(params["blocks"], li)
            raw = x.reshape(b, t_new, cfg.embed_dim)
            new_kv = prepare_kv(blk, raw, cfg.num_heads, cfg.ln_eps)
            extra = None
            if mesh is not None:
                # sharded: never write mid-step; new tokens ride the CA as
                # a replicated full-precision side source and commit once
                # after the loop (quantized there if the cache is 8-bit)
                extra = new_kv
                if quantized:
                    new_q, new_s = quantize_kv(new_kv, kv_buf.dtype)
                    new_kvs_l.append(new_q)
                    new_ss_l.append(new_s)
                else:
                    new_kvs_l.append(new_kv.astype(kv_buf.dtype))
            elif quantized:
                new_q, new_s = quantize_kv(new_kv, kv_buf.dtype)
                scale_buf = jax.lax.dynamic_update_slice(
                    scale_buf, new_s[None], (li, 0, 0, 0, start))
                kv_buf = jax.lax.dynamic_update_slice(
                    kv_buf, new_q[None], (li, 0, 0, start, 0))
            else:
                new_q = new_kv.astype(kv_buf.dtype)
                kv_buf = jax.lax.dynamic_update_slice(
                    kv_buf, new_q[None], (li, 0, 0, start, 0))
            x = decoder_block(blk, x, kv_buf, rope, labels, q_self=q_self,
                              q_upper=q_upper, kv_len=ca_kv_len,
                              extra_mask=extra_mask, layer=jnp.int32(li),
                              num_heads=cfg.num_heads, ln_eps=cfg.ln_eps,
                              impl=impl, mesh=mesh, kv_scale=scale_buf,
                              extra_kv=extra, extra_labels=extra_labels)
            raws_l.append(raw)
        raws = jnp.stack(raws_l)
        if mesh is not None:
            new_kvs = jnp.stack(new_kvs_l)
            kv_buf = None
            new_ss = jnp.stack(new_ss_l) if quantized else None
            if quantized:
                scale_buf = None
        else:
            new_kvs = None
            new_ss = None
    else:
        x, (raws, new_kvs, new_ss) = jax.lax.scan(
            body, x, (params["blocks"], mem.kv, mem.kv_scale,
                      jnp.arange(depth)))
        kv_buf = scale_buf = None

    if cfg.feedback != FeedbackType.NONE and "feedback" in params:
        offset = _feedback_offset(params, cfg, raws[-1])
        adj = raws[:-1] + offset[None]
        new_kv = jax.vmap(
            lambda blk, r: prepare_kv(blk, r, cfg.num_heads, cfg.ln_eps))(
            _block_slice(params["blocks"], slice(0, depth - 1)), adj)
        if quantized:
            new_q, new_s = quantize_kv(new_kv, mem.kv.dtype)
        else:
            new_q, new_s = new_kv, None
        if new_kvs is None:
            kv_buf = jax.lax.dynamic_update_slice(
                kv_buf, new_q.astype(kv_buf.dtype), (0, 0, 0, start, 0))
            if quantized:
                scale_buf = jax.lax.dynamic_update_slice(
                    scale_buf, new_s, (0, 0, 0, 0, start))
        else:
            new_kvs = jnp.concatenate(
                [new_q.astype(new_kvs.dtype), new_kvs[-1:]], axis=0)
            if quantized:
                new_ss = jnp.concatenate([new_s, new_ss[-1:]], axis=0)
    if kv_buf is None:
        if mesh is not None:
            from must3r_tpu.parallel.sharded_attention import (
                sharded_window_write,
            )
            kv_buf = sharded_window_write(
                mesh, mem.kv, new_kvs.astype(mem.kv.dtype), start,
                token_axis=3)
            labels = sharded_window_write(mesh, mem.labels, new_labels,
                                          start, token_axis=1)
        else:
            kv_buf = jax.lax.dynamic_update_slice(
                mem.kv, new_kvs.astype(mem.kv.dtype), (0, 0, 0, start, 0))
    if quantized and scale_buf is None:
        if mesh is not None:
            from must3r_tpu.parallel.sharded_attention import (
                sharded_window_write,
            )
            # [L, B, H, 2, S]: token axis 4 sharded like kv's axis 3
            scale_buf = sharded_window_write(mesh, mem.kv_scale, new_ss,
                                             start, token_axis=4)
        else:
            scale_buf = jax.lax.dynamic_update_slice(
                mem.kv_scale, new_ss, (0, 0, 0, 0, start))

    new_mem = MemoryState(kv=kv_buf, labels=labels, length=kv_len,
                          n_imgs=mem.n_imgs,
                          protected_imgs=mem.protected_imgs,
                          protected_tokens=mem.protected_tokens,
                          kv_scale=scale_buf if quantized else None)
    new_mem = commit_images(
        new_mem, g, tokens_per_img=n,
        protected_limit=cfg.protected_imgs if causal else None)
    return new_mem, x


def _feedback_offset(params, cfg: DecoderConfig, raw_last):
    """offset = feedback(LN(last layer's raw new tokens))."""
    h = layer_norm(params["feedback_norm"], raw_last, cfg.ln_eps)
    if cfg.feedback == FeedbackType.SINGLE_MLP:
        return mlp(params["feedback"], h)
    return linear(params["feedback"], h)


def decoder_refine(params, cfg: DecoderConfig, mem: MemoryState, x_enc, pos,
                   old_labels, dtype=jnp.bfloat16,
                   impl: Optional[str] = None,
                   mesh=None) -> Tuple[MemoryState, jax.Array]:
    """Refinement pass: re-run the update forward for already-seen images and
    overwrite their original memory tokens in place (reference
    `inference_multi_ar` refinement, engine/inference.py:425-443).

    During the forward, the image attends the full memory -- including its
    own OLD tokens (they carry a different label) -- exactly like the
    reference. Image label 0 is never refined (reference skips the ref img).

    Args:
      old_labels: [G] int32 original labels of these images.

    Returns: (memory with refreshed tokens, final-layer tokens).
    """
    b, g, n, _ = x_enc.shape
    start = mem.length
    # everything below reads only the POST-update state, so under jit with
    # a donated memory the whole refine is in-place (no buffer copy)
    mem2, toks = decoder_update(params, cfg, mem, x_enc, pos, causal=False,
                                dtype=dtype, impl=impl, mesh=mesh)
    new_kv = jax.lax.dynamic_slice(
        mem2.kv, (0, 0, 0, start, 0),
        (cfg.depth, b, cfg.num_heads, g * n, 2 * cfg.head_dim))
    new_scale = None
    if mem2.kv_scale is not None:
        new_scale = jax.lax.dynamic_slice(
            mem2.kv_scale, (0, 0, 0, 0, start),
            (cfg.depth, b, cfg.num_heads, 2, g * n))
    # labels outside the (about-to-be-truncated) extension are the originals
    old_region = jax.lax.broadcasted_iota(
        jnp.int32, mem2.labels.shape, 1) < start
    orig_labels = jnp.where(old_region, mem2.labels, -1)
    kv = mem2.kv
    scale = mem2.kv_scale
    old_labels = jnp.asarray(old_labels, jnp.int32)
    for gi in range(g):
        lab = old_labels[gi]
        hit = orig_labels[0] == lab
        pos0 = jnp.argmax(hit).astype(jnp.int32)
        blk = jax.lax.dynamic_slice(
            new_kv, (0, 0, 0, gi * n, 0),
            (cfg.depth, b, cfg.num_heads, n, 2 * cfg.head_dim))
        ok = (lab > 0) & jnp.any(hit)
        # when not refreshing, write back the existing values (cheap
        # block-level select; never materializes a second full buffer)
        existing = jax.lax.dynamic_slice(
            kv, (0, 0, 0, pos0, 0),
            (cfg.depth, b, cfg.num_heads, n, 2 * cfg.head_dim))
        blk = jnp.where(ok, blk, existing)
        kv = jax.lax.dynamic_update_slice(kv, blk, (0, 0, 0, pos0, 0))
        if scale is not None:
            sblk = jax.lax.dynamic_slice(
                new_scale, (0, 0, 0, 0, gi * n),
                (cfg.depth, b, cfg.num_heads, 2, n))
            sexist = jax.lax.dynamic_slice(
                scale, (0, 0, 0, 0, pos0),
                (cfg.depth, b, cfg.num_heads, 2, n))
            sblk = jnp.where(ok, sblk, sexist)
            scale = jax.lax.dynamic_update_slice(scale, sblk,
                                                 (0, 0, 0, 0, pos0))
    out = MemoryState(kv=kv, labels=orig_labels, length=start,
                      n_imgs=mem2.n_imgs - g,
                      protected_imgs=mem2.protected_imgs - g,
                      protected_tokens=start, kv_scale=scale)
    return out, toks


# ---------------------------------------------------------------------------
# Render (read-only) forward
# ---------------------------------------------------------------------------

def decoder_render(params, cfg: DecoderConfig, mem: MemoryState, x_enc, pos,
                   extra_mask=None, dtype=jnp.bfloat16,
                   impl: Optional[str] = None, mesh=None) -> jax.Array:
    """Pure prediction against a frozen memory (reference render=True).

    Returns final-layer tokens [B, G, N, D] (pre-head).
    """
    b, g, n, _ = x_enc.shape
    x = _embed(params, cfg, x_enc, mem.n_imgs, False, dtype)
    rope = _rope(cfg, pos)

    # render applies no per-image masks, so every view's queries see the
    # same KV set: fold G into the token axis for the cross-attention --
    # one big MXU dot per KV block instead of G small ones (SA stays
    # per-image). extra_mask (dropout) is per-image and keeps the G axis.
    flatten_g = extra_mask is None and g > 1

    def body(x, inp):
        blk, li = inp
        if flatten_g:
            xf = x.reshape(b * g, n, cfg.embed_dim)
            rope_f = (rope[0].reshape(b * g, *rope[0].shape[-3:]),
                      rope[1].reshape(b * g, *rope[1].shape[-3:]))
            sa = self_attn(blk["attn"],
                           layer_norm(blk["norm1"], xf, cfg.ln_eps),
                           rope=rope_f, num_heads=cfg.num_heads, impl=impl)
            x = x + sa.reshape(b, g, n, cfg.embed_dim)
            xg = x.reshape(b, 1, g * n, cfg.embed_dim)
            ca = cross_attn(blk, xg, mem.kv, mem.labels, kv_len=mem.length,
                            layer=li, num_heads=cfg.num_heads,
                            ln_eps=cfg.ln_eps, impl=impl, mesh=mesh,
                            kv_scale=mem.kv_scale)
            x = x + ca.reshape(b, g, n, cfg.embed_dim)
            x = x + mlp(blk["mlp"], layer_norm(blk["norm3"], x, cfg.ln_eps))
        else:
            x = decoder_block(blk, x, mem.kv, rope, mem.labels,
                              kv_len=mem.length, extra_mask=extra_mask,
                              layer=li, num_heads=cfg.num_heads,
                              ln_eps=cfg.ln_eps, impl=impl, mesh=mesh,
                              kv_scale=mem.kv_scale)
        return x, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], jnp.arange(cfg.depth)))
    return x


# ---------------------------------------------------------------------------
# Prediction head
# ---------------------------------------------------------------------------

def decoder_head(params, cfg: DecoderConfig, tokens, img_hw: Tuple[int, int],
                 portrait_mask=None) -> jax.Array:
    """LinearHead in an fp32 island (reference decoder.py:149-156):
    norm_dec -> Linear(D, P*P*C) -> pixel-shuffle unpatchify.

    Args:
      tokens: [B, G, N, D] final-layer decoder tokens.
      img_hw: static landscape (H, W) of this bucket.
      portrait_mask: optional bool [B, G]; True views were stored transposed
        and their prediction is computed in portrait then transposed back
        (reference head.py:24-60).

    Returns: [B, G, H, W, C] raw head output (activation applied in
    postprocess, reference engine/inference.py:16-27).
    """
    b, g, n, _ = tokens.shape
    h, w = img_hw
    t = layer_norm(params["norm_dec"], tokens.astype(jnp.float32),
                   cfg.ln_eps)
    # true-fp32 matmul: the head is the one matmul whose precision reaches
    # the pointmaps directly, and it is tiny next to the towers
    xf = linear(params["head_proj"], t,
                precision=jax.lax.Precision.HIGHEST
                ).reshape(b * g, n, cfg.output_dim)
    land = unpatchify(xf, cfg.patch_size, (h, w))
    if portrait_mask is not None and h != w:
        port = unpatchify(xf, cfg.patch_size, (w, h)).transpose(0, 2, 1, 3)
        sel = portrait_mask.reshape(b * g)[:, None, None, None]
        land = jnp.where(sel, port, land)
    c = land.shape[-1]
    return land.reshape(b, g, h, w, c)
