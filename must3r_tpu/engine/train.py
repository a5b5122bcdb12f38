"""Training engine: jitted multi-view train step + optimizer factory.

Parity target: reference `must3r/engine/train.py` --
  * forward = encoder -> causal memory-update loop over `mem_batches` ->
    render phase -> postprocess -> ConfLoss(Regr3D(L21)) over the concat of
    first-pass and rendered pointmaps (train.py:451-469).
  * encoder frozen unless `finetune_encoder` (train.py:461-465 parameter
    chain); `train_decoder_skip` first batches run without gradient
    (curriculum, inference.py:608-617).
  * AdamW betas (0.9, 0.95), no weight decay for 1D params (bias / norms),
    cosine schedule with warmup, lr = blr * eff_bs / 256
    (train.py:295-318, optimizer.py).

TPU-native: one jitted step; data parallelism comes from sharding the batch
over the mesh 'dp' axis (GSPMD inserts the gradient reductions -- replaces
DDP/NCCL). Memory token dropout is drawn with `jax.random` per step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.engine.losses import conf_regr3d_loss
from must3r_tpu.memory import init_memory, round_capacity
from must3r_tpu.models.decoder import decoder_head, decoder_render, decoder_update
from must3r_tpu.models.encoder import encoder_forward
from must3r_tpu.ops.dropout import permanent_dropout_masks, temporary_dropout_mask
from must3r_tpu.ops.geometry import apply_exp_to_norm


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    mem_batches: Tuple[int, ...] = (2, 1, 1)   # images per causal update step
    n_render: int = 2                          # rendered views per sample
    train_decoder_skip: int = 0                # no-grad prefix batches
    finetune_encoder: bool = False
    dropout_p: float = 0.0
    dropout_mode: str = "temporary"
    alpha: float = 0.2                         # ConfLoss alpha
    norm_mode: str = "?avg_dis"
    sky_loss_value: float = 2.0
    loss_in_log: bool = False
    capacity_block: int = 1024
    remat: bool = True
    dtype: str = "bfloat16"
    scan_steps: bool = False   # lax.scan over uniform update steps (below)


def cast_frozen_params(params, ts: TrainSettings):
    """Pre-cast the FROZEN encoder tower to the compute dtype.

    The step math is unchanged -- encoder weights were cast to ts.dtype
    inside every step anyway -- but holding the frozen tower in bf16
    removes a ~300M-param fp32->bf16 convert from each step (~2.5 ms at
    flagship sizes; the first ops in the round-3 step trace). No-op for
    fp32 parity mode or when the encoder is finetuned (the optimizer
    needs fp32 masters)."""
    dt = jnp.dtype(ts.dtype)
    if ts.finetune_encoder or dt == jnp.float32 or "encoder" not in params:
        return params
    enc = jax.tree.map(
        lambda x: x.astype(dt)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params["encoder"])
    return {**params, "encoder": enc}


def upcast_params_fp32(params):
    """Inverse of :func:`cast_frozen_params` for checkpoint writes: files
    always store fp32 (bf16 -> fp32 is exact), so checkpoints are
    byte-compatible across compute-dtype settings."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params)


def make_forward(enc_cfg: EncoderConfig, dec_cfg: DecoderConfig,
                 ts: TrainSettings, impl: Optional[str] = None):
    """Build the differentiable multi-view forward.

    batch dict:
      'img'        [B, V, H, W, 3] normalized images
      'pos'        [B, V, N, 2] patch positions
      'render_ids' [R] int32 indices of views to render (R = ts.n_render)

    Returns pred dict over the V_loss = (non-skipped memory views) + R views,
    ordered first-pass-then-rendered like the reference's `concat_preds`.
    """
    # attention is differentiable on every path: impl='pallas' runs the
    # TPU kernels forward with flash-backward kernels (custom VJP); token
    # dropout rides the kernels too (extra_mask -> _ca_hybrid_ext)
    dtype = jnp.dtype(ts.dtype)
    n_mem = sum(ts.mem_batches)
    n_skip = sum(ts.mem_batches[:ts.train_decoder_skip])

    def forward(params, batch, rng):
        imgs = batch["img"]
        pos = batch["pos"]
        b, v, h, w, _ = imgs.shape
        n = pos.shape[2]

        # compute dtype follows ts.dtype (bf16 production). The reference
        # forces the encoder to fp32 under CUDA AMP (encoder.py:46-52) for
        # fp16-overflow safety; TPU bf16 keeps the fp32 exponent range and
        # accumulates matmuls in fp32, and serving already runs the
        # encoder in bf16 -- training in bf16 matches the dtype the
        # weights will be used at. fp32 (ts.dtype) remains the parity mode.
        x = encoder_forward(params["encoder"], enc_cfg,
                            imgs.reshape(b * v, h, w, 3),
                            pos.reshape(b * v, n, 2), dtype=dtype,
                            remat=ts.remat and ts.finetune_encoder,
                            impl=impl)
        if not ts.finetune_encoder:
            x = jax.lax.stop_gradient(x)
        x = x.reshape(b, v, n, -1)

        cap = round_capacity(n_mem * n, ts.capacity_block)
        mem = init_memory(dec_cfg.depth, b, dec_cfg.num_heads,
                          dec_cfg.head_dim, cap, dtype=dtype)

        def step_masks(mem, g, sub):
            """(extra_mask, dead) for one update step's token dropout."""
            if ts.dropout_p <= 0.0:
                return None, None
            if ts.dropout_mode == "temporary":
                return temporary_dropout_mask(
                    sub, b, g, cap, ts.dropout_p, mem.protected_tokens), None
            # labels including this step's tokens, as decoder_update
            # will write them
            gidx = jnp.arange(g, dtype=jnp.int32)
            newlab = jnp.broadcast_to(
                (mem.n_imgs + gidx)[:, None], (g, n)).reshape(-1)
            lab = jax.vmap(lambda l0: jax.lax.dynamic_update_slice(
                l0, newlab, (mem.length,)))(mem.labels)
            return permanent_dropout_masks(
                sub, lab, mem.n_imgs, b, g, cap, ts.dropout_p,
                mem.protected_tokens)

        # Optional: run uniform schedules (equal causal blocks, no skip)
        # as ONE lax.scan over update steps. MEASURED SLOWER at the
        # flagship 224/20-view shape (161 vs 149 ms/step on hardware --
        # the loop boundary blocks XLA's cross-step fusion of the
        # backward's cotangent combines; see docs/PERF.md round 3), so
        # the unrolled path is the default. scan_steps=True remains
        # useful for LONG schedules (40+ views) where unrolled compile
        # time grows linearly but step compile is O(1). Note the scan
        # path draws per-step dropout keys as split(rng, n_steps) rather
        # than sequential splits -- a different (equally valid) stream.
        uniform = (ts.scan_steps
                   and len(ts.mem_batches) > 1
                   and len(set(ts.mem_batches)) == 1
                   and ts.train_decoder_skip == 0)
        if uniform:
            ns, g = len(ts.mem_batches), ts.mem_batches[0]
            xs = x[:, :n_mem].reshape(b, ns, g, n, x.shape[-1]).swapaxes(0, 1)
            ps = pos[:, :n_mem].reshape(b, ns, g, n, 2).swapaxes(0, 1)
            keys = jax.random.split(rng, ns)

            def step_body(mem, inp):
                xb, pb, sub = inp
                extra, dead = step_masks(mem, g, sub)
                mem, toks = decoder_update(params["decoder"], dec_cfg, mem,
                                           xb, pb, causal=True,
                                           extra_mask=extra, dtype=dtype,
                                           remat=ts.remat, impl=impl)
                if dead is not None:
                    mem = dataclasses.replace(
                        mem, labels=jnp.where(dead, -1, mem.labels))
                return mem, toks

            mem, toks_steps = jax.lax.scan(step_body, mem, (xs, ps, keys))
            toks_first = [toks_steps.swapaxes(0, 1).reshape(
                b, n_mem, n, toks_steps.shape[-1])]
        else:
            toks_first = []
            cursor = 0
            for i, g in enumerate(ts.mem_batches):
                xb = x[:, cursor:cursor + g]
                pb = pos[:, cursor:cursor + g]
                if ts.dropout_p > 0.0:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = rng
                extra, dead = step_masks(mem, g, sub)
                skipped = i < ts.train_decoder_skip
                mem, toks = decoder_update(params["decoder"], dec_cfg, mem,
                                           xb, pb, causal=True,
                                           extra_mask=extra, dtype=dtype,
                                           remat=ts.remat, impl=impl)
                if dead is not None:
                    mem = dataclasses.replace(
                        mem, labels=jnp.where(dead, -1, mem.labels))
                if skipped:
                    mem = jax.lax.stop_gradient(mem)
                else:
                    toks_first.append(toks)
                cursor += g

        first_ids = jnp.arange(n_skip, n_mem, dtype=jnp.int32)
        if ts.n_render > 0:
            render_ids = batch["render_ids"]
            xr = jnp.take(x, render_ids, axis=1)
            pr = jnp.take(pos, render_ids, axis=1)
            toks_r = decoder_render(params["decoder"], dec_cfg, mem, xr, pr,
                                    dtype=dtype, impl=impl)
            toks_all = jnp.concatenate(toks_first + [toks_r], axis=1)
            loss_ids = jnp.concatenate([first_ids,
                                        render_ids.astype(jnp.int32)])
        else:
            # disable_render (reference train.py:449): loss over the
            # first-pass (update) views only
            toks_all = jnp.concatenate(toks_first, axis=1)
            loss_ids = first_ids
        # portrait views predict at their true aspect then transpose back
        # (reference landscape_only head semantics)
        portrait = batch.get("portrait")
        pmask = (jnp.take(portrait, loss_ids, axis=1)
                 if portrait is not None else None)
        pm = decoder_head(params["decoder"], dec_cfg, toks_all, (h, w),
                          portrait_mask=pmask)

        pred = {
            "pts3d": apply_exp_to_norm(pm[..., :3]),
            "pts3d_local": apply_exp_to_norm(pm[..., 3:6]),
            "conf": 1.0 + jnp.exp(pm[..., 6]),
        }
        return pred, loss_ids

    return forward


def make_loss_fn(enc_cfg, dec_cfg, ts: TrainSettings,
                 impl: Optional[str] = None):
    forward = make_forward(enc_cfg, dec_cfg, ts, impl=impl)

    def loss_fn(params, batch, rng):
        pred, loss_ids = forward(params, batch, rng)
        gt = {
            "pts3d": jnp.take(batch["pts3d"], loss_ids, axis=1),
            "camera_pose": jnp.take(batch["camera_pose"], loss_ids, axis=1),
            "valid_mask": jnp.take(batch["valid_mask"], loss_ids, axis=1),
            "sky_mask": jnp.take(batch["sky_mask"], loss_ids, axis=1),
            "is_metric_scale": batch["is_metric_scale"],
        }
        return conf_regr3d_loss(gt, pred, alpha=ts.alpha,
                                norm_mode=ts.norm_mode,
                                sky_loss_value=ts.sky_loss_value,
                                loss_in_log=ts.loss_in_log)

    return loss_fn


# ---------------------------------------------------------------------------
# Optimizer (reference optimizer.py + train.py:295-318)
# ---------------------------------------------------------------------------

def cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                    min_lr: float = 0.0):
    warmup = max(warmup_steps, 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1), end_value=min_lr)


def _decay_mask(params):
    """timm rule: no weight decay for 1D params (biases, norms, embeds)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def scale_by_layer_decay(layer_decay: float):
    """timm-style layer-wise lr decay (reference optimizer.py:5-74):
    updates of transformer block l get layer_decay^(depth - l), the
    patch/feature embeddings get layer_decay^depth, heads/final norms 1.0.

    Works on the stacked-block layout: 'blocks' leaves are [L, ...] and get
    a per-layer factor broadcast over the leading axis."""

    def scale_tree(updates):
        def scale_module(mod):
            out = {}
            for k, v in mod.items():
                if k == "blocks":
                    depth = jax.tree.leaves(v)[0].shape[0]

                    def per_layer(x):
                        f = layer_decay ** (depth - jnp.arange(depth))
                        return x * f.reshape((depth,) + (1,) * (x.ndim - 1)
                                             ).astype(x.dtype)

                    out[k] = jax.tree.map(per_layer, v)
                elif k in ("patch_embed", "feat_embed", "image2_embed"):
                    depth = 1
                    for kk in mod:
                        if kk == "blocks":
                            depth = jax.tree.leaves(mod[kk])[0].shape[0]
                    out[k] = jax.tree.map(
                        lambda x: x * (layer_decay ** (depth + 1)), v)
                else:
                    out[k] = v
            return out

        return {name: scale_module(m) if isinstance(m, dict) else m
                for name, m in updates.items()}

    def update_fn(updates, state, params=None):
        del params
        return scale_tree(updates), state

    return optax.GradientTransformation(lambda p: optax.EmptyState(),
                                        update_fn)


def make_optimizer(lr_schedule, weight_decay: float = 0.05,
                   b1: float = 0.9, b2: float = 0.95,
                   grad_clip: Optional[float] = None,
                   layer_decay: Optional[float] = None):
    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2))
    txs.append(optax.add_decayed_weights(weight_decay, mask=_decay_mask))
    if layer_decay is not None and layer_decay != 1.0:
        txs.append(scale_by_layer_decay(layer_decay))
    txs.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*txs)


def effective_lr(blr: float, batch_size: int, n_devices: int = 1,
                 accum: int = 1) -> float:
    """lr = blr * eff_batch / 256 (reference train.py:295-298)."""
    return blr * (batch_size * n_devices * accum) / 256.0


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def trainable_subset(params, ts: TrainSettings):
    """The subtree the optimizer owns. With a frozen encoder only the
    decoder is differentiated and carried in opt_state -- the encoder
    gets no gradient buffer, no Adam moments and no update math (the
    torch reference likewise skips grad-less params)."""
    if ts.finetune_encoder:
        return params
    return {"decoder": params["decoder"]}


def make_train_step(enc_cfg, dec_cfg, ts: TrainSettings, optimizer,
                    impl: Optional[str] = None, donate: bool = True):
    """One SGD step. Shard batch['...'] leading axis over the mesh 'dp' axis
    and keep params replicated; jit + GSPMD handle the gradient psum.

    opt_state must be ``optimizer.init(trainable_subset(params, ts))``.
    """
    loss_fn = make_loss_fn(enc_cfg, dec_cfg, ts, impl=impl)

    def step(params, opt_state, batch, rng):
        if ts.finetune_encoder:
            train_p, frozen = params, {}
        else:
            train_p = {"decoder": params["decoder"]}
            frozen = {"encoder": params["encoder"]}

        def lf(tp):
            return loss_fn({**tp, **frozen}, batch, rng)

        (loss, details), grads = jax.value_and_grad(
            lf, has_aux=True)(train_p)
        updates, opt_state = optimizer.update(grads, opt_state, train_p)
        train_p = optax.apply_updates(train_p, updates)
        return {**train_p, **frozen}, opt_state, loss, details

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
