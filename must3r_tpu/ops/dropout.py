"""Memory token dropout as static-shape mask sampling.

Parity target: reference `must3r/model/blocks/dropout.py`.

  * Temporary mode (`TemporaryMemoryDropoutSelector`): for each image g in a
    causal batch, an independent Bernoulli(p) subset of the tokens that
    exist before g (minus the protected prefix) is masked for g's
    cross-attention only.
  * Permanent mode (`MemoryDropoutSelector`): tokens are dropped
    iteratively, once dropped they stay dropped for all later images and
    are removed from the returned memory.

The reference materializes per-step index lists; here both modes reduce to
a boolean ``extra_mask [B, G, S]`` fed to the CA kernel, plus (permanent) a
survivor mask to evict from the MemoryState. Label-causality already hides
tokens from the future, so sampling covers every non-protected slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def temporary_dropout_mask(key, batch: int, n_imgs_step: int, capacity: int,
                           p: float, protected_tokens) -> jax.Array:
    """Independent per-image drop mask (True = blocked).

    Returns bool [B, G, S]."""
    drop = jax.random.bernoulli(key, p, (batch, n_imgs_step, capacity))
    slot = jnp.arange(capacity)[None, None, :]
    return drop & (slot >= protected_tokens)


def permanent_dropout_masks(key, labels, n_imgs_base, batch: int,
                            n_imgs_step: int, capacity: int, p: float,
                            protected_tokens):
    """Iterative permanent dropout.

    A slot s becomes dead at step D(s) = first i >= appear(s) whose
    Bernoulli(p) fires, where appear(s) = step at which the token was
    created (0 for pre-existing memory). Image g is blocked from every slot
    already dead when it runs (D(s) < g -- the reference applies
    `not_sel[i]`, the cumulative drops after step i-1, to image i); slots
    with finite D are evicted afterwards.

    Args:
      labels: [B, S] current token labels INCLUDING the new tokens of this
        step (as produced inside decoder_update).
      n_imgs_base: image count before this step.

    Returns:
      (extra_mask bool [B, G, S], dead bool [B, S]).
    """
    g = n_imgs_step
    u = jax.random.bernoulli(key, p, (batch, g, capacity))   # step x slot
    appear = jnp.clip(labels - n_imgs_base, 0)               # [B, S]
    step = jnp.arange(g)[None, :, None]                      # [1, G, 1]
    eligible = step >= appear[:, None, :]
    fired = u & eligible                                     # [B, G, S]
    # D(s) = first firing step; INT if none
    big = jnp.int32(g + 1)
    first = jnp.min(jnp.where(fired, step, big), axis=1)     # [B, S]
    protected = jnp.arange(capacity)[None, :] < protected_tokens
    first = jnp.where(protected, big, first)
    extra_mask = first[:, None, :] < jnp.arange(g)[None, :, None]  # [B,G,S]
    dead = first < g
    return extra_mask, dead


def drop_path(key, x, rate: float, scale_by_keep: bool = True):
    """Stochastic depth on a residual branch (croco `DropPath`; imported by
    reference must3r/model/blocks/layers.py:7 — every published recipe
    trains with rate 0.0, so the identity fast path is the hot one).

    Drops the entire branch per leading-batch element; survivors are
    rescaled by 1/keep so the expectation is unchanged.
    """
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    branch = x / keep if scale_by_keep else x
    return jnp.where(mask, branch, jnp.zeros_like(x))
