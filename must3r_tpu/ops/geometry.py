"""Pointcloud norm warps and normalization as pure jnp functions.

Behavioral parity with ``/root/reference/must3r/tools/geometry.py:7-84``:
log/exp radial warps and joint pointcloud normalization used by the losses
and the output head activation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def apply_log_to_norm(xyz, axis: int = -1):
    """Radially warp points: keep direction, distance d -> log1p(d)."""
    d = jnp.linalg.norm(xyz, axis=axis, keepdims=True)
    return xyz / jnp.clip(d, _EPS) * jnp.log1p(d)


def apply_exp_to_norm(xyz, axis: int = -1):
    """Inverse of :func:`apply_log_to_norm`: distance d -> expm1(d).

    This is the NORM_EXP pointmap activation
    (reference: must3r/model/blocks/head.py:8-21)."""
    d = jnp.linalg.norm(xyz, axis=axis, keepdims=True)
    return xyz / jnp.clip(d, _EPS) * jnp.expm1(d)


def normalize_pointcloud(pts1, pts2=None, norm_mode: str = "avg_dis",
                         valid1=None, valid2=None, ret_factor: bool = False):
    """Jointly normalize one or two pointmaps by a scale statistic.

    Args:
      pts1: [..., H, W, 3]; pts2: optional [..., H, W, 3].
      norm_mode: '<stat>_<dis>', stat in {avg, median, sqrt},
        dis in {dis, log1p, warp-log1p} (warp only with 'avg').
      valid1/valid2: optional bool [..., H, W] masks of valid pixels.

    Returns pts1/factor (and pts2/factor), optionally the factor
    [..., 1, 1, 1]. Matches reference semantics incl. the avg denominator
    over valid counts.
    """
    stat, dis_mode = norm_mode.split("_", 1)
    lead = pts1.shape[:-3]

    def flat(p):
        return p.reshape(*lead, -1, 3)

    def flatmask(v, p):
        if v is None:
            return jnp.ones(p.reshape(*lead, -1, 3).shape[:-1], dtype=bool)
        return v.reshape(*lead, -1)

    p1 = flat(pts1)
    m1 = flatmask(valid1, pts1)
    if pts2 is not None:
        p2 = flat(pts2)
        m2 = flatmask(valid2, pts2)
        all_pts = jnp.concatenate([p1, p2], axis=-2)
        all_m = jnp.concatenate([m1, m2], axis=-1)
    else:
        all_pts = p1
        all_m = m1

    all_pts = jnp.where(all_m[..., None], all_pts, 0.0)
    all_dis = jnp.linalg.norm(all_pts, axis=-1)

    if stat == "avg":
        if dis_mode == "log1p":
            all_dis = jnp.log1p(all_dis)
        elif dis_mode == "warp-log1p":
            log_dis = jnp.log1p(all_dis)
            warp = log_dis / jnp.clip(all_dis, _EPS)
            n1 = p1.shape[-2]
            pts1 = pts1 * warp[..., :n1].reshape(*pts1.shape[:-1], 1)
            if pts2 is not None:
                pts2 = pts2 * warp[..., n1:].reshape(*pts2.shape[:-1], 1)
            all_dis = log_dis
        elif dis_mode != "dis":
            raise ValueError(f"bad dis_mode {dis_mode!r}")
        nnz = jnp.sum(all_m, axis=-1)
        factor = jnp.sum(jnp.where(all_m, all_dis, 0.0), axis=-1) / (nnz + _EPS)
    elif stat == "median":
        big = jnp.where(all_m, all_dis, jnp.nan)
        # reference detaches the median factor (tools/geometry.py:66)
        factor = jax.lax.stop_gradient(jnp.nanmedian(big, axis=-1))
    elif stat == "sqrt":
        nnz = jnp.sum(all_m, axis=-1)
        factor = (jnp.sum(jnp.where(all_m, jnp.sqrt(all_dis), 0.0), axis=-1)
                  / (nnz + _EPS)) ** 2
    else:
        raise ValueError(f"bad norm stat {stat!r}")

    factor = jnp.clip(factor, _EPS)
    factor = factor.reshape(*lead, 1, 1, 1)

    res1 = pts1 / factor
    out = (res1,)
    if pts2 is not None:
        out = out + (pts2 / factor,)
    if ret_factor:
        out = out + (factor,)
    return out if len(out) > 1 else out[0]
