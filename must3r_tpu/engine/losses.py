"""Training losses: Regr3D pointmap regression + self-calibrated ConfLoss.

Parity target: reference `must3r/engine/losses.py` (and the dust3r
`Criterion/L21/MultiLoss/Sum` bases it builds on):

  * GT pointmaps are expressed in view-0's camera frame (`geotrf` with
    inv(camera_pose[0]), losses.py:26-36).
  * Normalization '?avg_dis': predictions of non-metric-scale samples are
    normalized by their own average distance, metric-scale samples share the
    GT factor; GT is always normalized (losses.py:62-79).
  * Optional log-norm warp of both pred and GT (`loss_in_log`).
  * Sky pixels (sky & ~valid) are counted as valid but their per-pixel loss
    is forced to `sky_loss_value` (losses.py:90-121).
  * ConfLoss: sum over {global, local} of mean(loss*conf - alpha*log conf)
    over valid pixels (losses.py:153-186).

TPU-native: the reference's ragged boolean indexing becomes masked sums at
static shape; everything is differentiable and shard_map-friendly (means are
per-shard; the train step psums them).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from must3r_tpu.ops.geometry import apply_log_to_norm
from must3r_tpu.ops.pose import geotrf, inv_se3

_EPS = 1e-8


def l21(pred, gt):
    """dust3r L21: per-pixel Euclidean distance over the last axis."""
    return jnp.linalg.norm(pred - gt, axis=-1)


def _masked_mean(x, mask):
    num = jnp.sum(jnp.where(mask, x, 0.0))
    den = jnp.sum(mask)
    return num / jnp.maximum(den, 1.0)


def _joint_norm_factor(pts, valid, mode: str):
    """Average-distance normalization factor, joint over all views of a
    batch element. pts: [B, V, H, W, 3]; valid: [B, V, H, W].
    Returns [B, 1, 1, 1, 1]."""
    stat, dis = mode.split("_", 1)
    assert stat == "avg" and dis == "dis", f"unsupported norm mode {mode}"
    d = jnp.linalg.norm(jnp.where(valid[..., None], pts, 0.0), axis=-1)
    b = pts.shape[0]
    num = jnp.sum(d.reshape(b, -1), axis=-1)
    den = jnp.sum(valid.reshape(b, -1), axis=-1) + _EPS
    factor = jnp.clip(num / den, _EPS)
    return factor.reshape(b, 1, 1, 1, 1)


def regr3d_prepare(gt, pred, norm_mode: str = "?avg_dis",
                   dist_clip: Optional[float] = None):
    """Reference `Regr3D.get_all_pts3d`: frames, normalization, masks.

    Args:
      gt: dict with 'pts3d' [B,V,H,W,3] world-frame, 'camera_pose'
        [B,V,4,4] c2w, 'valid_mask' [B,V,H,W], 'sky_mask' [B,V,H,W],
        'is_metric_scale' [B].
      pred: dict with 'pts3d', optionally 'pts3d_local' (already activated).
    """
    w2c = inv_se3(gt["camera_pose"])
    b, v, h, w, _ = gt["pts3d"].shape
    flat = gt["pts3d"].reshape(b, v, h * w, 3)
    gt_local = geotrf(w2c, flat).reshape(b, v, h, w, 3)
    gt_global = geotrf(w2c[:, :1], flat.reshape(b, 1, v * h * w, 3)
                       ).reshape(b, v, h, w, 3)

    valid = gt["valid_mask"]
    if dist_clip is not None:
        valid_g = valid & (jnp.linalg.norm(gt_global, axis=-1) <= dist_clip)
        valid_l = valid & (jnp.linalg.norm(gt_local, axis=-1) <= dist_clip)
    else:
        valid_g = valid
        valid_l = valid

    norm_all = not norm_mode.startswith("?")
    mode = norm_mode.lstrip("?")

    pr = pred["pts3d"]
    pr_local = pred.get("pts3d_local")

    gt_factor = _joint_norm_factor(gt_global, valid, mode)
    pr_factor = _joint_norm_factor(pr, valid, mode)
    if not norm_all:
        # metric-scale samples share the GT factor
        metric = gt["is_metric_scale"].reshape(b, 1, 1, 1, 1)
        pr_factor = jnp.where(metric, gt_factor, pr_factor)

    gt_global = gt_global / gt_factor
    gt_local = gt_local / gt_factor
    pr = pr / pr_factor
    if pr_local is not None:
        pr_local = pr_local / pr_factor

    sky = gt["sky_mask"]
    sky_g = sky & (~valid_g)
    sky_l = sky & (~valid_l)
    return dict(gt_g=gt_global, gt_l=gt_local, pr_g=pr, pr_l=pr_local,
                valid_g=valid_g, valid_l=valid_l, sky_g=sky_g, sky_l=sky_l)


def conf_regr3d_loss(gt, pred, alpha: float = 0.2,
                     norm_mode: str = "?avg_dis",
                     sky_loss_value: float = 2.0, loss_in_log: bool = False,
                     dist_clip: Optional[float] = None):
    """ConfLoss(Regr3D(L21)) -- the reference training criterion
    (train.py:468). Returns (scalar loss, details dict of jnp scalars)."""
    t = regr3d_prepare(gt, pred, norm_mode, dist_clip)

    gt_g, pr_g = t["gt_g"], t["pr_g"]
    if loss_in_log:
        gt_g = apply_log_to_norm(gt_g)
        pr_g = apply_log_to_norm(pr_g)
    loss_g = l21(pr_g, gt_g)
    mask_g = t["valid_g"]
    if sky_loss_value > 0:
        loss_g = jnp.where(t["sky_g"], sky_loss_value, loss_g)
        mask_g = mask_g | t["sky_g"]

    details = {"Regr3D_pts3d": _masked_mean(loss_g, mask_g)}

    loss_l = None
    mask_l = None
    if t["pr_l"] is not None:
        gt_l, pr_l = t["gt_l"], t["pr_l"]
        if loss_in_log:
            gt_l = apply_log_to_norm(gt_l)
            pr_l = apply_log_to_norm(pr_l)
        loss_l = l21(pr_l, gt_l)
        mask_l = t["valid_l"]
        if sky_loss_value > 0:
            loss_l = jnp.where(t["sky_l"], sky_loss_value, loss_l)
            mask_l = mask_l | t["sky_l"]
        details["Regr3D_pts3d_local"] = _masked_mean(loss_l, mask_l)

    conf = pred.get("conf")
    if conf is None:
        total = details["Regr3D_pts3d"]
        if loss_l is not None:
            total = total + details["Regr3D_pts3d_local"]
        return total, details

    log_conf = jnp.log(jnp.clip(conf, _EPS))
    conf_loss_g = _masked_mean(loss_g * conf - alpha * log_conf, mask_g)
    details["conf_loss_g"] = conf_loss_g
    total = conf_loss_g
    if loss_l is not None:
        conf_loss_l = _masked_mean(loss_l * conf - alpha * log_conf, mask_l)
        details["conf_loss_l"] = conf_loss_l
        total = total + conf_loss_l
    return total, details
