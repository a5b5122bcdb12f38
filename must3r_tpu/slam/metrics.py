"""Trajectory evaluation: Umeyama alignment, ATE-RMSE, RPE, scale error.

The reference reports TUM-RGBD / ETH3D SLAM results as ATE-RMSE after
Sim(3) alignment plus average scale error (BASELINE.md; the harness itself
is external to the reference repo). These are the standard definitions:

  * Umeyama: closed-form similarity (s, R, t) minimizing
    sum ||s R p_i + t - g_i||^2.
  * ATE-RMSE: RMSE of aligned position errors.
  * RPE: relative pose error over a fixed frame delta.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True
            ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Closed-form similarity transform src -> dst ([N, 3] each).

    Returns (s, R [3,3], t [3]) with dst ~= s * R @ src + t."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    u, d, vt = np.linalg.svd(cov)
    sgn = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        sgn[2, 2] = -1.0
    r = u @ sgn @ vt
    var_s = (xs ** 2).sum() / len(src)
    s = float((d * np.diag(sgn)).sum() / max(var_s, 1e-12)) \
        if with_scale else 1.0
    t = mu_d - s * r @ mu_s
    return s, r, t


def ate_rmse(pred_poses: np.ndarray, gt_poses: np.ndarray,
             align: str = "sim3") -> Dict[str, float]:
    """Absolute trajectory error between [N, 4, 4] c2w pose arrays.

    align: 'sim3' (scale+rigid, the SLAM-benchmark standard for
    monocular/up-to-scale methods), 'se3', or 'none'.

    Returns {'ate_rmse', 'ate_mean', 'ate_median', 'scale'}."""
    p = pred_poses[:, :3, 3]
    g = gt_poses[:, :3, 3]
    if align == "none":
        s, r, t = 1.0, np.eye(3), np.zeros(3)
    else:
        s, r, t = umeyama(p, g, with_scale=(align == "sim3"))
    err = np.linalg.norm((s * (p @ r.T) + t) - g, axis=-1)
    return {"ate_rmse": float(np.sqrt((err ** 2).mean())),
            "ate_mean": float(err.mean()),
            "ate_median": float(np.median(err)),
            "scale": float(s)}


def scale_error(pred_poses: np.ndarray, gt_poses: np.ndarray) -> float:
    """|1 - s| of the Sim(3) alignment, in percent (reference
    'avg scale error' metric family)."""
    s, _, _ = umeyama(pred_poses[:, :3, 3], gt_poses[:, :3, 3])
    return float(abs(1.0 - s) * 100.0)


def rpe(pred_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1
        ) -> Dict[str, float]:
    """Relative pose error over frame gaps of `delta`.

    Returns translational RMSE and rotational RMSE (degrees)."""
    def rel(poses):
        a = np.linalg.inv(poses[:-delta]) @ poses[delta:]
        return a

    e = np.linalg.inv(rel(gt_poses)) @ rel(pred_poses)
    trans = np.linalg.norm(e[:, :3, 3], axis=-1)
    cos = np.clip((np.trace(e[:, :3, :3], axis1=1, axis2=2) - 1) / 2,
                  -1.0, 1.0)
    rot = np.degrees(np.arccos(cos))
    return {"rpe_trans_rmse": float(np.sqrt((trans ** 2).mean())),
            "rpe_rot_rmse_deg": float(np.sqrt((rot ** 2).mean()))}


def evaluate_trajectory(pred_poses: np.ndarray, gt_poses: np.ndarray,
                        timestamps_pred: Optional[np.ndarray] = None,
                        timestamps_gt: Optional[np.ndarray] = None,
                        delta: int = 1) -> Dict[str, float]:
    """Full report; trajectories are matched on timestamps when given."""
    if timestamps_pred is not None and timestamps_gt is not None:
        common, ip, ig = np.intersect1d(timestamps_pred, timestamps_gt,
                                        return_indices=True)
        pred_poses = pred_poses[ip]
        gt_poses = gt_poses[ig]
    out = ate_rmse(pred_poses, gt_poses)
    out["scale_error_pct"] = scale_error(pred_poses, gt_poses)
    if len(pred_poses) > delta:
        out.update(rpe(pred_poses, gt_poses, delta))
    return out
