"""Evaluation: per-view pointmap regression metrics vs dataset GT.

Parity target: reference `eval.py` (:59-164): for each number of memory
views, run train-style inference over the eval loader, move GT to view-0's
camera frame, normalize pred/GT jointly and report per-view mean/median L21
distances (global and local pointmaps).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from must3r_tpu.engine.inference import InferenceCore
from must3r_tpu.engine.losses import l21, regr3d_prepare
from must3r_tpu.memory import init_memory, round_capacity
from must3r_tpu.ops.geometry import apply_exp_to_norm


def _forward_views(core: InferenceCore, batch, num_mem_views: int,
                   init_num_images: int = 2):
    """Encode all views, build memory from the first num_mem_views, render
    everything. Returns pred dict [B, V, H, W, ...]."""
    imgs = jnp.asarray(batch["img"])
    pos = jnp.asarray(batch["pos"])
    b, v, h, w, _ = imgs.shape
    n = pos.shape[2]

    x = core.encode(imgs.reshape(b * v, h, w, 3), pos.reshape(b * v, n, 2))
    x = x.reshape(b, v, n, -1)

    cap = round_capacity(num_mem_views * n, 1024)
    mem = init_memory(core.dec_cfg.depth, b, core.dec_cfg.num_heads,
                      core.dec_cfg.head_dim, cap, dtype=core.dtype)
    g0 = min(init_num_images, num_mem_views)
    mem, _ = core._update(core.dec_params, mem, x[:, :g0], pos[:, :g0])
    for i in range(g0, num_mem_views):
        mem, _ = core._update(core.dec_params, mem, x[:, i:i + 1],
                              pos[:, i:i + 1])
    toks = core._render(core.dec_params, mem, x, pos)
    pm = core.head(toks, (h, w))
    return {
        "pts3d": apply_exp_to_norm(pm[..., :3].astype(jnp.float32)),
        "pts3d_local": apply_exp_to_norm(pm[..., 3:6].astype(jnp.float32)),
        "conf": 1.0 + jnp.exp(pm[..., 6].astype(jnp.float32)),
    }


def pose_metrics(pred_c2w: np.ndarray, gt_c2w: np.ndarray,
                 thresholds=(5, 15, 30)):
    """Multi-view relative pose accuracy (CO3D/RealEstate-style eval):
    for every ordered camera pair, the relative-rotation and
    relative-translation angular errors; reports RRA@t / RTA@t and
    AUC@30 of min(RRA, RTA) over thresholds 1..30 degrees.

    pred/gt: [V, 4, 4] c2w. Translation is compared by direction
    (up-to-scale), the standard protocol for monocular methods."""
    import itertools

    v = pred_c2w.shape[0]
    r_errs, t_errs = [], []
    for i, j in itertools.combinations(range(v), 2):
        def rel(poses):
            a = np.linalg.inv(poses[i]) @ poses[j]
            return a[:3, :3], a[:3, 3]

        rp, tp = rel(pred_c2w)
        rg, tg = rel(gt_c2w)
        dr = rp @ rg.T
        cos = np.clip((np.trace(dr) - 1) / 2, -1.0, 1.0)
        r_errs.append(np.degrees(np.arccos(cos)))
        np_, ng = np.linalg.norm(tp), np.linalg.norm(tg)
        if np_ < 1e-9 or ng < 1e-9:
            t_errs.append(0.0 if np_ < 1e-9 and ng < 1e-9 else 180.0)
        else:
            cost = np.clip(tp @ tg / (np_ * ng), -1.0, 1.0)
            t_errs.append(np.degrees(np.arccos(cost)))
    r_errs = np.asarray(r_errs)
    t_errs = np.asarray(t_errs)
    out = {}
    for t in thresholds:
        out[f"rra@{t}"] = float((r_errs < t).mean())
        out[f"rta@{t}"] = float((t_errs < t).mean())
    both = np.maximum(r_errs, t_errs)
    # AUC@30: mean over tau in 1..30 of accuracy at tau
    taus = np.arange(1, 31)
    acc = (both[None, :] < taus[:, None]).mean(axis=1)
    out["auc@30"] = float(acc.mean() * 100.0)
    return out


def depth_metrics(pred_depth: np.ndarray, gt_depth: np.ndarray,
                  valid: np.ndarray) -> Dict[str, float]:
    """Monocular-depth protocol (robust-MVD style): median-scale the
    prediction to GT, then abs-rel and inlier ratios.

    pred/gt: [H, W] (or broadcastable); valid: bool mask."""
    p = pred_depth[valid]
    g = gt_depth[valid]
    if len(p) == 0:
        return {"abs_rel": float("nan"), "inliers_1.03": 0.0,
                "delta_1.25": 0.0}
    scale = np.median(g) / max(np.median(p), 1e-9)
    p = p * scale
    abs_rel = float(np.mean(np.abs(p - g) / np.clip(g, 1e-9, None)))
    ratio = np.maximum(p / np.clip(g, 1e-9, None),
                       g / np.clip(p, 1e-9, None))
    # inliers@1.03 is the published robust-MVD headline
    # (reference assets/evals.md:53-74); delta_1.25 kept for mono-depth use
    return {"abs_rel": abs_rel,
            "inliers_1.03": float((ratio < 1.03).mean() * 100.0),
            "delta_1.25": float((ratio < 1.25).mean())}


def pnp_pose(pts3d: np.ndarray, conf: np.ndarray, focal: float,
             conf_thr: float = 0.0, max_points: int = 4096,
             reproj_err: float = 5.0) -> np.ndarray:
    """c2w by PnP-RANSAC between the pixel grid and the predicted GLOBAL
    pointmap — the published 'pnp' pose-protocol variant (reference
    assets/evals.md:138-191; the procrustes variant is postprocess's
    weighted rigid registration). Host-side, cv2-backed.

    pts3d: [H, W, 3] global pointmap; conf: [H, W]; focal: pixels
    (principal point at the image center, ops/pose.py convention).
    Returns [4, 4] c2w (identity on solver failure).
    """
    import cv2

    h, w = pts3d.shape[:2]
    pts = np.asarray(pts3d, np.float64).reshape(-1, 3)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    pix = np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float64)
    c = np.asarray(conf, np.float64).reshape(-1)
    # non-finite pointmap values (exp-activation overflow on degenerate
    # checkpoints) and a non-finite focal make cv2 raise; degrade to the
    # identity like the documented solver-failure contract instead
    finite = np.isfinite(pts).all(axis=1)
    if not np.isfinite(focal) or focal <= 0 or finite.sum() < 6:
        return np.eye(4)
    c = np.where(finite, c, -np.inf)
    keep = np.flatnonzero((c > conf_thr) & finite)
    if len(keep) < 6:
        keep = np.argsort(-c)[:min(int(finite.sum()), max(6, max_points))]
    if len(keep) > max_points:
        keep = keep[np.argsort(-c[keep])[:max_points]]
    kmat = np.array([[focal, 0.0, w / 2.0],
                     [0.0, focal, h / 2.0],
                     [0.0, 0.0, 1.0]])
    try:
        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            pts[keep], pix[keep], kmat, None, iterationsCount=100,
            reprojectionError=reproj_err, flags=cv2.SOLVEPNP_ITERATIVE)
    except cv2.error:
        return np.eye(4)
    if not ok:
        return np.eye(4)
    rot = cv2.Rodrigues(rvec)[0]           # world -> camera
    c2w = np.eye(4)
    c2w[:3, :3] = rot.T
    c2w[:3, 3] = (-rot.T @ tvec).ravel()
    return c2w


def evaluate(core: InferenceCore, loader,
             num_views_list: Sequence[int] = (2, 4),
             norm_mode: str = "?avg_dis", max_batches: Optional[int] = None,
             pose_eval: bool = False, depth_eval: bool = False,
             pose_mode: str = "procrustes",
             verbose: bool = True) -> Dict[str, Dict[str, float]]:
    """Returns {f'views{k}': {'l21_global_mean', 'l21_global_median',
    'l21_local_mean', 'l21_local_median'[, pose RRA/RTA/AUC]}}.

    pose_mode: 'procrustes' (weighted rigid local->global registration) or
    'pnp' (RANSAC PnP of the pixel grid against the global pointmap) --
    the two published pose-protocol variants."""
    from must3r_tpu.ops.pose import (estimate_focal_weiszfeld, make_c2w,
                                     rigid_points_registration)

    report = {}
    for k in num_views_list:
        per_view_g: List[np.ndarray] = []
        per_view_l: List[np.ndarray] = []
        pose_accs: List[Dict[str, float]] = []
        depth_accs: List[Dict[str, float]] = []
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            pred = _forward_views(core, batch, num_mem_views=min(
                k, batch["img"].shape[1]))
            if depth_eval:
                # predicted depth = z of the camera-frame pointmap; GT
                # depth from the dataset view pipeline
                pd = np.asarray(pred["pts3d_local"][..., 2])
                gd = np.asarray(batch["pts3d"])  # world pts; use depthmap
                gtd = np.asarray(batch.get("depthmap")) \
                    if "depthmap" in batch else None
                vm = np.asarray(batch["valid_mask"])
                if gtd is not None:
                    b, v = pd.shape[:2]
                    for e in range(b):
                        for vi in range(v):
                            depth_accs.append(depth_metrics(
                                pd[e, vi], gtd[e, vi], vm[e, vi]))
            if pose_eval:
                b, v = pred["pts3d"].shape[:2]
                if pose_mode == "pnp":
                    focals = np.asarray(estimate_focal_weiszfeld(
                        pred["pts3d_local"]))
                    pm = np.asarray(pred["pts3d"])
                    cf = np.asarray(pred["conf"])
                    c2w = np.stack([
                        np.stack([pnp_pose(pm[e, vi], cf[e, vi],
                                           float(focals[e, vi]))
                                  for vi in range(v)])
                        for e in range(b)])
                else:
                    r, t = rigid_points_registration(
                        pred["pts3d_local"].reshape(b, v, -1, 3),
                        pred["pts3d"].reshape(b, v, -1, 3),
                        weights=pred["conf"].reshape(b, v, -1) - 1.0)
                    c2w = np.asarray(make_c2w(r, t))
                gt_c2w = np.asarray(batch["camera_pose"])
                for e in range(b):
                    pose_accs.append(pose_metrics(c2w[e], gt_c2w[e]))
            gt = {
                "pts3d": jnp.asarray(batch["pts3d"]),
                "camera_pose": jnp.asarray(batch["camera_pose"]),
                "valid_mask": jnp.asarray(batch["valid_mask"]),
                "sky_mask": jnp.asarray(batch["sky_mask"]),
                "is_metric_scale": jnp.asarray(batch["is_metric_scale"]),
            }
            t = regr3d_prepare(gt, pred, norm_mode=norm_mode)
            d_g = np.asarray(l21(t["pr_g"], t["gt_g"]))
            d_l = np.asarray(l21(t["pr_l"], t["gt_l"]))
            m_g = np.asarray(t["valid_g"])
            m_l = np.asarray(t["valid_l"])
            b, v = d_g.shape[:2]
            for vi in range(v):
                msk = m_g[:, vi]
                if msk.any():
                    per_view_g.append(d_g[:, vi][msk])
                msk = m_l[:, vi]
                if msk.any():
                    per_view_l.append(d_l[:, vi][msk])
        flat_g = np.concatenate(per_view_g) if per_view_g else np.zeros(1)
        flat_l = np.concatenate(per_view_l) if per_view_l else np.zeros(1)
        report[f"views{k}"] = {
            "l21_global_mean": float(flat_g.mean()),
            "l21_global_median": float(np.median(flat_g)),
            "l21_local_mean": float(flat_l.mean()),
            "l21_local_median": float(np.median(flat_l)),
        }
        if pose_accs:
            keys = pose_accs[0].keys()
            report[f"views{k}"].update(
                {m: float(np.mean([p[m] for p in pose_accs]))
                 for m in keys})
        if depth_accs:
            for m in depth_accs[0]:
                vals = [d[m] for d in depth_accs if np.isfinite(d[m])]
                report[f"views{k}"][m] = float(np.mean(vals)) if vals \
                    else float("nan")
        if verbose:
            print(f"views={k}: {report[f'views{k}']}")
    return report


# ---------------------------------------------------------------------------
# 3D-reconstruction protocol: Accuracy / Completion / Normal Consistency
# (BASELINE.md first table; reference assets/evals.md:44-46 — the
# 7scenes/DTU/NRGBD numbers follow this cloud-to-cloud definition)
# ---------------------------------------------------------------------------

def pointmap_normals(pts: np.ndarray) -> np.ndarray:
    """Per-pixel surface normals of a structured pointmap [H, W, 3] via
    central-difference cross products, unit-normalized ([H, W, 3])."""
    p = np.asarray(pts, np.float64)
    du = np.gradient(p, axis=1)
    dv = np.gradient(p, axis=0)
    n = np.cross(du, dv)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.clip(norm, 1e-12, None)).astype(np.float32)


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = True) -> np.ndarray:
    """Sim(3) aligning src -> dst points [N, 3]; returns 4x4."""
    from must3r_tpu.slam.metrics import umeyama
    s, r, t = umeyama(src, dst, with_scale=with_scale)
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = s * r
    out[:3, 3] = t
    return out


def reconstruction_metrics(pred_pts: np.ndarray, gt_pts: np.ndarray,
                           pred_normals: Optional[np.ndarray] = None,
                           gt_normals: Optional[np.ndarray] = None,
                           max_points: int = 200_000,
                           seed: int = 0) -> Dict[str, float]:
    """Cloud-to-cloud reconstruction quality (assets/evals.md:44-46):

      Accuracy   = mean/median over pred points of distance to nearest GT
      Completion = mean/median over GT points of distance to nearest pred
      NC1 = mean |n_pred . n_gt(nn)| over pred points (and NC2 vice versa;
            NC = (NC1 + NC2) / 2) — computed when normals are given.

    Inputs are flat [N, 3] clouds (pre-aligned; see evaluate_reconstruction
    for the per-pixel-correspondence sim(3) alignment used upstream).
    """
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)

    def sub(x, nrm):
        x = x.reshape(-1, 3)
        nrm = None if nrm is None else nrm.reshape(-1, 3)
        if len(x) > max_points:
            sel = rng.choice(len(x), max_points, replace=False)
            x = x[sel]
            nrm = None if nrm is None else nrm[sel]
        return np.asarray(x, np.float32), nrm

    p, pn = sub(pred_pts, pred_normals)
    g, gn = sub(gt_pts, gt_normals)
    tp = cKDTree(p)
    tg = cKDTree(g)
    d_pg, i_pg = tg.query(p, k=1)
    d_gp, i_gp = tp.query(g, k=1)
    out = {
        "accuracy": float(d_pg.mean()),
        "accuracy_med": float(np.median(d_pg)),
        "completion": float(d_gp.mean()),
        "completion_med": float(np.median(d_gp)),
    }
    if pn is not None and gn is not None:
        nc1 = np.abs(np.sum(pn * gn[i_pg], axis=-1))
        nc2 = np.abs(np.sum(gn * pn[i_gp], axis=-1))
        out.update(nc1=float(nc1.mean()), nc2=float(nc2.mean()),
                   nc=float((nc1.mean() + nc2.mean()) / 2),
                   nc1_med=float(np.median(nc1)),
                   nc2_med=float(np.median(nc2)),
                   nc_med=float((np.median(nc1) + np.median(nc2)) / 2))
    return out


def evaluate_reconstruction(core: InferenceCore, loader,
                            num_mem_views: int = 4,
                            max_batches: Optional[int] = None,
                            conf_thr: float = 1.5,
                            verbose: bool = True) -> Dict[str, float]:
    """Acc/Comp/NC over an eval loader: reconstruct each sample's views,
    sim(3)-align predictions to GT via the per-pixel correspondence
    (MUSt3R output is up-to-scale), drop low-confidence pixels, and
    average the per-scene cloud metrics."""
    accs: List[Dict[str, float]] = []
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        pred = _forward_views(core, batch,
                              num_mem_views=min(num_mem_views,
                                                batch["img"].shape[1]))
        pp = np.asarray(pred["pts3d"], np.float32)        # [B, V, H, W, 3]
        conf = np.asarray(pred["conf"], np.float32)
        gt = np.asarray(batch["pts3d"], np.float32)
        valid = np.asarray(batch["valid_mask"])
        b = pp.shape[0]
        for e in range(b):
            keep = valid[e] & (conf[e] > conf_thr)
            if keep.sum() < 32:
                keep = valid[e]
            src = pp[e][keep].reshape(-1, 3)
            dst = gt[e][keep].reshape(-1, 3)
            t = umeyama_alignment(src, dst)
            pa = pp[e] @ t[:3, :3].T + t[:3, 3]
            pn = np.stack([pointmap_normals(pa[vi])
                           for vi in range(pa.shape[0])])
            gn = np.stack([pointmap_normals(gt[e][vi])
                           for vi in range(gt[e].shape[0])])
            accs.append(reconstruction_metrics(
                pa[keep], gt[e][valid[e]], pn[keep], gn[valid[e]]))
    report = {k: float(np.mean([a[k] for a in accs]))
              for k in accs[0]} if accs else {}
    if verbose and report:
        print("3D recon:", {k: round(v, 5) for k, v in report.items()})
    return report
