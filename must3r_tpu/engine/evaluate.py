"""Evaluation: per-view pointmap regression metrics vs dataset GT.

Parity target: reference `eval.py` (:59-164): for each number of memory
views, run train-style inference over the eval loader, move GT to view-0's
camera frame, normalize pred/GT jointly and report per-view mean/median L21
distances (global and local pointmaps).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
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

    cap = round_capacity(num_mem_views * n, 512)
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


def evaluate(core: InferenceCore, loader,
             num_views_list: Sequence[int] = (2, 4),
             norm_mode: str = "?avg_dis", max_batches: Optional[int] = None,
             verbose: bool = True) -> Dict[str, Dict[str, float]]:
    """Returns {f'views{k}': {'l21_global_mean', 'l21_global_median',
    'l21_local_mean', 'l21_local_median'}}."""
    report = {}
    for k in num_views_list:
        per_view_g: List[np.ndarray] = []
        per_view_l: List[np.ndarray] = []
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            pred = _forward_views(core, batch, num_mem_views=min(
                k, batch["img"].shape[1]))
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
        if verbose:
            print(f"views={k}: {report[f'views{k}']}")
    return report
