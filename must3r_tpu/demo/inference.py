"""Offline/video demo drivers: keyframe selection + reconstruction + state.

Parity target: reference `must3r/demo/inference.py` --
  * `must3r_inference` (:109-241): load+bucket images, pick keyframes
    (linspace for ordered sequences, else ASMK similarity -> FPS anchors ->
    greedy max-similarity ordering), process keyframes-first with
    mem_batches [init, batch, ...], render everything, wrap in SceneState.
  * `must3r_inference_video` (:244-331): the streaming variant with
    SLAM-style or interval keyframe callbacks.
  * `SceneState` (:21-28): holds everything needed to re-threshold and
    re-export without re-running inference.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from must3r_tpu.engine.inference import (
    InferenceCore,
    offline_reconstruction,
    view_positions,
)
from must3r_tpu.engine.video import video_reconstruction
from must3r_tpu.retrieval.asmk import ASMK
from must3r_tpu.retrieval.graph import (
    farthest_point_sampling,
    greedy_keyframe_ordering,
)
from must3r_tpu.retrieval.model import RetrievalHead, identity_head
from must3r_tpu.slam.nns import get_searcher
from must3r_tpu.tools.image import denormalize_image


@dataclasses.dataclass
class SceneState:
    """Everything needed for post-hoc re-thresholding / export
    (reference demo/inference.py:21-28)."""
    pts3d: np.ndarray          # [V, H, W, 3]
    pts3d_local: np.ndarray    # [V, H, W, 3]
    conf: np.ndarray           # [V, H, W]
    imgs: np.ndarray           # [V, H, W, 3] uint8 RGB
    true_shape: np.ndarray     # [V, 2]
    focals: np.ndarray         # [V]
    cams2world: np.ndarray     # [V, 4, 4]
    image_list: List[str]


def select_keyframes(core: InferenceCore, x_tokens, num_mem_images: int,
                     head: Optional[RetrievalHead] = None,
                     codebook: Optional[np.ndarray] = None,
                     seed: int = 0) -> List[int]:
    """Retrieval-based keyframe selection + ordering
    (reference demo/inference.py:139-171): ASMK similarity over local
    encoder features, FPS anchors on 1-sim, then greedy ordering by
    similarity to the already-selected set."""
    n = len(x_tokens)          # views: list length or leading axis
    num_mem_images = min(num_mem_images, n)
    head = head or identity_head(np.shape(x_tokens[0])[-1])
    feats, ids = head.extract_local_features(x_tokens)
    if codebook is None:
        from must3r_tpu.retrieval.asmk import train_codebook
        codebook = train_codebook(feats, k=min(1024, max(64, 8 * n)))
    sim = ASMK(codebook).similarity_matrix(feats, ids)

    anchor_idx, _ = farthest_point_sampling(1.0 - sim, n=num_mem_images,
                                            seed=seed)
    sub = sim[np.ix_(anchor_idx, anchor_idx)]
    order = greedy_keyframe_ordering(sub)
    return [int(anchor_idx[k]) for k in order]


def must3r_inference(core: InferenceCore, views: Sequence[dict],
                     num_mem_images: int = 20, init_num_images: int = 2,
                     batch_num_views: int = 1, render_once: bool = False,
                     is_sequence: bool = False,
                     retrieval_head: Optional[RetrievalHead] = None,
                     codebook: Optional[np.ndarray] = None,
                     num_refinements_iterations: int = 0,
                     encode_bs: int = 8, render_bs: int = 8,
                     verbose: bool = False, on_update=None) -> SceneState:
    """Offline reconstruction of a (single-bucket) image collection.

    Args:
      views: list of dicts from tools.image.preprocess_image
        ('img' [H, W, 3] float normalized landscape, 'true_shape',
        'portrait', optional 'path').
    """
    v = len(views)
    num_mem_images = min(num_mem_images, v)
    imgs = jnp.asarray(np.stack([vw["img"] for vw in views]))
    portrait = jnp.asarray([bool(vw.get("portrait")) for vw in views])
    img_hw = imgs.shape[1:3]

    # -- keyframe selection ------------------------------------------------
    if is_sequence:
        keyframes = np.linspace(0, v - 1, num_mem_images).astype(int).tolist()
    else:
        pos = view_positions(img_hw, core.enc_cfg.patch_size, portrait,
                             batch_shape=(v,))
        x = core.encode_all(imgs, pos, max_bs=encode_bs)
        # tokens stay on device; only the selected local features are
        # fetched (the full token set is ~150 MB at 50 views)
        keyframes = select_keyframes(core, x, num_mem_images,
                                     retrieval_head, codebook)
    # defensive dedupe (order-preserving): a duplicated keyframe id would
    # make `order` longer than v and corrupt the unpermute below
    keyframes = list(dict.fromkeys(int(k) for k in keyframes))
    num_mem_images = len(keyframes)
    not_keyframes = sorted(set(range(v)) - set(keyframes))
    order = list(keyframes) + not_keyframes
    if verbose:
        print(f"keyframes: {keyframes}")

    # -- reconstruction (keyframes first) ------------------------------------
    imgs_o = imgs[jnp.asarray(order)]
    portrait_o = portrait[jnp.asarray(order)]
    # render_once in the reference reuses the memory views' first-pass
    # predictions; here every view is rendered against the final memory
    # (strictly more consistent, and the render phase is batched anyway)
    to_render = list(range(v))
    if on_update is not None:
        # offline_reconstruction reports ids in processing (keyframes-first)
        # order; surface original input-view ids to the caller's hook
        user_hook = on_update

        def on_update(ids, partial):     # noqa: F811
            user_hook([order[i] for i in ids], partial)

    out = offline_reconstruction(
        core, imgs_o, img_hw=img_hw, portrait=portrait_o,
        mem_views=list(range(num_mem_images)),
        init_num_images=init_num_images,
        num_refinement_iterations=num_refinements_iterations,
        to_render=to_render, render_bs=render_bs, encode_bs=encode_bs,
        compute_cam=True, on_update=on_update)

    # -- unpermute back to input order ---------------------------------------
    inv = np.argsort(np.asarray(order))

    def pick(a):
        a = np.asarray(a)
        return a[inv] if a.shape[0] == v else a

    rgbs = np.stack([denormalize_image(np.asarray(vw["img"]))
                     for vw in views])
    paths = [vw.get("path", str(i)) for i, vw in enumerate(views)]
    true_shape = np.asarray([vw["true_shape"] for vw in views])
    return SceneState(pts3d=pick(out["pts3d"]),
                      pts3d_local=pick(out["pts3d_local"]),
                      conf=pick(out["conf"]), imgs=rgbs,
                      true_shape=true_shape,
                      focals=pick(out["focal"]),
                      cams2world=pick(out["c2w"]), image_list=paths)


def slam_is_keyframe_fn(searcher_state, subsample: int = 4,
                        min_conf_keyframe: float = 1.5,
                        keyframe_overlap_thr: float = 0.15,
                        overlap_percentile: float = 70.0):
    """SLAM-style keyframe callback for the video driver
    (reference demo/inference.py:79-92)."""

    def fn(fid, res, state):
        conf = np.asarray(res["conf"])[::subsample, ::subsample]
        msk = conf > min_conf_keyframe
        if msk.sum() == 0 or state is None:
            return False
        pts = np.asarray(res["pts3d"])[::subsample, ::subsample][msk]
        cam = np.asarray(res["c2w"])[:3, 3]
        d = state.query(pts, cam_center=cam)
        depth = np.asarray(res["pts3d_local"])[::subsample, ::subsample,
                                               2][msk]
        d = d / (depth + 1e-9)
        d = np.where(np.isposinf(d), np.finfo(np.float32).max, d)
        return float(np.percentile(d, overlap_percentile)) \
            > keyframe_overlap_thr

    return fn


def slam_update_scene_state_fn(subsample: int = 4,
                               min_conf_keyframe: float = 1.5):
    """Insert a new keyframe's confident points into the overlap index
    (reference demo/inference.py:95-106)."""

    def fn(res, state):
        if state is None:
            state = get_searcher("kdtree-quadrant_x2")
        conf = np.asarray(res["conf"])[::subsample, ::subsample]
        msk = conf > min_conf_keyframe
        if msk.sum():
            pts = np.asarray(res["pts3d"])[::subsample, ::subsample][msk]
            cam = np.asarray(res["c2w"])[:3, 3]
            state.add_pts(pts, cam_center=cam)
        return state

    return fn


def must3r_inference_video(core: InferenceCore, views: Sequence[dict],
                           init_num_images: int = 2,
                           local_context_size: int = 25,
                           num_refinements_iterations: int = 0,
                           mode: str = "slam",
                           keyframe_interval: int = 3,
                           subsample: int = 4,
                           min_conf_keyframe: float = 1.5,
                           keyframe_overlap_thr: float = 0.15,
                           overlap_percentile: float = 70.0,
                           encode_bs: int = 8,
                           verbose: bool = False) -> SceneState:
    """Ordered-video reconstruction (reference demo/inference.py:244-331):
    'slam' mode uses overlap-based keyframes, 'interval' keeps every
    keyframe_interval-th frame."""
    v = len(views)
    imgs = jnp.asarray(np.stack([vw["img"] for vw in views]))
    portrait = jnp.asarray([bool(vw.get("portrait")) for vw in views])

    if mode == "slam":
        is_kf = slam_is_keyframe_fn(None, subsample, min_conf_keyframe,
                                    keyframe_overlap_thr,
                                    overlap_percentile)
        upd = slam_update_scene_state_fn(subsample, min_conf_keyframe)
        state = get_searcher("kdtree-quadrant_x2")
    else:
        is_kf = lambda fid, res, st: fid % keyframe_interval == 0  # noqa
        upd = lambda res, st: st                                    # noqa
        state = None

    out = video_reconstruction(
        core, imgs, img_hw=imgs.shape[1:3], portrait=portrait,
        init_num_images=init_num_images,
        local_context_size=local_context_size,
        num_refinement_iterations=num_refinements_iterations,
        is_keyframe_fn=is_kf, scene_state=state,
        scene_state_update_fn=upd, encode_bs=encode_bs, compute_cam=True)

    rgbs = np.stack([denormalize_image(np.asarray(vw["img"]))
                     for vw in views])
    paths = [vw.get("path", str(i)) for i, vw in enumerate(views)]
    true_shape = np.asarray([vw["true_shape"] for vw in views])
    return SceneState(pts3d=out["pts3d"], pts3d_local=out["pts3d_local"],
                      conf=out["conf"], imgs=rgbs, true_shape=true_shape,
                      focals=out["focal"], cams2world=out["c2w"],
                      image_list=paths)
