"""Streaming/video reconstruction driver with keyframe callbacks.

Parity target: reference `inference_video_multi_ar`
(`must3r/engine/inference.py:230-365`): frames stream through the memory
decoder; a pluggable `is_keyframe_fn` decides which stay; a deque of the
last `local_context_size` frames forms a working memory whose non-keyframes
are evicted as they fall out of the window; refinement passes revisit every
frame, updating keyframe tokens in place and relabeling transient ones; a
final sweep drops all non-keyframes.

TPU mapping: all reference memory edits (concat/remove/update/relabel)
become the masked MemoryState ops; eviction leaves holes (-1 labels) that
the CA kernel skips, and the buffer is compacted whenever live+new tokens
approach capacity.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from must3r_tpu.engine.inference import (
    InferenceCore,
    default_mem_batches,
    postprocess,
    view_positions,
)
from must3r_tpu.memory import (
    compact,
    evict_label,
    refresh_label_from_segment,
    relabel,
    set_n_imgs,
)


def video_reconstruction(core: InferenceCore, imgs, img_hw=None,
                         portrait=None, init_num_images: int = 2,
                         local_context_size: int = 25,
                         num_refinement_iterations: int = 0,
                         is_keyframe_fn: Optional[Callable] = None,
                         scene_state=None,
                         scene_state_update_fn: Optional[Callable] = None,
                         capacity_images: Optional[int] = None,
                         compute_cam: bool = True,
                         encode_bs: int = 8,
                         return_mem: bool = False):
    """Process an ordered frame sequence (single aspect bucket).

    Args:
      imgs: [V, H, W, 3] normalized frames in temporal order.
      is_keyframe_fn(frame_id, res_dict, scene_state) -> bool; default
        keeps every 3rd frame (reference default).
      scene_state_update_fn(res_dict, scene_state) -> scene_state, called
        when a frame becomes a keyframe.

    Returns dict of per-frame first-pass outputs (pts3d, pts3d_local, conf,
    focal, c2w) and optionally the final memory (non-keyframes dropped).
    """
    if is_keyframe_fn is None:
        is_keyframe_fn = lambda fid, res, state: (fid % 3 == 0)  # noqa: E731
    if scene_state_update_fn is None:
        scene_state_update_fn = lambda res, state: state          # noqa: E731

    v = imgs.shape[0]
    img_hw = tuple(img_hw) if img_hw is not None else tuple(imgs.shape[1:3])
    if portrait is None:
        portrait = jnp.zeros((v,), bool)
    portrait = jnp.asarray(portrait)
    p = core.dec_cfg.patch_size
    n_tok = (img_hw[0] // p) * (img_hw[1] // p)

    pos = view_positions(img_hw, core.enc_cfg.patch_size, portrait,
                         batch_shape=(v,))
    x = core.encode_all(imgs, pos, max_bs=encode_bs)

    cap_imgs = capacity_images or max(
        local_context_size + init_num_images + 4, v // 2 + 8)
    mem = core.new_memory(cap_imgs, img_hw)
    capacity = mem.capacity

    img_labels = {}
    keyframes = set()
    pointmaps = [None] * v
    batches = default_mem_batches(v, init_num_images)

    # host-side upper bound on mem.length (appends only grow it; compaction
    # resets it) -- avoids a device->host sync per batch
    length_bound = 0

    for _ in range(num_refinement_iterations + 1):
        working = deque()
        cursor = 0
        for bsize in batches:
            ids = list(range(cursor, cursor + bsize))
            cursor += bsize

            # compact when the tentative append might not fit
            if length_bound + bsize * n_tok > capacity:
                mem = compact(mem)
                length_bound = int(np.asarray(mem.length))
            length_bound += bsize * n_tok

            # ensure unique labels for this forward
            base_label = len(img_labels) if img_labels else 0
            mem = set_n_imgs(mem, base_label)
            seg0 = int(np.asarray(mem.length))   # first new segment start
            xb = x[jnp.asarray(ids)][None]
            pb = pos[jnp.asarray(ids)][None]
            mem, toks = core.update(mem, xb, pb)
            pm = core.head(toks, img_hw, portrait[jnp.asarray(ids)][None])
            post = postprocess(pm[0], core.dec_cfg.pointmaps_activation,
                               compute_cam=compute_cam)

            is_init_batch = len(img_labels) == 0
            for j, fid in enumerate(ids):
                res = {k: val[j] for k, val in post.items()}
                pointmaps[fid] = res
                new_label = base_label + j

                if is_init_batch:
                    # initialization batch: everything is a keyframe
                    # (reference inference.py:297-304)
                    img_labels[fid] = new_label
                    working.append(fid)
                    keyframes.add(fid)
                    scene_state = scene_state_update_fn(res, scene_state)
                    continue

                if fid in img_labels:
                    is_kf = fid in keyframes      # decided on first sight
                else:
                    is_kf = bool(is_keyframe_fn(fid, res, scene_state))
                working.append(fid)

                if fid in img_labels and is_kf:
                    # refinement: refresh the keyframe's tokens in place,
                    # drop the newly appended copy (ref img label 0 keeps
                    # its original values, like the reference)
                    mem = refresh_label_from_segment(
                        mem, img_labels[fid], seg0 + j * n_tok, n_tok)
                    mem = evict_label(mem, new_label)
                elif fid in img_labels:
                    # transient frame seen again: its old tokens were
                    # evicted at the end of the previous pass, so the new
                    # tokens simply take over the old label
                    mem = relabel(mem, new_label, img_labels[fid])
                else:
                    img_labels[fid] = new_label
                    if is_kf:
                        keyframes.add(fid)
                        scene_state = scene_state_update_fn(res, scene_state)

            # evict frames that fell out of the working window
            while len(working) > local_context_size:
                old = working.popleft()
                if old not in keyframes:
                    mem = evict_label(mem, img_labels[old])

            mem = set_n_imgs(mem, len(img_labels))

        # end of pass: drop every remaining non-keyframe
        while working:
            old = working.popleft()
            if old not in keyframes:
                mem = evict_label(mem, img_labels[old])

    mem = compact(mem)
    out = {}
    keys = pointmaps[0].keys()
    for k in keys:
        out[k] = np.stack([np.asarray(pm[k]) for pm in pointmaps])
    out["keyframes"] = sorted(keyframes)
    if return_mem:
        return out, mem
    return out
