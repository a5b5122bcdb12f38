"""Online visual odometry / SLAM on top of the streaming memory decoder.

Parity target: reference `must3r/slam/model.py` (`SLAM_MUSt3R`,
`MUSt3R_Agent`, `forward_must3r`, `postproc_pred`, `get_overlap_score`,
`get_camera_pose`) -- per frame:

  1. preprocess (resize long side, crop to x16 multiple),
  2. encode + tentative memory update + pointmap head  (one jitted step),
  3. focal (Weiszfeld) with sequence-focal rectification, pose via
     confidence-weighted Procrustes,
  4. overlap score = percentile of NN-distance/depth of confident points
     against the keyframe map (native KD-tree, optionally quadrant-split),
  5. keyframe iff overlap > thr and median conf > thr -> commit memory and
     insert points; else ROLL BACK.

TPU-native twist: the tentative update writes in place into the donated
fixed-capacity memory; commit is a no-op and rejection is an O(1) label
rollback (`memory.truncate`) -- the reference instead re-derives `newmem`
and discards it. Device work per frame is ONE fused jitted program whose
host-needed outputs come back as a single packed vector (plus an O(1)
rollback dispatch on rejection); the KD-tree runs on the host.
"""

from __future__ import annotations

import dataclasses
import functools
import pickle
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.engine.inference import view_positions
from must3r_tpu.memory import MemoryState, init_memory, round_capacity, truncate
from must3r_tpu.models.decoder import decoder_head, decoder_render, decoder_update
from must3r_tpu.models.encoder import encoder_forward
from must3r_tpu.ops.geometry import apply_exp_to_norm
from must3r_tpu.ops.pose import (
    estimate_focal_weiszfeld,
    make_c2w,
    rigid_points_registration,
)
from must3r_tpu.slam.nns import get_searcher
from must3r_tpu.slam.tools import (
    laplacian_smoothing,
    laplacian_smoothing_with_confidence,
)
from must3r_tpu.tools.image import preprocess_frame


@dataclasses.dataclass
class SlamConfig:
    res: int = 512
    searcher: str = "kdtree-quadrant_x2"
    overlap_mode: str = "nn-norm"          # 'nn', 'nn-norm', 'meanconf', ...
    kf_x_subsamp: int = 4
    keyframe_overlap_thr: float = 0.15
    min_conf_keyframe: float = 1.5
    overlap_percentile: float = 70.0
    rerender: bool = False
    fixed_focal: bool = True
    num_init_frames: int = 2
    max_keyframes: int = 256
    keep_memory: bool = False
    # 'fp8' / 'int8': 8-bit token memory with per-token scales -- ~2x
    # keyframe capacity per chip at equal HBM (memory.quantize_kv)
    kv_quant: Optional[str] = None


class Must3rSLAM:
    """Streaming reconstruction engine (single agent per camera stream)."""

    def __init__(self, params, enc_cfg: EncoderConfig,
                 dec_cfg: DecoderConfig, cfg: SlamConfig = SlamConfig(),
                 dtype=jnp.bfloat16, impl: Optional[str] = None):
        # device-resident, compute-dtype params ONCE at construction:
        # checkpoint loaders return host numpy trees, and numpy params
        # re-upload the whole weight set on EVERY frame dispatch (through
        # the axon tunnel that is ~1.3 GB and tens of seconds per frame;
        # the r4 512-soak was OOM-killed at 130 GB of retained staging
        # buffers before its first progress print -- dmesg, docs/PERF.md)
        from must3r_tpu.engine.inference import cast_param_tree
        self.params = jax.device_put({
            "encoder": cast_param_tree(params["encoder"], dtype,
                                       keep=("patch_embed",)),
            "decoder": cast_param_tree(params["decoder"], dtype,
                                       keep=("head_proj",)),
        })
        self.enc_cfg = enc_cfg
        self.dec_cfg = dec_cfg
        self.cfg = cfg
        self.dtype = dtype
        self.impl = impl
        self.square = max(enc_cfg.img_size) in (224, 336, 448)

        self._post_fn = jax.jit(self._post, static_argnums=(2,))
        # one fused per-frame program + one O(1) rollback program: through
        # a remote tunnel every dispatch/fetch costs a round trip, so the
        # frame loop is exactly [1 dispatch, 1 small packed fetch]
        self._frame_fn = jax.jit(self._frame_step, donate_argnums=(1,),
                                 static_argnums=(4,))
        self._frame_from_x_fn = jax.jit(self._frame_step_from_x,
                                        donate_argnums=(1,),
                                        static_argnums=(4, 5))
        self._spec_encode_fn = jax.jit(self._spec_encode)
        # capacity-full frames: the same programs with append=False
        # (read-only render; identical predictions -- the update path's
        # self-exclusion mask means a frame never sees its own tentative
        # tokens -- but the full memory is never written past its last
        # slot). No donation: the memory must survive the call.
        self._frame_render_fn = jax.jit(
            functools.partial(self._frame_step, append=False),
            static_argnums=(4,))
        self._frame_render_from_x_fn = jax.jit(
            functools.partial(self._frame_step_from_x, append=False),
            static_argnums=(4, 5))
        self._rollback_fn = jax.jit(
            lambda mem, length, n: truncate(mem, length, n),
            donate_argnums=(0,))
        self._render_fn = jax.jit(self._render_batch)
        self._encode_fn = jax.jit(
            lambda p, img, pos: encoder_forward(p["encoder"], self.enc_cfg,
                                                img, pos, dtype=self.dtype,
                                                impl=self.impl))
        self.reset()

    # -- jitted device programs --------------------------------------------

    def _post(self, pm, seq_focal, is_first: bool):
        """Activation, focal + rectified Procrustes pose, overlap inputs."""
        cfg = self.cfg
        pts3d = apply_exp_to_norm(pm[..., :3].astype(jnp.float32))
        local = apply_exp_to_norm(pm[..., 3:6].astype(jnp.float32))
        conf = 1.0 + jnp.exp(pm[..., 6].astype(jnp.float32))

        focal = estimate_focal_weiszfeld(local[None])[0]
        if is_first:
            c2w = jnp.eye(4, dtype=jnp.float32)
        else:
            ratio = jnp.where((seq_focal > 0) & (focal > 1e-6),
                              seq_focal / jnp.maximum(focal, 1e-6), 1.0)
            local_r = local.at[..., 2].multiply(ratio)
            r, t = rigid_points_registration(
                local_r.reshape(-1, 3), pts3d.reshape(-1, 3),
                weights=conf.reshape(-1) - 1.0)
            c2w = make_c2w(r, t)

        s = cfg.kf_x_subsamp or 1
        sub_conf = conf[::s, ::s]
        return dict(
            pts3d=pts3d, local=local, conf=conf, focal=focal, c2w=c2w,
            # median over the subsampled grid: a full-resolution exact
            # median is a 200k-element sort -- slow on TPU -- and the value
            # only gates the keyframe rule
            conf_median=jnp.median(sub_conf), conf_mean=jnp.mean(conf),
            sub_pts=pts3d[::s, ::s], sub_conf=sub_conf,
            sub_depth=local[::s, ::s, 2],
        )

    def _frame_tail(self, params, mem, x, pos, hw, is_first: bool,
                    seq_focal, append: bool):
        """Shared tail of every frame program: (tentative update | read-
        only render) -> head -> activation/pose/overlap-inputs -> pack.
        append=False is the capacity-full path: identical predictions
        (the update path self-excludes a frame's own tokens) but the
        memory is never written."""
        if append:
            mem, toks = decoder_update(params["decoder"], self.dec_cfg,
                                       mem, x[:, None], pos[:, None],
                                       causal=False, dtype=self.dtype,
                                       unroll_layers=True, impl=self.impl)
        else:
            toks = decoder_render(params["decoder"], self.dec_cfg, mem,
                                  x[:, None], pos[:, None],
                                  dtype=self.dtype, impl=self.impl)
        pm = decoder_head(params["decoder"], self.dec_cfg, toks, hw)
        post = self._post(pm[0, 0], seq_focal, is_first)
        return self._pack_outputs(mem, post)

    def _frame_step(self, params, mem, img, pos, is_first: bool, seq_focal,
                    append: bool = True):
        """Full per-frame device program: encode -> tentative update (or
        read-only render when the memory is full) -> head -> activation/
        pose/overlap-inputs, with the small host-needed quantities packed
        into ONE flat vector (single fetch)."""
        if img.dtype == jnp.uint8:
            # on-device ImgNorm: frames upload as uint8 (4x less tunnel
            # bandwidth than fp32)
            img = (img.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        x = encoder_forward(params["encoder"], self.enc_cfg, img, pos,
                            dtype=self.dtype, impl=self.impl)
        hw = (img.shape[1], img.shape[2])
        return self._frame_tail(params, mem, x, pos, hw, is_first,
                                seq_focal, append)

    def _spec_encode(self, params, img, pos):
        """Speculative encoder program: memory/decision-independent, so the
        NEXT frame's encode can be dispatched before the current frame's
        keyframe decision (it runs on-device while the host fetches,
        queries the KD-tree and decides -- see __call__'s next_frame)."""
        if img.dtype == jnp.uint8:
            img = (img.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        return encoder_forward(params["encoder"], self.enc_cfg, img, pos,
                               dtype=self.dtype, impl=self.impl)

    def _frame_step_from_x(self, params, mem, x, pos, hw, is_first: bool,
                           seq_focal, append: bool = True):
        """`_frame_step` with a speculatively pre-encoded frame."""
        return self._frame_tail(params, mem, x, pos, hw, is_first,
                                seq_focal, append)

    def _pack_outputs(self, mem, post):
        packed = jnp.concatenate([
            jnp.stack([post["focal"], post["conf_median"],
                       post["conf_mean"]]),
            post["c2w"].reshape(-1),
            post["sub_pts"].reshape(-1),
            post["sub_conf"].reshape(-1),
            post["sub_depth"].reshape(-1),
        ]).astype(jnp.float32)
        maps = jnp.stack([post["pts3d"], post["local"],
                          post["conf"][..., None].repeat(3, -1)])
        return mem, packed, maps

    def _unpack(self, packed, hw):
        s = self.cfg.kf_x_subsamp or 1
        sh, sw = -(-hw[0] // s), -(-hw[1] // s)
        ns = sh * sw
        focal, conf_median, conf_mean = (float(packed[0]),
                                         float(packed[1]),
                                         float(packed[2]))
        c2w = packed[3:19].reshape(4, 4)
        off = 19
        sub_pts = packed[off:off + 3 * ns].reshape(sh, sw, 3)
        off += 3 * ns
        sub_conf = packed[off:off + ns].reshape(sh, sw)
        off += ns
        sub_depth = packed[off:off + ns].reshape(sh, sw)
        return dict(focal=focal, conf_median=conf_median,
                    conf_mean=conf_mean, c2w=c2w, sub_pts=sub_pts,
                    sub_conf=sub_conf, sub_depth=sub_depth)

    def _render_batch(self, params, mem, x, pos):
        toks = decoder_render(params["decoder"], self.dec_cfg, mem, x, pos,
                              dtype=self.dtype, impl=self.impl)
        hw = self._hw
        return decoder_head(params["decoder"], self.dec_cfg, toks, hw)

    # -- state ---------------------------------------------------------------

    def reset(self):
        self.mem: Optional[MemoryState] = None
        self._spec = None                 # speculative (id, hw, x_enc)
        self._warned_full = False
        self._init_satisfied = False      # True once loaded/initialized
        self._hw = None
        self._n_tokens = None
        self.committed_len = 0
        self.committed_imgs = 0
        self.overlap_tree = get_searcher(
            self.cfg.searcher if "nn" in self.cfg.overlap_mode else "none")
        self.all_poses: List[np.ndarray] = []
        self.all_confs: List[float] = []
        self.all_timestamps: List[int] = []
        self.all_focals: List[float] = []
        self.keyframes: List[int] = []
        self.keyframe_pointmaps = []
        self.agents = {}          # cam_id -> focal tracker (MUSt3R_Agent)
        self.all_images = []
        self.all_pts3d = None

    @property
    def num_mem_frames(self) -> int:
        return len(self.keyframes)

    def _agent(self, cam_id: int):
        """Per-camera focal tracker (reference MUSt3R_Agent): streams share
        the memory but keep independent focal statistics."""
        if cam_id not in self.agents:
            self.agents[cam_id] = {"f": [], "conf": [], "to_orig": []}
        return self.agents[cam_id]

    def _seq_focal(self, cam_id: int = 0) -> float:
        sf = self._agent(cam_id)
        if not sf["f"] or not self.cfg.fixed_focal:
            return -1.0
        f = np.asarray(sf["f"])
        c = np.asarray(sf["conf"])
        return float((f * c / c.sum()).sum())

    def get_true_focal(self, cam_id: int = 0):
        sf = self._agent(cam_id)
        if not sf["f"]:
            return None
        return self._seq_focal(cam_id) * sf["to_orig"][0]

    def get_true_focals(self):
        """{cam_id: focal} over all agents (reference slam/model.py:404)."""
        return {cid: self.get_true_focal(cid) for cid in self.agents}

    # -- per-frame ------------------------------------------------------------

    def _ensure_memory(self, hw):
        if self.mem is None or self._hw != tuple(hw):
            self._hw = tuple(hw)
            p = self.dec_cfg.patch_size
            self._n_tokens = (hw[0] // p) * (hw[1] // p)
            cap = round_capacity(self.cfg.max_keyframes * self._n_tokens,
                                 1024)
            self._cap = cap
            mem_dtype = self.dtype
            if self.cfg.kv_quant is not None:
                from must3r_tpu.memory import QUANT_DTYPES
                mem_dtype = QUANT_DTYPES[self.cfg.kv_quant][0]
            self.mem = init_memory(self.dec_cfg.depth, 1,
                                   self.dec_cfg.num_heads,
                                   self.dec_cfg.head_dim, cap,
                                   dtype=mem_dtype)
            self.committed_len = 0
            self.committed_imgs = 0

    def _overlap_score(self, post, cam_center) -> float:
        cfg = self.cfg
        mode = cfg.overlap_mode
        if mode == "meanconf":
            return float(post["conf_mean"])
        if mode == "medianconf":
            return float(post["conf_median"])
        assert "nn" in mode, mode
        conf = np.asarray(post["sub_conf"])
        msk = conf > cfg.min_conf_keyframe
        if msk.sum() == 0 or self.overlap_tree is None:
            return 0.0
        pts = np.asarray(post["sub_pts"])[msk]
        dists = self.overlap_tree.query(pts, cam_center=cam_center)
        if "norm" in mode:
            depth = np.asarray(post["sub_depth"])[msk]
            dists = dists / (depth + 1e-9)
        dists = np.where(np.isposinf(dists), np.finfo(np.float32).max,
                         dists)
        return float(np.percentile(dists, cfg.overlap_percentile))

    def __call__(self, frame: np.ndarray, frame_id: int, cam_id: int = 0,
                 return_maps: bool = True, next_frame=None,
                 next_frame_id=None):
        """Process one frame. Returns a dict with pose/conf/focal/keyframe
        plus (with return_maps) full-resolution pointmaps -- skip the maps
        on latency-critical loops: fetching them costs an extra host
        round trip per frame.

        next_frame / next_frame_id: speculative pipelining (the reference
        has no equivalent; SURVEY §3.3 host/device choreography). When the
        caller can peek one frame ahead, the NEXT frame's encoder program
        is dispatched BEFORE this frame's blocking fetch: the encode is
        memory- and decision-independent, so it runs on-device while the
        host fetches, queries the overlap KD-tree and decides
        keyframe-ness -- hiding the encoder entirely from the host-visible
        frame latency."""
        cfg = self.cfg
        prep = preprocess_frame(frame, cfg.res,
                                patch_size=self.dec_cfg.patch_size,
                                square=self.square, normalize=False)
        hw = prep["img"].shape[:2]
        spec_next = None
        if next_frame is not None and next_frame_id is not None:
            spec_next = (next_frame_id, preprocess_frame(
                next_frame, cfg.res, patch_size=self.dec_cfg.patch_size,
                square=self.square, normalize=False))

        # re-initialization: until num_init_frames frames are seen, the map
        # restarts from scratch including all previous init frames
        # (reference slam/model.py:484-496)
        if self.mem is not None and self.committed_imgs > 0 and \
                not getattr(self, "_init_satisfied", False) and \
                len(self.all_images) < cfg.num_init_frames:
            init_imgs = [v for v in self.all_images]
            init_ids = list(self.all_timestamps)
            self.reset()
            # the replayed init frames stay in all_images (reference
            # slam/model.py:491) -- without this the length never reaches
            # num_init_frames and the engine re-initializes on EVERY frame
            self.all_images = list(init_imgs)
            replay = list(zip(init_imgs, init_ids))
        else:
            replay = []

        if cfg.rerender or (len(self.all_images) < cfg.num_init_frames):
            self.all_images.append(prep)

        results = None
        seq = replay + [(prep, frame_id)]
        for i, (p_img, p_id) in enumerate(seq):
            results = self._process_one(
                p_img, p_id, return_maps, cam_id,
                spec_next=spec_next if i == len(seq) - 1 else None)
        return results

    def _positions(self, hw):
        # device-resident constant per resolution: keep the frame loop free
        # of eager dispatches (each is a host round trip through a tunnel)
        if not hasattr(self, "_pos_cache"):
            self._pos_cache = {}
        if hw not in self._pos_cache:
            self._pos_cache[hw] = jax.device_put(np.asarray(
                view_positions(hw, self.enc_cfg.patch_size,
                               batch_shape=(1,))))
        return self._pos_cache[hw]

    def _process_one(self, prep, frame_id, return_maps: bool = True,
                     cam_id: int = 0, spec_next=None):
        cfg = self.cfg
        hw = prep["img"].shape[:2]
        self._ensure_memory(hw)
        is_first = self.committed_imgs == 0

        # numpy args transfer as part of the dispatch -- no eager ops here
        img = prep["img"][None]
        pos = self._positions(hw)

        old_len, old_imgs = self.committed_len, self.committed_imgs
        # capacity gate: a tentative append past the buffer end would
        # CLAMP its dynamic_update_slice start and overwrite the last
        # committed keyframe's tokens -- at capacity, run the read-only
        # render path instead (identical predictions, no append)
        full = (not is_first
                and self.committed_len + self._n_tokens > self._cap)
        if full and not getattr(self, "_warned_full", False):
            self._warned_full = True
            print(f"slam: memory full ({self.committed_imgs} keyframes, "
                  f"capacity {self._cap} tokens) -- further frames are "
                  f"tracked against the frozen map (raise max_keyframes "
                  f"or enable kv_quant for 2x capacity)")
        spec = getattr(self, "_spec", None)
        if spec is not None and spec[0] == frame_id and spec[1] == hw:
            # speculatively encoded last frame-step: skip the encoder
            if full:
                _, packed, maps = self._frame_render_from_x_fn(
                    self.params, self.mem, spec[2], pos, hw, False,
                    float(self._seq_focal(cam_id)))
            else:
                self.mem, packed, maps = self._frame_from_x_fn(
                    self.params, self.mem, spec[2], pos, hw, is_first,
                    float(self._seq_focal(cam_id)))
            self._spec = None
        else:
            if spec is not None:
                self._spec = None         # stale (id or shape mismatch)
            if full:
                _, packed, maps = self._frame_render_fn(
                    self.params, self.mem, img, pos, False,
                    float(self._seq_focal(cam_id)))
            else:
                self.mem, packed, maps = self._frame_fn(
                    self.params, self.mem, img, pos, is_first,
                    float(self._seq_focal(cam_id)))
        if spec_next is not None:
            # dispatch the NEXT frame's encode before this frame's blocking
            # fetch: it runs on-device during the host's decision work
            n_id, n_prep = spec_next
            n_hw = n_prep["img"].shape[:2]
            x_next = self._spec_encode_fn(self.params, n_prep["img"][None],
                                          self._positions(n_hw))
            self._spec = (n_id, n_hw, x_next)
        post = self._unpack(np.asarray(packed), hw)   # the ONE host fetch

        c2w = post["c2w"]
        cam_center = c2w[:3, 3]
        focal = post["focal"]
        conf_mean = post["conf_mean"]
        conf_median = post["conf_median"]

        score = self._overlap_score(post, cam_center)
        if "nn" in cfg.overlap_mode:
            novel = score > cfg.keyframe_overlap_thr
        else:
            novel = score < cfg.keyframe_overlap_thr
        iskeyframe = bool(not full and
                          (is_first or
                           (novel and conf_median > cfg.min_conf_keyframe)))

        if iskeyframe:
            self.committed_len = old_len + self._n_tokens
            self.committed_imgs = old_imgs + 1
            self.keyframes.append(frame_id)
            if self.overlap_tree is not None:
                msk = post["sub_conf"] > cfg.min_conf_keyframe
                if msk.sum():
                    self.overlap_tree.add_pts(post["sub_pts"][msk],
                                              cam_center=cam_center)
            if cfg.keep_memory:
                m = np.asarray(maps)
                self.keyframe_pointmaps.append(
                    [m[0], np.asarray(prep["img"]), m[2][..., 0]])
        elif not full:
            # O(1) rollback of the tentative tokens (one async dispatch);
            # the full-path render never touched the memory
            self.mem = self._rollback_fn(self.mem, old_len, old_imgs)

        sf = self._agent(cam_id)
        sf["f"].append(focal)
        sf["conf"].append(max(conf_mean - 1.0, 1e-6))
        sf["to_orig"].append(1.0)
        self.all_timestamps.append(frame_id)
        self.all_poses.append(c2w)
        self.all_confs.append(conf_mean)
        self.all_focals.append(focal)

        out = dict(focal=focal, c2w=c2w, overlap_score=score,
                   iskeyframe=iskeyframe, true_shape=hw,
                   conf_mean=conf_mean, conf_median=conf_median)
        if return_maps:
            m = np.asarray(maps)          # optional second fetch
            out.update(pts3d=m[0], pts3d_local=m[1], conf=m[2][..., 0])
        return out

    # -- post-sequence ---------------------------------------------------------

    def rerender_all_frames(self, max_bs: int = 8):
        """Re-predict every stored frame against the final memory
        (reference slam/model.py:448-478); refreshes all_poses/all_pts3d."""
        if not self.cfg.rerender or not self.all_images:
            return
        n = len(self.all_images)
        seq_focal = jnp.float32(self._seq_focal(0))
        pts_all, poses = [], []
        for i in range(0, n, max_bs):
            chunk = self.all_images[i:i + max_bs]
            stack = np.stack([v["img"] for v in chunk])
            if stack.dtype == np.uint8:
                stack = (stack.astype(np.float32) / 255.0 - 0.5) / 0.5
            imgs = jnp.asarray(stack)
            pos = view_positions(self._hw, self.enc_cfg.patch_size,
                                 batch_shape=(len(chunk),))
            x = self._encode_fn(self.params, imgs, pos)
            pm = self._render_fn(self.params, self.mem, x[None], pos[None])
            for j in range(len(chunk)):
                post = self._post_fn(pm[0, j], seq_focal, False)
                pts_all.append(np.asarray(post["pts3d"]))
                poses.append(np.asarray(post["c2w"]))
        self.all_pts3d = np.stack(pts_all)
        self.all_poses = poses

    def write_all_poses(self, path: str, filtering_mode: Optional[str] = None,
                        filtering_steps: int = 5, filtering_alpha: float = 0.5,
                        **tolog):
        """Trajectory export (.npz: poses, timestamps, confs, focal) with
        optional Laplacian smoothing (reference slam/model.py:408-429)."""
        poses = np.stack(self.all_poses)
        conf = np.asarray(self.all_confs)
        if filtering_mode is not None:
            assert "laplacian" in filtering_mode, filtering_mode
            traj = poses[:, :3, 3]
            if "conf" in filtering_mode:
                c = (conf - conf.min()) / max(conf.max() - conf.min(), 1e-9)
                traj = laplacian_smoothing_with_confidence(
                    traj, c, alpha=filtering_alpha,
                    iterations=filtering_steps)
            else:
                traj = laplacian_smoothing(traj, alpha=filtering_alpha,
                                           iterations=filtering_steps)
            poses[:, :3, 3] = traj
        np.savez(path, poses=poses,
                 timestamps=np.asarray(self.all_timestamps, int),
                 confs=conf, focal=self.get_true_focals(), **tolog)

    def get_map(self, conf_thr: float = 1.5):
        """Confidence-thresholded global map from the stored keyframe
        pointmaps (requires keep_memory=True; reference `get_map`)."""
        pts_all, col_all = [], []
        for pts, img, conf in self.keyframe_pointmaps:
            msk = conf > conf_thr
            if msk.any():
                pts_all.append(pts[msk])
                col_all.append(np.asarray(img)[msk])
        if not pts_all:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.uint8))
        return np.concatenate(pts_all), np.concatenate(col_all)

    def save_memory(self, path: str):
        """Persist the keyframe memory + map (reference pickles the torch
        tensors; here the MemoryState pytree becomes numpy arrays)."""
        mem_np = jax.tree.map(np.asarray, self.mem)
        with open(path, "wb") as f:
            pickle.dump({"memory": mem_np, "hw": self._hw,
                         "committed": (self.committed_len,
                                       self.committed_imgs),
                         "keyframe_pointmaps": self.keyframe_pointmaps,
                         "overlap_tree": self.overlap_tree}, f)

    def load_memory(self, path: str):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.mem = jax.tree.map(jnp.asarray, blob["memory"])
        self._hw = tuple(blob["hw"])
        p = self.dec_cfg.patch_size
        self._n_tokens = (self._hw[0] // p) * (self._hw[1] // p)
        self.committed_len, self.committed_imgs = blob["committed"]
        self.keyframe_pointmaps = blob["keyframe_pointmaps"]
        self.overlap_tree = blob["overlap_tree"]
        # the loaded map is already initialized: mark init as satisfied so
        # the re-initialization gate (len(all_images) < num_init_frames)
        # cannot wipe it on the first frame, and restore the capacity
        # bookkeeping the gate and the full-memory path read
        self._init_satisfied = True
        self._cap = self.mem.kv.shape[3]
        self._warned_full = False
