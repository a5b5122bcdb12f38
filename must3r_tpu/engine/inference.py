"""Inference engine: jitted step functions + host-side orchestration.

Parity target: reference `must3r/engine/inference.py` --
  * `postprocess` (:16-47): channel split, norm-exp activation, conf,
    Weiszfeld focal, weighted Procrustes c2w. Runs fp32.
  * `inference_multi_ar` (:368-526): memory-update loop over `mem_batches`,
    optional refinement iterations (in-place token refresh), then a
    read-only render phase over all views.
  * `encoder_multi_ar` (:138-164): encode all views in bounded batches.

TPU-native differences: steps are jitted with **donated memory** so the KV
cache updates in place in HBM; batches are padded to a small set of static
shapes instead of dynamically sized; aspect-ratio buckets each get their own
compiled executable (host routes views to buckets).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from must3r_tpu.config import ActivationType, DecoderConfig, EncoderConfig
from must3r_tpu.memory import MemoryState, init_memory, round_capacity
from must3r_tpu.models.decoder import (
    decoder_head,
    decoder_refine,
    decoder_render,
    decoder_update,
)
from must3r_tpu.models.encoder import encoder_forward
from must3r_tpu.ops.geometry import apply_exp_to_norm
from must3r_tpu.ops.patch import patchify_positions
from must3r_tpu.ops.pose import (
    estimate_focal_weiszfeld,
    make_c2w,
    rigid_points_registration,
)


# ---------------------------------------------------------------------------
# Postprocess (reference inference.py:16-47)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def postprocess(pointmaps, activation: ActivationType = ActivationType.NORM_EXP,
                compute_cam: bool = False):
    """Split the 7-channel head output into calibrated quantities.

    Args:
      pointmaps: [..., H, W, C] raw head output (C in {3, 4, 6, 7}).
    Returns dict with 'pts3d' (global), 'pts3d_local', 'conf', and with
    compute_cam also 'focal' and 'c2w' (confidence-weighted Procrustes
    local->global).
    """
    pm = pointmaps.astype(jnp.float32)
    channels = pm.shape[-1]

    def act(x):
        if activation == ActivationType.NORM_EXP:
            return apply_exp_to_norm(x)
        return x

    out = {"pts3d": act(pm[..., :3])}
    if channels >= 6:
        out["pts3d_local"] = act(pm[..., 3:6])
    if channels in (4, 7):
        out["conf"] = 1.0 + jnp.exp(pm[..., -1])

    if compute_cam:
        lead = out["pts3d"].shape[:-3]
        h, w = pm.shape[-3:-1]
        out["focal"] = estimate_focal_weiszfeld(
            out["pts3d_local"].reshape(-1, h, w, 3)).reshape(lead)
        r, t = rigid_points_registration(
            out["pts3d_local"].reshape(*lead, -1, 3),
            out["pts3d"].reshape(*lead, -1, 3),
            weights=out["conf"].reshape(*lead, -1) - 1.0)
        out["c2w"] = make_c2w(r, t)
    return out


# ---------------------------------------------------------------------------
# Patch positions (dust3r ManyAR semantics: portrait views swap (y, x))
# ---------------------------------------------------------------------------

def view_positions(img_hw, patch_size: int, portrait=None, batch_shape=()):
    """(y, x) patch coords for views stored in landscape at img_hw.

    Portrait views (true H > W) are stored transposed; their token at stored
    (r, c) sits at true (c, r), so their positions are swapped.

    Args:
      img_hw: static stored (H, W).
      portrait: optional bool array broadcastable to batch_shape.
    Returns: [*batch_shape, N, 2] int32.
    """
    hp, wp = img_hw[0] // patch_size, img_hw[1] // patch_size
    pos = patchify_positions(hp, wp)                       # [N, 2]
    pos = jnp.broadcast_to(pos, (*batch_shape, *pos.shape))
    if portrait is None:
        return pos
    swapped = pos[..., ::-1]
    sel = jnp.asarray(portrait)[..., None, None]
    return jnp.where(sel, swapped, pos)


# ---------------------------------------------------------------------------
# Jitted core
# ---------------------------------------------------------------------------

def cast_param_tree(p, target, keep=()):
    """Pre-cast weights to the compute dtype so executables don't
    re-convert 400M fp32 params on every dispatch. LayerNorm params (1D)
    and the fp32 islands named in ``keep`` (patch_embed, prediction head)
    keep full precision."""
    def leaf(x):
        if x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(target)
        return x

    return {k: (v if k in keep else jax.tree.map(leaf, v))
            for k, v in p.items()}


class InferenceCore:
    """Params + per-shape compiled step functions with donated memory.

    One instance serves every aspect-ratio bucket; jax.jit caches one
    executable per distinct input shape automatically.
    """

    def __init__(self, enc_params, dec_params, enc_cfg: EncoderConfig,
                 dec_cfg: DecoderConfig, dtype=jnp.bfloat16,
                 enc_dtype=None, impl: Optional[str] = None,
                 cast_params: bool = True, mesh=None,
                 kv_quant: Optional[str] = None):
        """mesh: optional Mesh with an 'sp' axis. When given, memories from
        `new_memory` are sharded along their token axis over 'sp' and every
        update/refine/render routes through the all-gather-free sharded
        cross-attention (SURVEY §5.7) -- collections whose KV cache exceeds
        one chip's HBM serve transparently; params are replicated.

        kv_quant: 'fp8' or 'int8' stores the token memory 8-bit with
        per-token scales (memory.quantize_kv); the CA kernel dequantizes
        in-flight. Halves the cache's HBM footprint (~2x keyframe capacity
        per chip); compute stays bf16. Composes with mesh: the scales
        shard with the tokens and each shard dequantizes only its local
        slice, so int8 x sp multiplies per-chip keyframe capacity
        (SURVEY §5.7's two capacity levers together)."""
        if kv_quant is not None:
            from must3r_tpu.memory import QUANT_DTYPES
            assert kv_quant in QUANT_DTYPES, kv_quant
        self.kv_quant = kv_quant
        if cast_params:
            enc_params = cast_param_tree(
                enc_params, dtype if enc_dtype is None else enc_dtype,
                keep=("patch_embed",))
            dec_params = cast_param_tree(dec_params, dtype,
                                         keep=("head_proj",))
        if mesh is None:
            # device-resident ONCE: checkpoint loaders return host numpy
            # trees, and numpy params re-upload the full weight set on
            # EVERY dispatch (through the axon tunnel that is ~1.3 GB and
            # tens of seconds per frame -- the r4 512-soak OOM'd at 130 GB
            # of retained staging buffers before its first progress print)
            enc_params = jax.device_put(enc_params)
            dec_params = jax.device_put(dec_params)
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.enc_cfg = enc_cfg
        self.dec_cfg = dec_cfg
        self.dtype = dtype
        # production default: bf16 encoder on TPU (fp32 = parity mode)
        self.enc_dtype = dtype if enc_dtype is None else enc_dtype
        self.impl = impl
        self.mesh = mesh
        self._cpu_mesh = (mesh is not None
                          and mesh.devices.flat[0].platform == "cpu")
        if mesh is not None:
            from must3r_tpu.parallel import replicate
            self.enc_params = replicate(mesh, self.enc_params)
            self.dec_params = replicate(mesh, self.dec_params)

        self._encode = jax.jit(
            lambda p, img, pos: encoder_forward(p, enc_cfg, img, pos,
                                                dtype=self.enc_dtype,
                                                impl=impl))
        self._update = jax.jit(
            lambda p, mem, x, pos: decoder_update(
                p, dec_cfg, mem, x, pos, causal=False, dtype=dtype,
                impl=impl, mesh=mesh),
            donate_argnums=(1,))
        self._refine = jax.jit(
            lambda p, mem, x, pos, labels: decoder_refine(
                p, dec_cfg, mem, x, pos, labels, dtype=dtype, impl=impl,
                mesh=mesh),
            donate_argnums=(1,))
        self._render = jax.jit(
            lambda p, mem, x, pos: decoder_render(
                p, dec_cfg, mem, x, pos, dtype=dtype, impl=impl,
                mesh=mesh))
        self._head = jax.jit(
            lambda p, toks, hw, pmask: decoder_head(p, dec_cfg, toks, hw,
                                                    pmask),
            static_argnums=(2,))

        def scan_updates(p, mem, xs, ps):
            # V sequential 1-view updates inside ONE program (lax.scan):
            # removes per-view dispatch latency on mixed-AR collections
            # where the uniform-bucket `make_fused_offline` cannot apply
            # (reference runtime list loop, inference.py:403-449).
            def step(m, inp):
                xi, pi = inp
                m, _ = decoder_update(p, dec_cfg, m, xi[None, None],
                                      pi[None, None], causal=False,
                                      dtype=dtype, impl=impl, mesh=mesh)
                return m, None

            mem, _ = jax.lax.scan(step, mem, (xs, ps))
            return mem

        self._update_scan = jax.jit(scan_updates, donate_argnums=(1,))

        def render_post(p, mem, x, pos, pmask, hw, compute_cam):
            toks = decoder_render(p, dec_cfg, mem, x, pos, dtype=dtype,
                                  impl=impl, mesh=mesh)
            pm = decoder_head(p, dec_cfg, toks, hw, pmask)
            return postprocess(pm[0], dec_cfg.pointmaps_activation,
                               compute_cam=compute_cam)

        self._render_post = jax.jit(render_post, static_argnums=(5, 6))

    # -- memory ------------------------------------------------------------

    @property
    def mem_dtype(self):
        """Storage dtype of the token memory (8-bit when kv_quant is on)."""
        if self.kv_quant is not None:
            from must3r_tpu.memory import QUANT_DTYPES
            return QUANT_DTYPES[self.kv_quant][0]
        return self.dtype

    def new_memory(self, max_images: int, img_hw, batch: int = 1,
                   block: int = 1024) -> MemoryState:
        n = (img_hw[0] // self.dec_cfg.patch_size) * \
            (img_hw[1] // self.dec_cfg.patch_size)
        cap = round_capacity(max_images * n, block)
        if self.mesh is not None:
            # capacity must split evenly over the sp shards
            sp = self.mesh.shape.get("sp", 1)
            cap = round_capacity(cap, block * sp)
        mem = init_memory(self.dec_cfg.depth, batch, self.dec_cfg.num_heads,
                          self.dec_cfg.head_dim, cap, dtype=self.mem_dtype)
        if self.mesh is not None:
            from must3r_tpu.parallel import shard_memory
            mem = shard_memory(self.mesh, mem)
        return mem

    # -- steps ---------------------------------------------------------------

    def encode(self, imgs, positions):
        """imgs [B, H, W, 3] -> tokens [B, N, Denc] (fp32 island)."""
        return self._encode(self.enc_params, imgs, positions)

    def encode_all(self, imgs, positions, max_bs: int = 8):
        """Encode V views in padded chunks of max_bs (one compile)."""
        v = imgs.shape[0]
        outs = []
        for i in range(0, v, max_bs):
            chunk = imgs[i:i + max_bs]
            cpos = positions[i:i + max_bs]
            pad = max_bs - chunk.shape[0]
            if pad and v > max_bs:
                chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0), (0, 0)))
                cpos = jnp.pad(cpos, ((0, pad), (0, 0), (0, 0)))
            toks = self.encode(chunk, cpos)
            outs.append(toks[:max_bs - pad] if pad and v > max_bs else toks)
        return jnp.concatenate(outs, axis=0)

    def _fence(self, out):
        """On a VIRTUAL CPU mesh, block each sharded dispatch before the
        next is issued. XLA's in-process CPU communicator deadlocks (and
        aborts via AwaitAndLogIfStuck) when two partitioned programs with
        collectives execute concurrently on a starved host — async JAX
        dispatch makes e.g. independent render chunks overlap. Real TPU
        meshes queue per-device in order and never hit this; the fence is
        a no-op there (and for mesh=None)."""
        if self._cpu_mesh:
            jax.block_until_ready(out)
        return out

    def update(self, mem, x_enc, pos):
        return self._fence(self._update(self.dec_params, mem, x_enc, pos))

    def refine(self, mem, x_enc, pos, labels):
        return self._fence(
            self._refine(self.dec_params, mem, x_enc, pos, labels))

    def render(self, mem, x_enc, pos):
        return self._fence(self._render(self.dec_params, mem, x_enc, pos))

    def update_seq(self, mem, xs, ps, chunk: int = 8):
        """Sequential 1-view updates over xs [V, N, Denc] with the view
        loop INSIDE the program: full `chunk`-view lax.scan dispatches
        plus single-view remainder. Bounded program alphabet -- one scan
        executable per (chunk, N) pair; order-identical to calling
        `update` view-by-view."""
        v = xs.shape[0]
        i = 0
        while i + chunk <= v:
            mem = self._fence(self._update_scan(
                self.dec_params, mem, xs[i:i + chunk], ps[i:i + chunk]))
            i += chunk
        for j in range(i, v):
            mem, _ = self.update(mem, xs[j][None, None], ps[j][None, None])
        return mem

    def render_post(self, mem, x_enc, pos, portrait_mask, img_hw,
                    compute_cam: bool = True):
        """Render + head + postprocess fused into one dispatch."""
        return self._fence(
            self._render_post(self.dec_params, mem, x_enc, pos,
                              portrait_mask, tuple(img_hw), compute_cam))

    def head(self, tokens, img_hw, portrait_mask=None):
        if portrait_mask is None:
            portrait_mask = jnp.zeros(tokens.shape[:2], bool)
        return self._head(self.dec_params, tokens, tuple(img_hw),
                          portrait_mask)


# ---------------------------------------------------------------------------
# Offline reconstruction driver (reference inference_multi_ar)
# ---------------------------------------------------------------------------

def default_mem_batches(n_views: int, init_num_images: int = 2):
    """Reference demo schedule: [init(2), 1, 1, ...] (demo/inference.py:188-191)."""
    init = min(init_num_images, n_views)
    return [init] + [1] * (n_views - init)


def offline_reconstruction(core: InferenceCore, imgs, img_hw=None,
                           portrait=None,
                           mem_views: Optional[Sequence[int]] = None,
                           init_num_images: int = 2,
                           num_refinement_iterations: int = 0,
                           to_render: Optional[Sequence[int]] = None,
                           render_bs: int = 8, encode_bs: int = 8,
                           capacity_images: Optional[int] = None,
                           compute_cam: bool = True,
                           return_mem: bool = False,
                           on_update=None):
    """Full offline pipeline for a single aspect-ratio bucket.

    Args:
      imgs: [V, H, W, 3] normalized images, landscape storage, presented in
        processing order (keyframes first -- caller handles selection).
      portrait: optional bool [V] marking transposed (portrait) views.
      mem_views: indices of views that build the memory (default: all).
      to_render: indices of views to predict (default: all).
      on_update: optional `(view_ids, partial_result_dict)` hook called
        after every memory batch with that batch's first-pass predictions
        (postprocessed) -- feeds live viewers during reconstruction, the
        viser streaming role (reference inference.py:448-449).

    Returns dict of per-view arrays: pts3d, pts3d_local, conf [V,H,W,...],
    focal [V], c2w [V,4,4] -- matching reference postprocess keys.
    """
    v = imgs.shape[0]
    img_hw = tuple(img_hw) if img_hw is not None else tuple(imgs.shape[1:3])
    if portrait is None:
        portrait = jnp.zeros((v,), bool)
    portrait = jnp.asarray(portrait)
    mem_views = list(mem_views) if mem_views is not None else list(range(v))
    to_render = list(to_render) if to_render is not None else list(range(v))

    pos = view_positions(img_hw, core.enc_cfg.patch_size, portrait,
                         batch_shape=(v,))
    x = core.encode_all(imgs, pos, max_bs=encode_bs)       # [V, N, Denc]

    # slack for refinement passes, which append before truncating back
    slack = init_num_images if num_refinement_iterations > 0 else 0
    mem = core.new_memory((capacity_images or len(mem_views)) + slack, img_hw)

    batches = default_mem_batches(len(mem_views), init_num_images)
    # update phase
    labels_of = {}
    cursor = 0
    bi = 0
    while bi < len(batches):
        bsize = batches[bi]
        if bsize == 1 and on_update is None:
            # collapse the run of 1-view batches into scan-fused sequential
            # updates (one dispatch per chunk instead of per view) -- only
            # when nobody consumes the per-batch first-pass tokens
            j = bi
            while j < len(batches) and batches[j] == 1:
                j += 1
            ids = mem_views[cursor:cursor + (j - bi)]
            sel = jnp.asarray(ids)
            mem = core.update_seq(mem, x[sel], pos[sel])
            base = len(labels_of)
            for k, vid in enumerate(ids):
                labels_of[vid] = base + k
            cursor += len(ids)
            bi = j
            continue
        ids = mem_views[cursor:cursor + bsize]
        xb = x[jnp.asarray(ids)][None]                     # [1, G, N, Denc]
        pb = pos[jnp.asarray(ids)][None]
        base = len(labels_of)
        mem, toks = core.update(mem, xb, pb)
        for j, vid in enumerate(ids):
            labels_of[vid] = base + j
        cursor += bsize
        bi += 1
        if on_update is not None:
            pm = core.head(toks, img_hw, portrait[jnp.asarray(ids)][None])
            partial = postprocess(pm[0], core.dec_cfg.pointmaps_activation,
                                  compute_cam=compute_cam)
            on_update(ids, {k: np.asarray(v) for k, v in partial.items()})

    # refinement iterations: refresh each view's tokens against the full map
    for _ in range(num_refinement_iterations):
        cursor = 0
        for bsize in batches:
            ids = mem_views[cursor:cursor + bsize]
            xb = x[jnp.asarray(ids)][None]
            pb = pos[jnp.asarray(ids)][None]
            labs = jnp.asarray([labels_of[i] for i in ids], jnp.int32)
            mem, _ = core.refine(mem, xb, pb, labs)
            cursor += bsize

    # render phase: all requested views against the final memory
    outs = []
    for i in range(0, len(to_render), render_bs):
        ids = to_render[i:i + render_bs]
        pad = render_bs - len(ids) if len(to_render) > render_bs else 0
        ids_p = ids + [ids[-1]] * pad
        xb = x[jnp.asarray(ids_p)][None]
        pb = pos[jnp.asarray(ids_p)][None]
        toks = core.render(mem, xb, pb)
        pm = core.head(toks, img_hw, portrait[jnp.asarray(ids_p)][None])
        outs.append(pm[0, :len(ids)])
    pointmaps = jnp.concatenate(outs, axis=0)              # [V, H, W, C]

    result = postprocess(pointmaps, core.dec_cfg.pointmaps_activation,
                         compute_cam=compute_cam)
    if return_mem:
        return result, mem
    return result


# ---------------------------------------------------------------------------
# Mixed aspect-ratio routing (reference stack_views, inference.py:64-135)
# ---------------------------------------------------------------------------

def group_views_by_shape(views: Sequence[dict]):
    """Group view dicts by stored image shape. Returns
    {shape: [view indices]} preserving order within groups."""
    groups = {}
    for i, vw in enumerate(views):
        groups.setdefault(tuple(vw["img"].shape[:2]), []).append(i)
    return groups


def offline_reconstruction_multi_ar(core: InferenceCore,
                                    views: Sequence[dict],
                                    mem_views: Optional[Sequence[int]] = None,
                                    init_num_images: int = 2,
                                    encode_bs: int = 8, render_bs: int = 8,
                                    compute_cam: bool = True,
                                    capacity_slack: int = 4,
                                    fused: bool = True,
                                    update_chunk: int = 8):
    """Offline reconstruction over a mixed-aspect-ratio collection.

    Per-bucket compiled executables + host routing replace the reference's
    runtime tensor lists (`forward_list`, `stack_views`): encode per
    bucket, update the SHARED memory view-by-view (the init pair is joint
    when it shares a bucket, else sequential -- reference forward_list
    processes mixed-AR init jointly; the sequential fallback differs only
    in that image 0 does not see image 1 during its own update), then
    render per bucket.

    With `fused` (default), consecutive same-shape update runs go through
    `core.update_seq` (the view loop rides a lax.scan inside one program,
    `update_chunk` views per dispatch) and each render chunk runs
    render+head+postprocess as ONE dispatch -- same results, ~2V fewer
    device round-trips on a tunneled or multi-host setup.

    Args:
      views: dicts with 'img' [H, W, 3] (landscape storage), 'portrait'.
    Returns: list of per-view postprocess dicts (input order).
    """
    import numpy as np

    v = len(views)
    mem_views = list(mem_views) if mem_views is not None else list(range(v))
    patch = core.dec_cfg.patch_size

    # per-view positions + encoder tokens, grouped per bucket
    x = [None] * v
    pos = [None] * v
    for shape, ids in group_views_by_shape(views).items():
        imgs = jnp.asarray(np.stack([views[i]["img"] for i in ids]))
        port = jnp.asarray([bool(views[i].get("portrait")) for i in ids])
        p = view_positions(shape, patch, port, batch_shape=(len(ids),))
        toks = core.encode_all(imgs, p, max_bs=encode_bs)
        for j, i in enumerate(ids):
            x[i] = toks[j]
            pos[i] = p[j]

    def n_tokens(i):
        h, w = views[i]["img"].shape[:2]
        return (h // patch) * (w // patch)

    total_tokens = sum(n_tokens(i) for i in mem_views)
    cap = round_capacity(total_tokens + capacity_slack * max(
        n_tokens(i) for i in mem_views), 512)
    mem = init_memory(core.dec_cfg.depth, 1, core.dec_cfg.num_heads,
                      core.dec_cfg.head_dim, cap, dtype=core.mem_dtype)

    # update phase: joint init when the bucket matches, then 1-by-1
    init = mem_views[:init_num_images]
    rest = mem_views[init_num_images:]
    init_shapes = {tuple(views[i]["img"].shape[:2]) for i in init}
    if len(init_shapes) == 1 and len(init) > 1:
        xb = jnp.stack([x[i] for i in init])[None]
        pb = jnp.stack([pos[i] for i in init])[None]
        mem, _ = core.update(mem, xb, pb)
    else:
        for i in init:
            mem, _ = core.update(mem, x[i][None, None], pos[i][None, None])
    # sequential updates over `rest`, scan-fusing each run of consecutive
    # same-shape views (order must be preserved: every update attends to
    # the memory built so far)
    i0 = 0
    while i0 < len(rest):
        shape0 = views[rest[i0]]["img"].shape[:2]
        i1 = i0
        while (i1 < len(rest)
               and views[rest[i1]]["img"].shape[:2] == shape0):
            i1 += 1
        run = rest[i0:i1]
        if fused and len(run) >= 2:
            xs = jnp.stack([x[i] for i in run])
            ps = jnp.stack([pos[i] for i in run])
            mem = core.update_seq(mem, xs, ps, chunk=update_chunk)
        else:
            for i in run:
                mem, _ = core.update(mem, x[i][None, None],
                                     pos[i][None, None])
        i0 = i1

    # render phase per bucket, padded chunks
    results = [None] * v
    for shape, ids in group_views_by_shape(views).items():
        port = jnp.asarray([bool(views[i].get("portrait")) for i in ids])
        for s in range(0, len(ids), render_bs):
            chunk = ids[s:s + render_bs]
            pad = render_bs - len(chunk) if len(ids) > render_bs else 0
            chunk_p = chunk + [chunk[-1]] * pad
            xb = jnp.stack([x[i] for i in chunk_p])[None]
            pb = jnp.stack([pos[i] for i in chunk_p])[None]
            pmask = jnp.asarray([bool(views[i].get("portrait"))
                                 for i in chunk_p])[None]
            if fused:
                out = core.render_post(mem, xb, pb, pmask, shape,
                                       compute_cam=compute_cam)
            else:
                toks = core.render(mem, xb, pb)
                pm = core.head(toks, shape, pmask)
                out = postprocess(pm[0], core.dec_cfg.pointmaps_activation,
                                  compute_cam=compute_cam)
            for j, i in enumerate(chunk):
                results[i] = {k: np.asarray(val[j]) for k, val in
                              out.items()}
    return results


# ---------------------------------------------------------------------------
# Fused single-program pipeline (uniform-AR fast path)
# ---------------------------------------------------------------------------

def make_fused_offline(core: InferenceCore, n_views: int, img_hw,
                       init_num_images: int = 2, compute_cam: bool = True,
                       capacity_block: int = 1024, n_scenes: int = 1,
                       mesh=None):
    """Compile the ENTIRE offline reconstruction into one XLA program:
    encode all views -> init update -> lax.scan of 1-view updates ->
    batched render -> head -> postprocess.

    One device dispatch per collection instead of ~2V: on a tunneled or
    multi-host setup this removes all per-step launch latency, and XLA
    overlaps encode/update phases freely. Uniform aspect-ratio buckets
    only -- the host-loop `offline_reconstruction` handles mixed AR.

    n_scenes > 1 reconstructs that many INDEPENDENT collections per
    dispatch (each with its own memory, riding the batch axis of every
    op): at small per-scene shapes (e.g. 224 2-view) one scene leaves
    the MXU matmuls tiny, so bulk serving should batch scenes --
    `run(imgs[S, V, H, W, 3], portrait[S, V])` -> leading [S, V] outputs.

    mesh (with a 'dp' axis) scales that across chips: scenes shard over
    dp via shard_map, each chip running the full pipeline on its local
    n_scenes/dp collections with no cross-device communication -- the
    multi-chip bulk-serving mode (the reference has no equivalent).
    """
    enc_cfg, dec_cfg = core.enc_cfg, core.dec_cfg
    h, w = img_hw
    n = (h // dec_cfg.patch_size) * (w // dec_cfg.patch_size)
    cap = round_capacity(n_views * n, capacity_block)
    g0 = min(init_num_images, n_views)
    s = n_scenes

    def pipeline(enc_params, dec_params, imgs, pos, portrait):
        # imgs [S, V, H, W, 3], pos [S, V, N, 2], portrait [S, V].
        # S comes from the argument (under shard_map it is the PER-SHARD
        # scene count, not the global n_scenes).
        sl = imgs.shape[0]
        x = encoder_forward(enc_params, enc_cfg,
                            imgs.reshape(sl * n_views, h, w, 3),
                            pos.reshape(sl * n_views, n, 2),
                            dtype=core.enc_dtype, impl=core.impl)
        x = x.reshape(sl, n_views, n, -1)
        mem = init_memory(dec_cfg.depth, sl, dec_cfg.num_heads,
                          dec_cfg.head_dim, cap, dtype=core.mem_dtype)
        mem, _ = decoder_update(dec_params, dec_cfg, mem, x[:, :g0],
                                pos[:, :g0], causal=False,
                                dtype=core.dtype, impl=core.impl)

        if n_views > g0:
            def step(mem, inp):
                xi, pi = inp                    # [S, N, D], [S, N, 2]
                mem, _ = decoder_update(dec_params, dec_cfg, mem,
                                        xi[:, None], pi[:, None],
                                        causal=False, dtype=core.dtype,
                                        impl=core.impl)
                return mem, None

            mem, _ = jax.lax.scan(
                step, mem, (jnp.swapaxes(x[:, g0:], 0, 1),
                            jnp.swapaxes(pos[:, g0:], 0, 1)))

        toks = decoder_render(dec_params, dec_cfg, mem, x, pos,
                              dtype=core.dtype, impl=core.impl)
        pm = decoder_head(dec_params, dec_cfg, toks, (h, w), portrait)
        return postprocess(pm, dec_cfg.pointmaps_activation,
                           compute_cam=compute_cam)

    if mesh is None:
        jitted = jax.jit(pipeline)
    else:
        # Multi-chip bulk serving: scenes ride the mesh 'dp' axis via
        # shard_map -- each chip reconstructs n_scenes/dp collections with
        # the FULL pipeline (Pallas kernels see local shapes), zero
        # cross-device communication. Params are broadcast once by jit.
        from jax.sharding import PartitionSpec as P
        dp = mesh.shape["dp"]
        if n_scenes % dp != 0:
            raise ValueError(
                f"n_scenes={n_scenes} must divide over the dp axis ({dp})")
        jitted = jax.jit(jax.shard_map(
            pipeline, mesh=mesh,
            in_specs=(P(), P(), P("dp"), P("dp"), P("dp")),
            out_specs=P("dp"), check_vma=False))

    def run(imgs, portrait=None):
        scene_dim = imgs.ndim == 5
        if not scene_dim:
            imgs = imgs[None]
        if portrait is None:
            portrait = jnp.zeros((s, n_views), bool)
        elif not scene_dim:
            portrait = jnp.asarray(portrait)[None]
        pos = view_positions(img_hw, enc_cfg.patch_size, portrait,
                             batch_shape=(s, n_views))
        out = jitted(core.enc_params, core.dec_params, imgs, pos, portrait)
        if not scene_dim:
            out = {k: v[0] for k, v in out.items()}
        return out

    # expose the raw (unjitted) pipeline + its non-image args so callers
    # can embed the whole reconstruction inside a larger jitted program
    # (e.g. a lax.scan over many collections: back-to-back serving with
    # ONE dispatch, used by bench.py to time pure device throughput)
    run.pipeline = pipeline
    run.fixed_args = lambda: (
        core.enc_params, core.dec_params,
        view_positions(img_hw, enc_cfg.patch_size,
                       jnp.zeros((s, n_views), bool),
                       batch_shape=(s, n_views)),
        jnp.zeros((s, n_views), bool))
    return run
