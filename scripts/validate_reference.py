"""Accuracy anchoring against the reference model (BASELINE.md north star).

Two modes:

1. **Published checkpoint** (preferred): if a reference `.pth` is available
   (``--ckpt`` or $MUST3R_CKPT), convert it with
   `must3r_tpu.checkpoint.convert_torch_checkpoint` and run the flagship
   pipeline end-to-end, reporting output statistics per bucket. (The
   reference's own forward cannot run here — its dust3r/croco submodule is
   absent from the snapshot and it requires CUDA — so checkpoint mode
   anchors the *converted weights* through our pipeline; metric parity then
   comes from the BASELINE.md eval protocols via eval.py.)

2. **Torch-twin goldens at flagship shapes** (default): build the
   parametrized torch twin (must3r_tpu/testing/torch_twin.py — the
   reference forward semantics with reference state-dict keys) at the
   flagship tower sizes (ViT-L 24x1024 encoder, ViT-B 12x768 decoder,
   reference must3r/model/encoder.py:40-44 + decoder.py:49-52), run
   init(2 views) -> update(1) -> render(3) -> head, freeze the outputs as
   a fixture (tests/fixtures/flagship_golden_<res>.npz), and measure our
   converted pipeline against it:

   - pointmap RMSE (global + local, after norm-exp activation)   [fp32 + bf16]
   - confidence MAE
   - focal relative error + camera pose rotation/translation deltas
     (Weiszfeld + weighted Procrustes applied to both pointmap sets)

   With an existing fixture the torch re-run is skipped unless
   ``--regen``; validation then needs no torch at all.

Writes/updates PARITY_NUMBERS.md. Run: ``python scripts/validate_reference.py``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")

# Flagship tower sizes (reference must3r/model/encoder.py:40-44,
# decoder.py:49-52): ViT-L encoder, ViT-B decoder, 16px patches, RoPE100.
D_ENC, ENC_DEPTH, ENC_HEADS = 1024, 24, 16
D_DEC, DEC_DEPTH, DEC_HEADS = 768, 12, 12
P = 16
N_VIEWS = 4   # 0..2 drive the offline path; all 4 drive causal/video
SEED = 0


def _shapes(res):
    return {"224": (224, 224), "512": (384, 512)}[str(res)]


def fixture_path(res):
    return os.path.join(FIXTURE_DIR, f"flagship_golden_{res}.npz")


def generate_fixture(res):
    """Run the flagship-shape torch twin and freeze its outputs."""
    import torch

    from must3r_tpu.testing.torch_twin import (
        TorchDecoder,
        TorchEncoder,
        torch_decoder_forward,
        torch_encoder_forward,
        torch_head,
    )

    h, w = _shapes(res)
    n = (h // P) * (w // P)
    torch.manual_seed(SEED)
    tenc = TorchEncoder(D_ENC, ENC_DEPTH, ENC_HEADS, P).eval()
    tdec = TorchDecoder(D_ENC, D_DEC, DEC_DEPTH, DEC_HEADS, P).eval()

    rng = np.random.default_rng(SEED)
    imgs = rng.standard_normal((N_VIEWS, h, w, 3)).astype(np.float32)
    pos = _positions(h, w)  # [N, 2]

    from must3r_tpu.testing.torch_twin import (
        torch_decoder_refine,
        torch_mem_evict,
        torch_mem_relabel,
    )

    t0 = time.time()
    with torch.no_grad():
        tpos = torch.from_numpy(pos)[None].expand(N_VIEWS, n, 2)
        x = torch_encoder_forward(tenc, torch.from_numpy(imgs), tpos)
        xb = x[None]                                    # [1, V, N, D]
        pb = tpos[None]
        # offline path: init(2) -> update(1) -> render(views 0..2)
        mem, _ = torch_decoder_forward(tdec, xb[:, :2], pb[:, :2])
        mem, _ = torch_decoder_forward(tdec, xb[:, 2:3], pb[:, 2:3], mem)
        _, toks = torch_decoder_forward(tdec, xb[:, :3], pb[:, :3], mem,
                                        render=True)
        pm = torch_head(tdec, toks, (h, w))             # [1, 3, H, W, 7]
        # causal training blocks (2+2) -> render all 4
        memc, _ = torch_decoder_forward(tdec, xb[:, :2], pb[:, :2],
                                        causal=True)
        memc, _ = torch_decoder_forward(tdec, xb[:, 2:], pb[:, 2:], memc,
                                        causal=True)
        _, tc = torch_decoder_forward(tdec, xb, pb, memc, render=True)
        pm_causal = torch_head(tdec, tc, (h, w))
        # refinement of image label 1 on the offline memory
        memr, _ = torch_decoder_refine(tdec, xb[:, 1:2], pb[:, 1:2], mem,
                                       [1])
        _, trf = torch_decoder_forward(tdec, xb[:, :3], pb[:, :3], memr,
                                       render=True)
        pm_refine = torch_head(tdec, trf, (h, w))
        # video: frames 0..2 one-by-one, evict label 1 (non-keyframe),
        # frame 3 update, relabel 3 -> 1, render all
        memv = None
        for i in range(3):
            memv, _ = torch_decoder_forward(tdec, xb[:, i:i + 1],
                                            pb[:, i:i + 1], memv)
        memv = torch_mem_evict(memv, 1)
        memv, _ = torch_decoder_forward(tdec, xb[:, 3:4], pb[:, 3:4], memv)
        memv = torch_mem_relabel(memv, 3, 1)
        _, tv = torch_decoder_forward(tdec, xb, pb, memv, render=True)
        pm_video = torch_head(tdec, tv, (h, w))
    print(f"torch twin forward ({res}): {time.time() - t0:.1f}s")

    sd_enc = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd_dec = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    wsum = sum(float(np.abs(v).sum()) for v in sd_enc.values()) + \
        sum(float(np.abs(v).sum()) for v in sd_dec.values())

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    # store float32 (fp16 would add a ~1e-3 relative quantization floor,
    # swamping the converter's true parity); subsample pixels/tokens to
    # keep the checked-in fixture small (<1 MB compressed)
    np.savez_compressed(
        fixture_path(res),
        pm=pm[0].numpy()[:, ::4, ::4].astype(np.float32),
        pm_causal=pm_causal[0].numpy()[:, ::4, ::4].astype(np.float32),
        pm_refine=pm_refine[0].numpy()[:, ::4, ::4].astype(np.float32),
        pm_video=pm_video[0].numpy()[:, ::4, ::4].astype(np.float32),
        enc_tokens=x.numpy()[:, ::29].astype(np.float32),
        weight_abssum=np.float64(wsum),
        seed=SEED, n_views=N_VIEWS, res=str(res))
    return sd_enc, sd_dec


def _positions(h, w):
    from must3r_tpu.ops.patch import patchify_positions
    return np.asarray(patchify_positions(h // P, w // P))


def twin_params(res):
    """Rebuild the torch twin weights (deterministic seed) and convert."""
    import torch

    from must3r_tpu.checkpoint import (
        convert_decoder_state_dict,
        convert_encoder_state_dict,
    )
    from must3r_tpu.config import (
        DecoderConfig,
        EncoderConfig,
        FeedbackType,
        MemoryMode,
    )
    from must3r_tpu.testing.torch_twin import TorchDecoder, TorchEncoder

    h, w = _shapes(res)
    torch.manual_seed(SEED)
    tenc = TorchEncoder(D_ENC, ENC_DEPTH, ENC_HEADS, P).eval()
    tdec = TorchDecoder(D_ENC, D_DEC, DEC_DEPTH, DEC_HEADS, P).eval()
    sd_enc = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd_dec = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}

    enc_cfg = EncoderConfig(img_size=(h, w), patch_size=P, embed_dim=D_ENC,
                            depth=ENC_DEPTH, num_heads=ENC_HEADS)
    dec_cfg = DecoderConfig(img_size=(h, w), enc_embed_dim=D_ENC,
                            patch_size=P, embed_dim=D_DEC,
                            output_dim=P * P * 7, depth=DEC_DEPTH,
                            num_heads=DEC_HEADS,
                            feedback=FeedbackType.SINGLE_MLP,
                            memory_mode=MemoryMode.KV)
    params = {"encoder": convert_encoder_state_dict(sd_enc, enc_cfg),
              "decoder": convert_decoder_state_dict(sd_dec, dec_cfg)}
    wsum = sum(float(np.abs(v).sum()) for v in sd_enc.values()) + \
        sum(float(np.abs(v).sum()) for v in sd_dec.values())
    return params, enc_cfg, dec_cfg, wsum


def run_ours(params, enc_cfg, dec_cfg, res, dtype_name, imgs_np=None):
    """All four anchored paths through our pipeline: offline
    (init2+update1+render3), causal training blocks, refinement, and a
    video evict/relabel sequence. Returns (enc_tokens, dict of pm).

    imgs_np: optional [N_VIEWS, H, W, 3] images; defaults to the seeded
    noise the torch-twin fixtures were generated with."""
    import jax
    import jax.numpy as jnp

    from must3r_tpu.memory import (
        evict_label,
        init_memory,
        relabel,
        round_capacity,
    )
    from must3r_tpu.models import (
        decoder_head,
        decoder_render,
        decoder_update,
        encoder_forward,
    )
    from must3r_tpu.models.decoder import decoder_refine

    h, w = _shapes(res)
    n = (h // P) * (w // P)
    dtype = jnp.dtype(dtype_name)
    # fp32 parity rows measure the converter, not the backend's matmul
    # shortcuts: at DEFAULT precision XLA runs fp32 matmuls with bf16
    # passes (~1e-2 relative), masking true parity
    jax.config.update("jax_default_matmul_precision",
                      "highest" if dtype_name == "float32" else "default")
    if imgs_np is None:
        rng = np.random.default_rng(SEED)
        imgs_np = rng.standard_normal((N_VIEWS, h, w, 3))
    imgs = jnp.asarray(imgs_np, jnp.float32)
    pos = jnp.broadcast_to(jnp.asarray(_positions(h, w)), (N_VIEWS, n, 2))

    impl = "chunked" if dtype_name == "float32" else None

    cap = round_capacity(8 * n, 512)

    def fresh():
        return init_memory(dec_cfg.depth, 1, dec_cfg.num_heads,
                           dec_cfg.head_dim, cap, dtype=dtype)

    def make_path(body):
        # one jit PER PATH: a single program holding all four paths
        # exceeds the remote compile service's request size limit
        @jax.jit
        def f(params, x):
            # dec must come from the ARGUMENT: closing over the decoder
            # pytree embeds every weight as an HLO literal (~1 GB program;
            # the remote compile service rejects it with HTTP 413)
            dec = params["decoder"]
            xb, pb = x[None], pos[None]

            def upd(mem, sl, causal=False):
                return decoder_update(dec, dec_cfg, mem, xb[:, sl],
                                      pb[:, sl], causal=causal,
                                      dtype=dtype, impl=impl)[0]

            def rend(mem, sl):
                toks = decoder_render(dec, dec_cfg, mem, xb[:, sl],
                                      pb[:, sl], dtype=dtype, impl=impl)
                return decoder_head(dec, dec_cfg, toks, (h, w))[0]

            return body(dec, xb, pb, upd, rend)

        return f

    all_v = slice(0, N_VIEWS)

    def p_offline(dec, xb, pb, upd, rend):
        mem = upd(fresh(), slice(0, 2))
        mem = upd(mem, slice(2, 3))
        return rend(mem, slice(0, 3)), mem

    def p_causal(dec, xb, pb, upd, rend):
        memc = upd(fresh(), slice(0, 2), causal=True)
        memc = upd(memc, slice(2, 4), causal=True)
        return rend(memc, all_v)

    def p_refine(dec, xb, pb, upd, rend):
        mem = upd(fresh(), slice(0, 2))
        mem = upd(mem, slice(2, 3))
        memr, _ = decoder_refine(dec, dec_cfg, mem, xb[:, 1:2],
                                 pb[:, 1:2], jnp.asarray([1]),
                                 dtype=dtype, impl=impl)
        return rend(memr, slice(0, 3))

    def p_video(dec, xb, pb, upd, rend):
        memv = fresh()
        for i in range(3):
            memv = upd(memv, slice(i, i + 1))
        memv = evict_label(memv, 1)
        memv = upd(memv, slice(3, 4))
        memv = relabel(memv, 3, 1)
        return rend(memv, all_v)

    enc = jax.jit(lambda p: encoder_forward(p["encoder"], enc_cfg, imgs,
                                            pos, dtype=dtype, impl=impl))
    x = enc(params)
    pm, _ = make_path(p_offline)(params, x)
    pms = {"pm": pm,
           "pm_causal": make_path(p_causal)(params, x),
           "pm_refine": make_path(p_refine)(params, x),
           "pm_video": make_path(p_video)(params, x)}
    return np.asarray(x), {k: np.asarray(v) for k, v in pms.items()}


def compare(pm_ours, pm_gold, res):
    """Parity metrics between two [V, H', W', 7] raw head outputs."""
    import jax.numpy as jnp

    from must3r_tpu.engine.inference import postprocess

    po = postprocess(jnp.asarray(pm_ours, jnp.float32), compute_cam=True)
    pg = postprocess(jnp.asarray(pm_gold, jnp.float32), compute_cam=True)

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))

    rot_ours = np.asarray(po["c2w"])[:, :3, :3]
    rot_gold = np.asarray(pg["c2w"])[:, :3, :3]
    rel = np.einsum("vij,vkj->vik", rot_ours, rot_gold)
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot_deg = np.degrees(np.arccos(tr))

    scale = float(np.mean(np.linalg.norm(np.asarray(pg["pts3d"]), axis=-1)))
    gf = np.asarray(pg["focal"])
    return {
        "raw_head_rmse": rmse(pm_ours, pm_gold),
        "pts3d_rmse": rmse(po["pts3d"], pg["pts3d"]),
        "pts3d_local_rmse": rmse(po["pts3d_local"], pg["pts3d_local"]),
        "pts3d_scale": scale,
        "conf_mae": float(np.mean(np.abs(np.asarray(po["conf"]) -
                                         np.asarray(pg["conf"])))),
        "focal_rel_err": float(np.max(np.abs(
            np.asarray(po["focal"]) - gf)
            / np.maximum(np.abs(gf), 1e-6))),
        # conditioning indicator: when the golden focal itself is ~0
        # (untrained/underfit net), focal_rel_err is meaningless
        "focal_gold_mean": float(np.mean(np.abs(gf))),
        "pose_rot_deg_max": float(rot_deg.max()),
        "pose_t_max": float(np.abs(np.asarray(po["c2w"])[:, :3, 3] -
                                   np.asarray(pg["c2w"])[:, :3, 3]).max()),
    }


def validate_twin(res, regen=False):
    path = fixture_path(res)
    if regen or not os.path.exists(path):
        print(f"generating flagship golden fixture ({res})...")
        generate_fixture(res)
    fx = np.load(path)

    params, enc_cfg, dec_cfg, wsum = twin_params(res)
    drift = abs(wsum - float(fx["weight_abssum"])) / float(
        fx["weight_abssum"])
    if drift > 1e-6:
        print(f"WARNING: torch RNG drift vs fixture ({drift:.2e}); "
              "comparing against the FROZEN fixture outputs")

    rows = {}
    for dtype_name in ("float32", "bfloat16"):
        x, pms = run_ours(params, enc_cfg, dec_cfg, res, dtype_name)
        for key in ("pm", "pm_causal", "pm_refine", "pm_video"):
            gold = fx[key].astype(np.float32)
            name = (dtype_name if key == "pm"
                    else f"{dtype_name} {key[3:]}")
            rows[name] = compare(pms[key][:, ::4, ::4], gold, res)
        enc_err = float(np.max(np.abs(
            x[:, ::29] - fx["enc_tokens"].astype(np.float32))))
        rows[dtype_name]["enc_tokens_max_abs_err"] = enc_err
    return rows


def _bf16_vs_fp32_rows(params, enc_cfg, dec_cfg, res, tag="",
                       imgs_np=None):
    x, pms = run_ours(params, enc_cfg, dec_cfg, res, "float32",
                      imgs_np=imgs_np)
    x2, pms2 = run_ours(params, enc_cfg, dec_cfg, res, "bfloat16",
                        imgs_np=imgs_np)
    return {f"bf16_vs_fp32{tag} {k}": compare(pms2[k][:, ::4, ::4],
                                              pms[k][:, ::4, ::4], res)
            for k in pms}


def _synthetic_views(res, full=False):
    """In-distribution images for trained-weights anchors: a trained net
    fed pure noise predicts a degenerate (near-zero) focal, making
    focal_rel_err ill-conditioned all over again.

    full=True also returns the GT side: per-view focal (pixels, from the
    bucket-rescaled intrinsics), camera-frame GT pointmaps, and validity
    masks -- the inputs for the predicted-vs-GT focal anchor."""
    from must3r_tpu.datasets import SyntheticScenes

    h, w = _shapes(res)
    ds = SyntheticScenes(num_views=N_VIEWS, resolutions=((w, h),),
                         epoch_size=4, render_hw=(h, w), seed=3)
    views = ds[(0, 0, N_VIEWS)]
    imgs = np.stack([v["img"] for v in views]).astype(np.float32)
    if not full:
        return imgs
    pts_cam = []
    for v in views:
        w2c = np.linalg.inv(v["camera_pose"].astype(np.float64))
        pw = v["pts3d"].reshape(-1, 3).astype(np.float64)
        pc = pw @ w2c[:3, :3].T + w2c[:3, 3]
        pts_cam.append(pc.reshape(v["pts3d"].shape).astype(np.float32))
    gt = {
        "focal": np.asarray([v["camera_intrinsics"][0, 0] for v in views],
                            np.float32),
        "pts3d_cam": np.stack(pts_cam),
        "valid": np.stack([v["valid_mask"] for v in views]),
    }
    return imgs, gt


def validate_focal_gt(path, res):
    """Predicted-vs-GT focal on trained weights (VERDICT r3 next #3).

    The synthetic GT has known intrinsics, so this measures the PRODUCTION
    focal path -- raw head -> norm-exp -> Weiszfeld IRLS
    (`engine/inference.py::postprocess`, parity target reference
    `must3r/engine/inference.py:28-46`) -- against the true focal, per
    inference path. The same recovery run on the GT camera-frame pointmaps
    gives the protocol floor (Weiszfeld + principal-point-at-center bias,
    independent of the net): the net's focal error should be read against
    that floor, not against zero."""
    import dataclasses

    import jax.numpy as jnp

    from must3r_tpu.checkpoint import load_checkpoint
    from must3r_tpu.engine.inference import postprocess
    from must3r_tpu.ops.pose import estimate_focal_weiszfeld

    params, enc_cfg, dec_cfg, _, _ = load_checkpoint(path)
    dec_cfg = dec_cfg.inference_variant()
    h, w = _shapes(res)
    enc_cfg = dataclasses.replace(enc_cfg, img_size=(h, w))
    dec_cfg = dataclasses.replace(dec_cfg, img_size=(h, w))
    imgs, gt = _synthetic_views(res, full=True)

    # protocol floor: Weiszfeld on the GT camera-frame points (sky/invalid
    # zeroed out -- z=0 rows drop out of the IRLS the same way the net's
    # own sky predictions do)
    pts_gt = np.where(gt["valid"][..., None], gt["pts3d_cam"], 0.0)
    f_oracle = np.asarray(estimate_focal_weiszfeld(jnp.asarray(pts_gt)))

    rows = {}
    for dtype_name in ("float32", "bfloat16"):
        _, pms = run_ours(params, enc_cfg, dec_cfg, res, dtype_name,
                          imgs_np=imgs)
        for k, pm in pms.items():
            po = postprocess(jnp.asarray(pm, jnp.float32), compute_cam=True)
            f_pred = np.asarray(po["focal"])
            f_gt = gt["focal"][: f_pred.shape[0]]
            f_orc = f_oracle[: f_pred.shape[0]]
            rows[f"{dtype_name} {k}"] = {
                "focal_gt_px": float(f_gt.mean()),
                "focal_pred_px": float(f_pred.mean()),
                "focal_vs_gt_rel": float(
                    np.mean(np.abs(f_pred - f_gt) / f_gt)),
                "focal_oracle_px": float(f_orc.mean()),
                "focal_oracle_rel": float(
                    np.mean(np.abs(f_orc - f_gt) / f_gt)),
                "focal_vs_oracle_rel": float(
                    np.mean(np.abs(f_pred - f_orc) / f_orc)),
            }
    return rows


def validate_checkpoint(ckpt, res):
    from must3r_tpu.checkpoint import convert_torch_checkpoint
    params, enc_cfg, dec_cfg = convert_torch_checkpoint(ckpt)
    return _bf16_vs_fp32_rows(params, enc_cfg, dec_cfg, res)


def validate_native_checkpoint(path, res):
    """bf16-vs-fp32 production-path anchor on TRAINED weights (a native
    checkpoint, e.g. the flagship learning demo's): the trained net
    predicts a non-degenerate focal, so focal/pose deltas are
    well-conditioned -- unlike the random-weight twin rows (VERDICT r2
    'What's weak' #3)."""
    import dataclasses

    from must3r_tpu.checkpoint import load_checkpoint

    params, enc_cfg, dec_cfg, _, _ = load_checkpoint(path)
    dec_cfg = dec_cfg.inference_variant()
    h, w = _shapes(res)
    enc_cfg = dataclasses.replace(enc_cfg, img_size=(h, w))
    dec_cfg = dataclasses.replace(dec_cfg, img_size=(h, w))
    return _bf16_vs_fp32_rows(params, enc_cfg, dec_cfg, res,
                              tag=" (trained)",
                              imgs_np=_synthetic_views(res))


def write_report(results, out_path, append=False):
    if append:
        # idempotent: drop any previously-appended section with the SAME
        # heading first, so re-runs replace their own table without
        # clobbering other appended sections (a partial roundup must not
        # lose the focal-vs-GT table while regenerating the trained one)
        import re

        try:
            txt = open(out_path).read()
        except FileNotFoundError:
            txt = ""
        for key in results:
            pat = re.compile(
                r"\n<!-- appended by validate_reference\.py -->\n\n## "
                + re.escape(key) + r"\n.*?(?=\n<!-- appended|\Z)", re.S)
            txt = pat.sub("", txt)
        with open(out_path, "w") as f:
            f.write(txt)
        lines = ["", "<!-- appended by validate_reference.py -->", ""]
        for key, rows in results.items():
            lines.append(f"## {key}")
            lines.append("")
            cols = ["raw_head_rmse", "pts3d_rmse", "pts3d_local_rmse",
                    "pts3d_scale", "conf_mae", "focal_rel_err",
                    "focal_gold_mean", "pose_rot_deg_max", "pose_t_max"]
            first = next(iter(rows.values()))
            if not any(c in first for c in cols):     # focal-vs-GT tables
                cols = list(first)
            lines.append("| path | " + " | ".join(cols) + " |")
            lines.append("|---|" + "---|" * len(cols))
            for name, m in rows.items():
                vals = [f"{m[c]:.3e}" if c in m else "-" for c in cols]
                lines.append(f"| {name} | " + " | ".join(vals) + " |")
            lines.append("")
        with open(out_path, "a") as f:
            f.write("\n".join(lines))
        print(f"appended to {out_path}")
        return
    lines = [
        "# PARITY_NUMBERS — measured accuracy anchors",
        "",
        "Produced by `python scripts/validate_reference.py`. Golden source:"
        " the flagship-shape torch twin (reference forward semantics +"
        " reference state-dict keys, `must3r_tpu/testing/torch_twin.py`),"
        " frozen as `tests/fixtures/flagship_golden_*.npz`. The published"
        " `MUSt3R_512.pth` cannot be fetched in this environment; when it"
        " is available, rerun with `--ckpt` (the converter is identical).",
        "",
        "Fixture outputs are stored in float32 (no quantization floor"
        " added by storage). 'fp32' rows measure"
        " converter+pipeline parity (matmuls forced to true fp32 — at"
        " DEFAULT precision XLA computes fp32 matmuls with bf16 passes);"
        " 'bfloat16' rows measure the production compute path. Pointmap"
        " RMSEs are in golden-output units; see pts3d_scale for the mean"
        " point norm (RMSE/scale = relative error). Pose metrics apply"
        " Weiszfeld focal + confidence-weighted Procrustes (ops/pose.py)"
        " to both pointmap sets; NOTE: focal_rel_err is only meaningful"
        " when focal_gold_mean is non-degenerate — an untrained (or"
        " short-demo-trained) net predicts a near-zero focal, so for"
        " those rows pointmap RMSE, conf MAE and the pose deltas are the"
        " production anchors. The '(trained)' rows (learning-demo"
        " weights on in-distribution synthetic views,"
        " --native_ckpt) give well-conditioned pose anchors;"
        " fully-trained weights (the published .pth) will condition the"
        " focal row too.",
        "",
    ]
    for key, rows in results.items():
        lines.append(f"## {key}")
        lines.append("")
        cols = ["raw_head_rmse", "pts3d_rmse", "pts3d_local_rmse", "pts3d_scale", "conf_mae",
                "focal_rel_err", "pose_rot_deg_max", "pose_t_max",
                "enc_tokens_max_abs_err"]
        lines.append("| path | " + " | ".join(cols) + " |")
        lines.append("|---|" + "---|" * len(cols))
        for name, m in rows.items():
            vals = [f"{m[c]:.3e}" if c in m else "-" for c in cols]
            lines.append(f"| {name} | " + " | ".join(vals) + " |")
        lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.environ.get("MUST3R_CKPT"))
    ap.add_argument("--native_ckpt", default=None,
                    help="native checkpoint dir (trained weights) for a"
                         " well-conditioned bf16-vs-fp32 anchor")
    ap.add_argument("--focal_gt", action="store_true",
                    help="with --native_ckpt: predicted-vs-GT focal anchor"
                         " (synthetic GT intrinsics + Weiszfeld floor)")
    ap.add_argument("--res", nargs="+", default=["224", "512"])
    ap.add_argument("--regen", action="store_true",
                    help="regenerate the torch-twin fixtures")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_NUMBERS.md"))
    args = ap.parse_args()

    results = {}
    for res in args.res:
        if args.native_ckpt and args.focal_gt:
            results[f"focal vs GT @{res} (trained ckpt, synthetic"
                    f" intrinsics)"] = validate_focal_gt(args.native_ckpt,
                                                         res)
        elif args.native_ckpt:
            results[f"native trained checkpoint @{res}"] = \
                validate_native_checkpoint(args.native_ckpt, res)
        elif args.ckpt and os.path.exists(args.ckpt):
            results[f"checkpoint {os.path.basename(args.ckpt)} @{res}"] = \
                validate_checkpoint(args.ckpt, res)
        else:
            results[f"torch-twin flagship @{res} "
                    f"({N_VIEWS} views, init2+update1+render3)"] = \
                validate_twin(res, regen=args.regen)
    write_report(results, args.out, append=bool(args.native_ckpt))
    for key, rows in results.items():
        print(key)
        for name, m in rows.items():
            print(f"  {name}: " + ", ".join(f"{k}={v:.3e}"
                                            for k, v in m.items()))


if __name__ == "__main__":
    main()
