"""Checkpointing: orbax-backed native checkpoints + torch converter.

Replaces the reference's pickle-based flow (`must3r/engine/io.py`,
`must3r/model/__init__.py:30-63`): instead of `eval()`ing constructor
strings stored in the checkpoint, configs are serialized as JSON
(self-describing without arbitrary code execution); params/optimizer are
pytrees saved with orbax.

`convert_torch_checkpoint` maps a reference `.pth` state-dict (key names
documented in SURVEY.md §2.2: `blocks_enc.*`, `blocks_dec.*`,
`feat_embed_enc_to_dec`, `cross_attn.proj{q,k,v}`, `head_dec.proj`,
`feedback_layer`, ...) onto our pytree layout so published MUSt3R weights
run on TPU unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from must3r_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    config_from_json,
    config_to_json,
    decoder_config_from_arg_string,
    encoder_config_from_arg_string,
)


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params, enc_cfg: EncoderConfig,
                    dec_cfg: DecoderConfig, opt_state=None,
                    step: int = 0, extra: Optional[Dict[str, Any]] = None):
    """Write a self-describing checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = {
        "encoder_config": config_to_json(enc_cfg),
        "decoder_config": config_to_json(dec_cfg),
        "step": step,
        **(extra or {}),
    }
    ckptr = ocp.PyTreeCheckpointer()
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    # multi-process: every rank must enter (orbax barriers internally);
    # orbax writes replicated/host-local data from the primary host only
    ckptr.save(os.path.join(path, "state"), tree, force=True)
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str, template=None):
    """Returns (params, enc_cfg, dec_cfg, opt_state_or_None, meta).

    Pass ``template`` = {'params': ..., 'opt_state': ...} (live pytrees) to
    restore into the exact container types (e.g. optax NamedTuple states);
    without it, orbax returns plain nested dicts/lists."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.join(path, "state"), item=template)
    enc_cfg = config_from_json(meta["encoder_config"])
    dec_cfg = config_from_json(meta["decoder_config"])
    opt_state = tree.get("opt_state") if isinstance(tree, dict) else None
    return (tree["params"], enc_cfg, dec_cfg, opt_state, meta)


def save_params_npz(path: str, params, enc_cfg: EncoderConfig,
                    dec_cfg: DecoderConfig, dtype=np.float16):
    """Single-file portable param bundle (no orbax, no opt state): float
    leaves stored as ``dtype`` (fp16 halves the file; eval/serving runs
    bf16 anyway), configs as JSON inside the archive. Small enough to
    commit a trained demo net as a regression-anchor fixture."""
    flat = {"__enc_cfg__": np.frombuffer(
        config_to_json(enc_cfg).encode(), dtype=np.uint8),
        "__dec_cfg__": np.frombuffer(
        config_to_json(dec_cfg).encode(), dtype=np.uint8)}
    for path_elems, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        # dict-keyed trees only: a list/tuple container would flatten to
        # integer path parts here but reload as dict keys ("0", "1"),
        # silently changing the tree structure
        assert all(hasattr(p, "key") for p in path_elems), (
            f"save_params_npz supports dict pytrees only, got {path_elems}")
        key = "/".join(str(p.key) for p in path_elems)
        a = np.asarray(leaf)
        flat["p:" + key] = a.astype(dtype) if a.dtype == np.float32 else a
    np.savez_compressed(path, **flat)


def load_params_npz(path: str):
    """Returns (params, enc_cfg, dec_cfg) from a save_params_npz bundle;
    float leaves come back float32."""
    blob = np.load(path)
    enc_cfg = config_from_json(bytes(blob["__enc_cfg__"]).decode())
    dec_cfg = config_from_json(bytes(blob["__dec_cfg__"]).decode())
    params: Dict[str, Any] = {}
    for key in blob.files:
        if not key.startswith("p:"):
            continue
        node = params
        parts = key[2:].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        a = blob[key]
        node[parts[-1]] = jnp.asarray(
            a.astype(np.float32) if a.dtype == np.float16 else a)
    return params, enc_cfg, dec_cfg


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Auto-resume hook (reference train.py:241-243): newest checkpoint-*
    directory under output_dir, or None."""
    if not os.path.isdir(output_dir):
        return None
    cands = [d for d in os.listdir(output_dir)
             if d.startswith("checkpoint-")
             and os.path.isfile(os.path.join(output_dir, d, "meta.json"))]
    if not cands:
        return None

    def key(d):
        tag = d.split("-", 1)[1]
        return (1, int(tag)) if tag.isdigit() else (2, 0)

    return os.path.join(output_dir, max(cands, key=key))


# ---------------------------------------------------------------------------
# Torch state-dict conversion
# ---------------------------------------------------------------------------

def _t(sd, key):
    """torch Linear weight [out, in] -> our [in, out]."""
    return jnp.asarray(np.asarray(sd[key]).T)


def _v(sd, key):
    return jnp.asarray(np.asarray(sd[key]))


def _ln(sd, prefix):
    return {"scale": _v(sd, prefix + ".weight"),
            "bias": _v(sd, prefix + ".bias")}


def _lin(sd, prefix):
    p = {"w": _t(sd, prefix + ".weight")}
    if prefix + ".bias" in sd:
        p["b"] = _v(sd, prefix + ".bias")
    return p


def _mlp(sd, prefix):
    return {"fc1": _lin(sd, prefix + ".fc1"),
            "fc2": _lin(sd, prefix + ".fc2")}


def _stack(blocks):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def convert_encoder_state_dict(sd: Dict[str, Any], cfg: EncoderConfig):
    """Reference `Dust3rEncoder` state-dict -> encoder pytree.

    The conv patch-embed [D, 3, P, P] flattens (c, i, j)-major, exactly the
    feature order of ops.patch.patchify_image."""
    w = np.asarray(sd["patch_embed.proj.weight"])
    d = w.shape[0]
    patch_embed = {"w": jnp.asarray(w.reshape(d, -1).T),
                   "b": _v(sd, "patch_embed.proj.bias")}
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks_enc.{i}"
        blocks.append({
            "norm1": _ln(sd, f"{p}.norm1"),
            "attn": {"qkv": _lin(sd, f"{p}.attn.qkv"),
                     "proj": _lin(sd, f"{p}.attn.proj")},
            "norm2": _ln(sd, f"{p}.norm2"),
            "mlp": _mlp(sd, f"{p}.mlp"),
        })
    return {"patch_embed": patch_embed, "blocks": _stack(blocks),
            "norm": _ln(sd, "norm_enc")}


def convert_decoder_state_dict(sd: Dict[str, Any], cfg: DecoderConfig):
    """Reference `MUSt3R`/`CausalMUSt3R` state-dict -> decoder pytree."""
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks_dec.{i}"
        blocks.append({
            "norm1": _ln(sd, f"{p}.norm1"),
            "attn": {"qkv": _lin(sd, f"{p}.attn.qkv"),
                     "proj": _lin(sd, f"{p}.attn.proj")},
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm_y": _ln(sd, f"{p}.norm_y"),
            "projq": _lin(sd, f"{p}.cross_attn.projq"),
            "projk": _lin(sd, f"{p}.cross_attn.projk"),
            "projv": _lin(sd, f"{p}.cross_attn.projv"),
            "proj_ca": _lin(sd, f"{p}.cross_attn.proj"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "mlp": _mlp(sd, f"{p}.mlp"),
        })
    params = {
        "feat_embed": _lin(sd, "feat_embed_enc_to_dec"),
        "image2_embed": _v(sd, "image2_embed").reshape(-1),
        "blocks": _stack(blocks),
        "norm_dec": _ln(sd, "norm_dec"),
        "head_proj": _lin(sd, "head_dec.proj"),
    }
    if "feedback_layer.fc1.weight" in sd:
        params["feedback"] = _mlp(sd, "feedback_layer")
        params["feedback_norm"] = _ln(sd, "feedback_norm")
    elif "feedback_layer.weight" in sd:
        params["feedback"] = _lin(sd, "feedback_layer")
        params["feedback_norm"] = _ln(sd, "feedback_norm")
    return params


_DUST3R_RENAMES = (
    # dust3r/croco key prefix -> must3r prefix (reference
    # encoder.py:54-65, decoder.py:83-96 from_dust3r/from_croco)
    ("enc_blocks.", "blocks_enc."),
    ("enc_norm.", "norm_enc."),
    ("dec_blocks.", "blocks_dec."),
    ("decoder_embed.", "feat_embed_enc_to_dec."),
    ("dec_norm.", "norm_dec."),
    ("downstream_head.proj.", "head_dec.proj."),
)


def rename_dust3r_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for old, new in _DUST3R_RENAMES:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def init_from_dust3r(path: str, enc_cfg: EncoderConfig,
                     dec_cfg: DecoderConfig, key=None,
                     load_head: bool = False):
    """Initialize encoder+decoder from a dust3r/croco checkpoint
    (training warm start; reference train.py:274-293). Keys are remapped;
    parameters the reference model lacks (norm_y, cross-attn projections
    renamed, feedback, head) keep their fresh initialization -- mirroring
    the reference's strict=False load."""
    import jax
    import torch

    from must3r_tpu.models import init_decoder, init_encoder

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = rename_dust3r_keys({k: v.float().numpy() for k, v in sd.items()})

    # encoder is fully covered by dust3r checkpoints
    try:
        params["encoder"] = convert_encoder_state_dict(sd, enc_cfg)
        enc_loaded = True
    except KeyError:
        enc_loaded = False

    # decoder: merge whatever keys exist (dust3r decoder lacks norm_y and
    # uses a joint cross-attn naming; missing pieces stay fresh)
    dec_loaded = 0
    dec = params["decoder"]
    if "feat_embed_enc_to_dec.weight" in sd:
        dec["feat_embed"] = _lin(sd, "feat_embed_enc_to_dec")
        dec_loaded += 1
    if "norm_dec.weight" in sd:
        dec["norm_dec"] = _ln(sd, "norm_dec")
        dec_loaded += 1
    if load_head and "head_dec.proj.weight" in sd:
        dec["head_proj"] = _lin(sd, "head_dec.proj")
        dec_loaded += 1
    blocks = None
    try:
        blocks = convert_decoder_state_dict(sd, dec_cfg)["blocks"]
    except KeyError:
        pass
    if blocks is not None:
        dec["blocks"] = blocks
        dec_loaded += 1
    return params, {"encoder_loaded": enc_loaded,
                    "decoder_parts_loaded": dec_loaded}


# ---------------------------------------------------------------------------
# Export: our pytree -> reference torch state dicts (the inverse of the
# converters above). Proves the key mapping both ways -- when the published
# MUSt3R_512.pth arrives, import->export->import round-trips bit-exactly
# (tests/test_checkpoint.py) -- and lets TPU-trained weights run in the
# reference codebase (reference load path: model/__init__.py:30-48).
# ---------------------------------------------------------------------------

def _unstack(blocks, depth: int):
    return [jax.tree.map(lambda a: np.asarray(a[i]), blocks)
            for i in range(depth)]


def _exp_lin(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"]).T.copy()
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"]).copy()


def _exp_ln(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"]).copy()
    sd[prefix + ".bias"] = np.asarray(p["bias"]).copy()


def _exp_mlp(sd, prefix, p):
    _exp_lin(sd, prefix + ".fc1", p["fc1"])
    _exp_lin(sd, prefix + ".fc2", p["fc2"])


def export_encoder_state_dict(params, cfg: EncoderConfig) -> Dict[str, Any]:
    """Encoder pytree -> reference `Dust3rEncoder` state-dict (numpy)."""
    sd: Dict[str, Any] = {}
    w = np.asarray(params["patch_embed"]["w"])      # [3*P*P, D]
    p_sz = cfg.patch_size
    sd["patch_embed.proj.weight"] = w.T.reshape(
        cfg.embed_dim, 3, p_sz, p_sz).copy()
    sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["b"])
    for i, blk in enumerate(_unstack(params["blocks"], cfg.depth)):
        p = f"blocks_enc.{i}"
        _exp_ln(sd, f"{p}.norm1", blk["norm1"])
        _exp_lin(sd, f"{p}.attn.qkv", blk["attn"]["qkv"])
        _exp_lin(sd, f"{p}.attn.proj", blk["attn"]["proj"])
        _exp_ln(sd, f"{p}.norm2", blk["norm2"])
        _exp_mlp(sd, f"{p}.mlp", blk["mlp"])
    _exp_ln(sd, "norm_enc", params["norm"])
    return sd


def export_decoder_state_dict(params, cfg: DecoderConfig) -> Dict[str, Any]:
    """Decoder pytree -> reference `MUSt3R` state-dict (numpy)."""
    sd: Dict[str, Any] = {}
    _exp_lin(sd, "feat_embed_enc_to_dec", params["feat_embed"])
    sd["image2_embed"] = np.asarray(
        params["image2_embed"]).reshape(1, 1, -1).copy()
    for i, blk in enumerate(_unstack(params["blocks"], cfg.depth)):
        p = f"blocks_dec.{i}"
        _exp_ln(sd, f"{p}.norm1", blk["norm1"])
        _exp_lin(sd, f"{p}.attn.qkv", blk["attn"]["qkv"])
        _exp_lin(sd, f"{p}.attn.proj", blk["attn"]["proj"])
        _exp_ln(sd, f"{p}.norm2", blk["norm2"])
        _exp_ln(sd, f"{p}.norm_y", blk["norm_y"])
        _exp_lin(sd, f"{p}.cross_attn.projq", blk["projq"])
        _exp_lin(sd, f"{p}.cross_attn.projk", blk["projk"])
        _exp_lin(sd, f"{p}.cross_attn.projv", blk["projv"])
        _exp_lin(sd, f"{p}.cross_attn.proj", blk["proj_ca"])
        _exp_ln(sd, f"{p}.norm3", blk["norm3"])
        _exp_mlp(sd, f"{p}.mlp", blk["mlp"])
    _exp_ln(sd, "norm_dec", params["norm_dec"])
    _exp_lin(sd, "head_dec.proj", params["head_proj"])
    if "feedback" in params:
        if "fc1" in params["feedback"]:
            _exp_mlp(sd, "feedback_layer", params["feedback"])
        else:
            _exp_lin(sd, "feedback_layer", params["feedback"])
        _exp_ln(sd, "feedback_norm", params["feedback_norm"])
    return sd


def export_torch_checkpoint(path: str, params, enc_cfg: EncoderConfig,
                            dec_cfg: DecoderConfig, epoch: int = 0):
    """Write a reference-compatible `.pth`: torch tensors + the constructor
    strings the reference `load_model` eval()s (model/__init__.py:30-39).
    Loadable both by the reference codebase and by our
    `convert_torch_checkpoint`."""
    import argparse

    import torch

    from must3r_tpu.config import (
        decoder_config_to_arg_string,
        encoder_config_to_arg_string,
    )

    def to_torch(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}

    ckpt = {
        "encoder": to_torch(export_encoder_state_dict(
            params["encoder"], enc_cfg)),
        "decoder": to_torch(export_decoder_state_dict(
            params["decoder"], dec_cfg)),
        "args": argparse.Namespace(
            encoder=encoder_config_to_arg_string(enc_cfg),
            decoder=decoder_config_to_arg_string(dec_cfg)),
        "epoch": epoch,
    }
    torch.save(ckpt, path)


def convert_torch_checkpoint(path: str, img_size: Optional[int] = None
                             ) -> Tuple[dict, EncoderConfig, DecoderConfig]:
    """Load a reference `.pth` checkpoint: parse the stored constructor
    strings into typed configs (no eval(); reference rewrites
    CausalMUSt3R->MUSt3R at load, model/__init__.py:53-63) and convert both
    state dicts.

    Returns ({'encoder', 'decoder'}, enc_cfg, dec_cfg)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    args = ckpt["args"]
    enc_cfg = encoder_config_from_arg_string(
        args.encoder if hasattr(args, "encoder") else args["encoder"])
    dec_cfg = decoder_config_from_arg_string(
        args.decoder if hasattr(args, "decoder") else args["decoder"])
    dec_cfg = dec_cfg.inference_variant()
    if img_size is not None:
        from must3r_tpu.config import set_image_size
        enc_cfg = set_image_size(enc_cfg, img_size)
        dec_cfg = set_image_size(dec_cfg, img_size)

    def to_np(sd):
        return {k: v.float().numpy() for k, v in sd.items()}

    enc_params = convert_encoder_state_dict(to_np(ckpt["encoder"]), enc_cfg)
    dec_params = convert_decoder_state_dict(to_np(ckpt["decoder"]), dec_cfg)
    return ({"encoder": enc_params, "decoder": dec_params}, enc_cfg, dec_cfg)
