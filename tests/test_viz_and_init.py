"""Viz outputs + dust3r warm-start converter tests."""

import os

import jax
import numpy as np
import pytest
import torch

from must3r_tpu.checkpoint import init_from_dust3r, rename_dust3r_keys
from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.datasets import SyntheticScenes
from must3r_tpu.tools.viz import plot_views, scene_to_html

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=48, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2)


def test_plot_views(tmp_path):
    ds = SyntheticScenes(num_views=2, resolutions=((64, 48),), epoch_size=2,
                         seed=0)
    p = plot_views(ds[0], str(tmp_path / "scene.png"))
    assert os.path.getsize(p) > 10_000


def test_scene_to_html(tmp_path, rng):
    from tests.test_demo import _dummy_scene

    scene = _dummy_scene(rng)
    p = scene_to_html(scene, str(tmp_path / "scene.html"), conf_thr=2.0)
    html = open(p).read()
    assert html.startswith("<!doctype html>")
    assert "b64f32" in html and "JSONCAMS" not in html
    assert os.path.getsize(p) > 1000


def test_rename_dust3r_keys():
    sd = {"enc_blocks.0.attn.qkv.weight": 1, "enc_norm.weight": 2,
          "dec_blocks.3.mlp.fc1.bias": 3, "decoder_embed.weight": 4,
          "patch_embed.proj.weight": 5}
    out = rename_dust3r_keys(sd)
    assert out["blocks_enc.0.attn.qkv.weight"] == 1
    assert out["norm_enc.weight"] == 2
    assert out["blocks_dec.3.mlp.fc1.bias"] == 3
    assert out["feat_embed_enc_to_dec.weight"] == 4
    assert out["patch_embed.proj.weight"] == 5


def test_init_from_dust3r_encoder(tmp_path):
    """A dust3r-style checkpoint (dust3r key names, encoder-only coverage)
    warm-starts the encoder exactly and leaves the decoder fresh."""
    torch.manual_seed(0)
    sd = {}
    sd["patch_embed.proj.weight"] = torch.randn(64, 3, 16, 16)
    sd["patch_embed.proj.bias"] = torch.randn(64)
    for i in range(2):
        p = f"enc_blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.randn(64)
        sd[f"{p}.norm1.bias"] = torch.randn(64)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(192, 64)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(192)
        sd[f"{p}.attn.proj.weight"] = torch.randn(64, 64)
        sd[f"{p}.attn.proj.bias"] = torch.randn(64)
        sd[f"{p}.norm2.weight"] = torch.randn(64)
        sd[f"{p}.norm2.bias"] = torch.randn(64)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(256, 64)
        sd[f"{p}.mlp.fc1.bias"] = torch.randn(256)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(64, 256)
        sd[f"{p}.mlp.fc2.bias"] = torch.randn(64)
    sd["enc_norm.weight"] = torch.randn(64)
    sd["enc_norm.bias"] = torch.randn(64)
    path = str(tmp_path / "dust3r.pth")
    torch.save({"model": sd}, path)

    params, info = init_from_dust3r(path, ENC_CFG, DEC_CFG,
                                    key=jax.random.PRNGKey(1))
    assert info["encoder_loaded"]
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["norm"]["scale"]),
        sd["enc_norm.weight"].numpy())
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["blocks"]["attn"]["qkv"]["w"][1]),
        sd["enc_blocks.1.attn.qkv.weight"].numpy().T, rtol=1e-6)
    # decoder untouched -> finite fresh init
    assert np.isfinite(
        np.asarray(params["decoder"]["feat_embed"]["w"])).all()
