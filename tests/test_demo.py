"""Demo layer tests: video driver, offline driver, scene export."""

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.demo import (
    SceneState,
    must3r_inference,
    must3r_inference_video,
    scene_to_glb,
    scene_to_ply,
)
from must3r_tpu.engine import InferenceCore
from must3r_tpu.engine.video import video_reconstruction
from must3r_tpu.models import init_decoder, init_encoder
from must3r_tpu.tools.ply import load_ply

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2, feedback=FeedbackType.SINGLE_MLP)


@pytest.fixture(scope="module")
def core():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return InferenceCore(init_encoder(k1, ENC_CFG), init_decoder(k2, DEC_CFG),
                         ENC_CFG, DEC_CFG, dtype=jnp.float32, impl="chunked")


def _views(rng, n, hw=(32, 32)):
    views = []
    for i in range(n):
        views.append({"img": rng.standard_normal((*hw, 3)).astype(np.float32),
                      "true_shape": hw, "portrait": False,
                      "path": f"img{i}.png"})
    return views


def test_video_reconstruction_interval_keyframes(core, rng):
    imgs = jnp.asarray(rng.standard_normal((7, 32, 32, 3)), jnp.float32)
    out, mem = video_reconstruction(
        core, imgs, init_num_images=2, local_context_size=3,
        is_keyframe_fn=lambda fid, res, st: fid % 2 == 0,
        return_mem=True)
    assert out["pts3d"].shape == (7, 32, 32, 3)
    # keyframes: init (0,1) + even ids
    assert out["keyframes"] == [0, 1, 2, 4, 6]
    # final memory holds exactly the keyframes (after compaction)
    n_tok = 4
    assert int(mem.length) == 5 * n_tok
    labels = np.asarray(mem.labels[0, :5 * n_tok])
    assert len(np.unique(labels)) == 5


def test_video_reconstruction_with_refinement(core, rng):
    imgs = jnp.asarray(rng.standard_normal((5, 32, 32, 3)), jnp.float32)
    out, mem = video_reconstruction(
        core, imgs, init_num_images=2, local_context_size=4,
        num_refinement_iterations=1,
        is_keyframe_fn=lambda fid, res, st: True, return_mem=True)
    assert sorted(out["keyframes"]) == [0, 1, 2, 3, 4]
    assert int(mem.length) == 5 * 4
    for k in ("pts3d", "conf", "c2w", "focal"):
        assert np.isfinite(out[k]).all()


def test_video_capacity_compaction(core, rng):
    """Tiny capacity forces mid-run compaction; results stay finite and
    keyframe accounting stays exact."""
    imgs = jnp.asarray(rng.standard_normal((10, 32, 32, 3)), jnp.float32)
    out, mem = video_reconstruction(
        core, imgs, init_num_images=2, local_context_size=2,
        is_keyframe_fn=lambda fid, res, st: fid % 4 == 0,
        capacity_images=6, return_mem=True)
    assert out["keyframes"] == [0, 1, 4, 8]
    assert int(mem.length) == 4 * 4


def test_must3r_inference_offline(core, rng):
    scene = must3r_inference(core, _views(rng, 6), num_mem_images=4,
                             init_num_images=2, encode_bs=3, render_bs=3)
    assert scene.pts3d.shape == (6, 32, 32, 3)
    assert scene.cams2world.shape == (6, 4, 4)
    assert scene.imgs.dtype == np.uint8
    assert len(scene.image_list) == 6
    assert np.isfinite(scene.pts3d).all()


def test_must3r_inference_sequence_mode(core, rng):
    scene = must3r_inference(core, _views(rng, 5), num_mem_images=3,
                             is_sequence=True, encode_bs=5, render_bs=5)
    assert scene.pts3d.shape == (5, 32, 32, 3)


def test_must3r_inference_video_slam_mode(core, rng):
    scene = must3r_inference_video(core, _views(rng, 5), mode="slam",
                                   subsample=2, keyframe_overlap_thr=0.01,
                                   min_conf_keyframe=0.0, encode_bs=5)
    assert scene.pts3d.shape == (5, 32, 32, 3)
    assert np.isfinite(scene.cams2world).all()


def _dummy_scene(rng, v=3, hw=(16, 16)):
    return SceneState(
        pts3d=rng.standard_normal((v, *hw, 3)).astype(np.float32),
        pts3d_local=rng.standard_normal((v, *hw, 3)).astype(np.float32),
        conf=1.0 + 4.0 * rng.random((v, *hw)).astype(np.float32),
        imgs=(rng.random((v, *hw, 3)) * 255).astype(np.uint8),
        true_shape=np.tile(np.asarray(hw), (v, 1)),
        focals=np.full(v, 20.0), cams2world=np.tile(np.eye(4), (v, 1, 1)),
        image_list=[f"{i}" for i in range(v)])


def test_scene_to_ply(tmp_path, rng):
    scene = _dummy_scene(rng)
    p = scene_to_ply(scene, str(tmp_path / "s.ply"), conf_thr=3.0)
    pts, cols = load_ply(p)
    want = int((scene.conf > 3.0).sum())
    assert pts.shape == (want, 3)
    assert cols.shape == (want, 3)


def test_scene_to_glb_valid_structure(tmp_path, rng):
    scene = _dummy_scene(rng)
    p = scene_to_glb(scene, str(tmp_path / "s.glb"), conf_thr=2.0,
                     max_points=100)
    raw = open(p, "rb").read()
    magic, version, total = struct.unpack("<III", raw[:12])
    assert magic == 0x46546C67 and version == 2 and total == len(raw)
    jlen, jtype = struct.unpack("<II", raw[12:20])
    gltf = json.loads(raw[20:20 + jlen])
    assert gltf["asset"]["version"] == "2.0"
    modes = [m["primitives"][0]["mode"] for m in gltf["meshes"]]
    assert 0 in modes              # pointcloud
    assert modes.count(1) == 3     # one frustum per camera
    # accessors reference valid buffer views
    for acc in gltf["accessors"]:
        assert acc["bufferView"] < len(gltf["bufferViews"])
