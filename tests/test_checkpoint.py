"""Checkpoint converter golden test.

Uses the parametrized torch twin (must3r_tpu/testing/torch_twin.py) built
with the REFERENCE's state-dict key names and an independent torch
transcription of the reference forward semantics (decoder.py
update/render, feedback, kv memory), converts the state dict through
must3r_tpu.checkpoint, and requires the TPU pipeline to reproduce the
torch outputs. This is the strongest parity evidence available without
the published .pth weights; with them, the same converter applies
(scripts/validate_reference.py runs the flagship-shape variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from must3r_tpu.checkpoint import (
    convert_decoder_state_dict,
    convert_encoder_state_dict,
    load_checkpoint,
    save_checkpoint,
)
from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.memory import init_memory, round_capacity
from must3r_tpu.models import (
    decoder_head,
    decoder_render,
    decoder_update,
    encoder_forward,
    init_decoder,
    init_encoder,
)
from must3r_tpu.ops.patch import patchify_positions
from must3r_tpu.testing.torch_twin import (
    TorchDecoder,
    TorchEncoder,
    torch_decoder_forward,
    torch_encoder_forward,
    torch_head,
)

torch.manual_seed(0)

D_ENC, D_DEC, HEADS, DEPTH = 64, 48, 2, 2
P = 16
HW = (32, 32)
N = 4  # patches per image


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

ENC_CFG = EncoderConfig(img_size=HW, patch_size=P, embed_dim=D_ENC,
                        depth=DEPTH, num_heads=HEADS)
DEC_CFG = DecoderConfig(img_size=HW, enc_embed_dim=D_ENC, patch_size=P,
                        embed_dim=D_DEC, output_dim=P * P * 7, depth=DEPTH,
                        num_heads=HEADS, feedback=FeedbackType.SINGLE_MLP)


def _pos(b, g=None):
    pos = patchify_positions(HW[0] // P, HW[1] // P)
    if g is None:
        return jnp.broadcast_to(pos, (b, N, 2))
    return jnp.broadcast_to(pos[None], (b, g, N, 2))


def test_converted_encoder_matches_torch(rng):
    tenc = TorchEncoder(D_ENC, DEPTH, HEADS, P).eval()
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    params = convert_encoder_state_dict(sd, ENC_CFG)

    img = rng.standard_normal((2, *HW, 3)).astype(np.float32)
    got = encoder_forward(params, ENC_CFG, jnp.asarray(img), _pos(2))

    with torch.no_grad():
        tpos = torch.from_numpy(np.asarray(_pos(2)))
        want = torch_encoder_forward(tenc, torch.from_numpy(img),
                                     tpos).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_converted_decoder_full_pipeline_matches_torch(rng):
    """init(2 views) -> update(1 view) -> render(3 views) -> head, torch vs
    converted TPU pipeline, to fp32 tolerance."""
    tdec = TorchDecoder(D_ENC, D_DEC, DEPTH, HEADS, P).eval()
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = convert_decoder_state_dict(sd, DEC_CFG)

    b = 1
    x_all = rng.standard_normal((b, 3, N, D_ENC)).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(x_all)
        tpos = torch.from_numpy(np.asarray(_pos(b, 3)))
        mem_t, t01 = torch_decoder_forward(tdec, tx[:, :2], tpos[:, :2])
        mem_t, t2 = torch_decoder_forward(tdec, tx[:, 2:3], tpos[:, 2:3],
                                          mem_t)
        _, tr = torch_decoder_forward(tdec, tx, tpos, mem_t, render=True)
        want_toks = tr.numpy()
        want_pm = torch_head(tdec, tr, HW).numpy()

    cap = round_capacity(8 * N, 16)
    mem = init_memory(DEPTH, b, HEADS, D_DEC // HEADS, cap,
                      dtype=jnp.float32)
    xj = jnp.asarray(x_all)
    pj = _pos(b, 3)
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, :2], pj[:, :2],
                            causal=False, dtype=jnp.float32, impl="chunked")
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, 2:3], pj[:, 2:3],
                            causal=False, dtype=jnp.float32, impl="chunked")
    toks = decoder_render(params, DEC_CFG, mem, xj, pj, dtype=jnp.float32,
                          impl="chunked")
    pm = decoder_head(params, DEC_CFG, toks, HW)

    np.testing.assert_allclose(np.asarray(toks), want_toks, rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(pm), want_pm, rtol=2e-3,
                               atol=5e-4)


def test_checkpoint_roundtrip(tmp_path):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, ENC_CFG),
              "decoder": init_decoder(k2, DEC_CFG)}
    save_checkpoint(str(tmp_path / "ckpt"), params, ENC_CFG, DEC_CFG,
                    step=7, extra={"note": "test"})
    params2, enc2, dec2, opt2, meta = load_checkpoint(str(tmp_path / "ckpt"))
    assert enc2 == ENC_CFG and dec2 == DEC_CFG
    assert meta["step"] == 7 and meta["note"] == "test"
    assert opt2 is None
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_import_roundtrip(tmp_path):
    """ours -> torch .pth -> ours is bit-exact, incl. the constructor
    strings (weights-arrival readiness: proves the key mapping both ways,
    reference model/__init__.py:30-63)."""
    from must3r_tpu.checkpoint import (
        convert_torch_checkpoint,
        export_torch_checkpoint,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"encoder": init_encoder(k1, ENC_CFG),
              "decoder": init_decoder(k2, DEC_CFG)}
    path = str(tmp_path / "export.pth")
    export_torch_checkpoint(path, params, ENC_CFG, DEC_CFG, epoch=5)

    params2, enc2, dec2 = convert_torch_checkpoint(path)
    assert enc2 == ENC_CFG
    # convert_torch_checkpoint applies inference_variant(); compare to ours
    assert dec2 == DEC_CFG.inference_variant()
    t1, t2 = jax.tree.leaves(params), jax.tree.leaves(params2)
    assert len(t1) == len(t2)
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the .pth is readable the way the reference load_model reads it
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["args"].encoder.startswith("Dust3rEncoder(")
    assert ckpt["args"].decoder.startswith("MUSt3R(")
    assert ckpt["epoch"] == 5
    assert all(isinstance(v, torch.Tensor) for v in ckpt["encoder"].values())


def test_export_state_dict_keys_match_reference_layout():
    """Exported keys carry the reference module names (SURVEY §2.2)."""
    from must3r_tpu.checkpoint import (
        export_decoder_state_dict,
        export_encoder_state_dict,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    enc_sd = export_encoder_state_dict(init_encoder(k1, ENC_CFG), ENC_CFG)
    dec_sd = export_decoder_state_dict(init_decoder(k2, DEC_CFG), DEC_CFG)
    assert enc_sd["patch_embed.proj.weight"].shape == (D_ENC, 3, P, P)
    assert "blocks_enc.1.attn.qkv.weight" in enc_sd
    assert enc_sd["blocks_enc.0.attn.qkv.weight"].shape == (3 * D_ENC, D_ENC)
    assert "blocks_dec.1.cross_attn.projq.weight" in dec_sd
    assert dec_sd["image2_embed"].shape == (1, 1, D_DEC)
    assert dec_sd["feedback_layer.fc1.weight"].shape == (4 * D_DEC, D_DEC)
    assert dec_sd["head_dec.proj.weight"].shape == (P * P * 7, D_DEC)


@pytest.mark.slow
def test_causal_refine_video_paths_match_torch(rng):
    """The other forward paths vs the twin (VERDICT r2 item 5): causal
    training blocks, a refinement pass, and a video evict+relabel
    sequence -- tiny dims here; flagship dims in
    scripts/validate_reference.py."""
    from must3r_tpu.memory import evict_label, relabel
    from must3r_tpu.models.decoder import decoder_refine
    from must3r_tpu.testing.torch_twin import (
        torch_decoder_refine,
        torch_mem_evict,
        torch_mem_relabel,
    )

    tdec = TorchDecoder(D_ENC, D_DEC, DEPTH, HEADS, P).eval()
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = convert_decoder_state_dict(sd, DEC_CFG)

    b, v = 1, 4
    x_all = rng.standard_normal((b, v, N, D_ENC)).astype(np.float32)
    xj, pj = jnp.asarray(x_all), _pos(b, v)
    tx = torch.from_numpy(x_all)
    tpos = torch.from_numpy(np.asarray(_pos(b, v)))
    cap = round_capacity(8 * N, 16)

    def fresh():
        return init_memory(DEPTH, b, HEADS, D_DEC // HEADS, cap,
                           dtype=jnp.float32)

    # -- causal training blocks (2+2) then render ------------------------
    with torch.no_grad():
        mem_t, _ = torch_decoder_forward(tdec, tx[:, :2], tpos[:, :2],
                                         causal=True)
        mem_t, _ = torch_decoder_forward(tdec, tx[:, 2:], tpos[:, 2:],
                                         mem_t, causal=True)
        _, tr = torch_decoder_forward(tdec, tx, tpos, mem_t, render=True)
    mem = fresh()
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, :2], pj[:, :2],
                            causal=True, dtype=jnp.float32, impl="chunked")
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, 2:], pj[:, 2:],
                            causal=True, dtype=jnp.float32, impl="chunked")
    toks = decoder_render(params, DEC_CFG, mem, xj, pj, dtype=jnp.float32,
                          impl="chunked")
    np.testing.assert_allclose(np.asarray(toks), tr.numpy(), rtol=2e-3,
                               atol=2e-4)

    # -- refinement pass on image label 1 --------------------------------
    with torch.no_grad():
        mem_t, _ = torch_decoder_forward(tdec, tx[:, :2], tpos[:, :2])
        mem_t, _ = torch_decoder_forward(tdec, tx[:, 2:3], tpos[:, 2:3],
                                         mem_t)
        mem_t, _ = torch_decoder_refine(tdec, tx[:, 1:2], tpos[:, 1:2],
                                        mem_t, [1])
        _, tr = torch_decoder_forward(tdec, tx[:, :3], tpos[:, :3], mem_t,
                                      render=True)
    mem = fresh()
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, :2], pj[:, :2],
                            causal=False, dtype=jnp.float32, impl="chunked")
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, 2:3], pj[:, 2:3],
                            causal=False, dtype=jnp.float32, impl="chunked")
    mem, _ = decoder_refine(params, DEC_CFG, mem, xj[:, 1:2], pj[:, 1:2],
                            jnp.asarray([1]), dtype=jnp.float32,
                            impl="chunked")
    toks = decoder_render(params, DEC_CFG, mem, xj[:, :3], pj[:, :3],
                          dtype=jnp.float32, impl="chunked")
    np.testing.assert_allclose(np.asarray(toks), tr.numpy(), rtol=2e-3,
                               atol=3e-4)

    # -- video: per-frame updates, evict label 1, update, relabel, render
    with torch.no_grad():
        mem_t = None
        for i in range(3):
            mem_t, _ = torch_decoder_forward(tdec, tx[:, i:i + 1],
                                             tpos[:, i:i + 1], mem_t)
        mem_t = torch_mem_evict(mem_t, 1)
        mem_t, _ = torch_decoder_forward(tdec, tx[:, 3:4], tpos[:, 3:4],
                                         mem_t)
        mem_t = torch_mem_relabel(mem_t, 3, 1)
        _, tr = torch_decoder_forward(tdec, tx, tpos, mem_t, render=True)
    mem = fresh()
    for i in range(3):
        mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, i:i + 1],
                                pj[:, i:i + 1], causal=False,
                                dtype=jnp.float32, impl="chunked")
    mem = evict_label(mem, 1)
    mem, _ = decoder_update(params, DEC_CFG, mem, xj[:, 3:4], pj[:, 3:4],
                            causal=False, dtype=jnp.float32, impl="chunked")
    mem = relabel(mem, 3, 1)
    toks = decoder_render(params, DEC_CFG, mem, xj, pj, dtype=jnp.float32,
                          impl="chunked")
    np.testing.assert_allclose(np.asarray(toks), tr.numpy(), rtol=2e-3,
                               atol=3e-4)
