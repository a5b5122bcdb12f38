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
