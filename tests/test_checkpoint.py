"""Checkpoint converter golden test.

Builds torch modules with the REFERENCE's state-dict key names and an
independent torch transcription of the reference forward semantics
(decoder.py update/render, feedback, kv memory), converts the state dict
through must3r_tpu.checkpoint, and requires the TPU pipeline to reproduce
the torch outputs. This is the strongest parity evidence available without
the published .pth weights; with them, the same converter applies.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

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

torch.manual_seed(0)

D_ENC, D_DEC, HEADS, DEPTH = 64, 48, 2, 2
P = 16
HW = (32, 32)
N = 4  # patches per image


# ---------------------------------------------------------------------------
# Torch twin with reference key names
# ---------------------------------------------------------------------------

class TorchMlp(nn.Module):
    def __init__(self, d, hidden, out=None):
        super().__init__()
        self.fc1 = nn.Linear(d, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, out or d)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchEncBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = TorchMlp(d, 4 * d)
        self.heads = heads


class TorchDecBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.norm_y = nn.LayerNorm(d, eps=1e-6)
        self.cross_attn = nn.Module()
        self.cross_attn.projq = nn.Linear(d, d)
        self.cross_attn.projk = nn.Linear(d, d)
        self.cross_attn.projv = nn.Linear(d, d)
        self.cross_attn.proj = nn.Linear(d, d)
        self.norm3 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = TorchMlp(d, 4 * d)
        self.heads = heads


class TorchEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D_ENC, P, stride=P)
        self.blocks_enc = nn.ModuleList(
            [TorchEncBlock(D_ENC, HEADS) for _ in range(DEPTH)])
        self.norm_enc = nn.LayerNorm(D_ENC, eps=1e-6)


class TorchDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.feat_embed_enc_to_dec = nn.Linear(D_ENC, D_DEC)
        self.image2_embed = nn.Parameter(torch.randn(1, 1, D_DEC) * 0.02)
        self.blocks_dec = nn.ModuleList(
            [TorchDecBlock(D_DEC, HEADS) for _ in range(DEPTH)])
        self.feedback_layer = TorchMlp(D_DEC, 4 * D_DEC)
        self.feedback_norm = nn.LayerNorm(D_DEC, eps=1e-6)
        self.norm_dec = nn.LayerNorm(D_DEC, eps=1e-6)
        self.head_dec = nn.Module()
        self.head_dec.proj = nn.Linear(D_DEC, P * P * 7)


def rope_torch(t, pos, base=100.0):
    """croco RoPE2D on [B, H, N, Dh] with pos [B, N, 2]."""
    dh = t.shape[-1]
    d_axis = dh // 2
    outs = []
    for axis in range(2):
        half = t[..., axis * d_axis:(axis + 1) * d_axis]
        inv = 1.0 / (base ** (torch.arange(0, d_axis, 2).float() / d_axis))
        ang = pos[..., axis].float().unsqueeze(-1) * inv
        ang = ang.unsqueeze(1)
        c = torch.cat([ang.cos(), ang.cos()], -1)
        s = torch.cat([ang.sin(), ang.sin()], -1)
        x1, x2 = half[..., :d_axis // 2], half[..., d_axis // 2:]
        rot = torch.cat([-x2, x1], -1)
        outs.append(half * c + rot * s)
    return torch.cat(outs, -1)


def sa_torch(blk, x, pos):
    b, n, d = x.shape
    dh = d // blk.heads
    h = blk.norm1(x)
    qkv = blk.attn.qkv(h).reshape(b, n, 3, blk.heads, dh)
    q, k, v = [qkv[:, :, i].transpose(1, 2) for i in range(3)]
    q, k = rope_torch(q, pos), rope_torch(k, pos)
    a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(dh), -1)
    o = (a @ v).transpose(1, 2).reshape(b, n, d)
    return blk.attn.proj(o)


def ca_torch(blk, x, k, v, allow):
    """x [B, Nq, D]; k/v [B, Nk, D]; allow bool [B, Nq, Nk]."""
    b, nq, d = x.shape
    dh = d // blk.heads
    q = blk.cross_attn.projq(blk.norm2(x)).reshape(b, nq, blk.heads, dh
                                                   ).transpose(1, 2)
    kk = k.reshape(b, -1, blk.heads, dh).transpose(1, 2)
    vv = v.reshape(b, -1, blk.heads, dh).transpose(1, 2)
    s = q @ kk.transpose(-2, -1) / math.sqrt(dh)
    s = s.masked_fill(~allow[:, None], -1e30)
    o = (torch.softmax(s, -1) @ vv).transpose(1, 2).reshape(b, nq, d)
    return blk.cross_attn.proj(o)


def torch_decoder_forward(dec, x_enc, pos, mem=None, render=False):
    """Independent transcription of reference MUSt3R.forward semantics
    (kv memory mode). mem = (k_list, v_list, labels) or None."""
    b, g, n, _ = x_enc.shape
    x = dec.feat_embed_enc_to_dec(x_enc)
    if mem is None:
        x[:, 1:] += dec.image2_embed
        old_k = [torch.zeros(b, 0, D_DEC) for _ in range(DEPTH)]
        old_v = [torch.zeros(b, 0, D_DEC) for _ in range(DEPTH)]
        old_labels = torch.zeros(b, 0, dtype=torch.long)
        n_imgs = 0
    else:
        x = x + dec.image2_embed
        old_k, old_v, old_labels, n_imgs = mem
    x = x.reshape(b * g, n, -1)
    posf = pos.reshape(b * g, n, 2)

    new_labels = (torch.arange(g).repeat_interleave(n) + n_imgs
                  ).expand(b, g * n)
    labels = torch.cat([old_labels, new_labels], 1)

    raws = []
    for li, blk in enumerate(dec.blocks_dec):
        if not render:
            raw = x.reshape(b, g * n, -1)
            raws.append(raw)
            y = blk.norm_y(raw)
            k = torch.cat([old_k[li], blk.cross_attn.projk(y)], 1)
            v = torch.cat([old_v[li], blk.cross_attn.projv(y)], 1)
            lab = labels
        else:
            k, v = old_k[li], old_v[li]
            lab = old_labels
        x = x + sa_torch(blk, x, posf)
        xg = x.reshape(b, g, n, -1)
        outs = []
        for gi in range(g):
            if render or (n_imgs == 0 and g == 1):
                allow = torch.ones(b, n, lab.shape[1], dtype=torch.bool)
            else:
                own = n_imgs + gi
                allow = (lab != own)[:, None].expand(b, n, -1)
            outs.append(ca_torch(blk, xg[:, gi], k, v, allow))
        x = x + torch.stack(outs, 1).reshape(b * g, n, -1)
        x = x + blk.mlp(blk.norm3(x))

    if not render:
        offset = dec.feedback_layer(dec.feedback_norm(raws[-1]))
        new_k, new_v = [], []
        for li, blk in enumerate(dec.blocks_dec):
            adj = raws[li] + offset if li < DEPTH - 1 else raws[li]
            y = blk.norm_y(adj)
            new_k.append(torch.cat([old_k[li], blk.cross_attn.projk(y)], 1))
            new_v.append(torch.cat([old_v[li], blk.cross_attn.projv(y)], 1))
        mem_out = (new_k, new_v, labels, n_imgs + g)
    else:
        mem_out = mem
    return mem_out, x.reshape(b, g, n, -1)


def torch_head(dec, toks):
    """norm_dec + linear + pixel-shuffle unpatchify to [B, G, H, W, 7]."""
    b, g, n, _ = toks.shape
    x = dec.head_dec.proj(dec.norm_dec(toks)).reshape(b * g, n, -1)
    hp = HW[0] // P
    wp = HW[1] // P
    x = x.transpose(-1, -2).reshape(b * g, -1, hp, wp)
    x = torch.nn.functional.pixel_shuffle(x, P)
    return x.permute(0, 2, 3, 1).reshape(b, g, HW[0], HW[1], -1)


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
    tenc = TorchEncoder().eval()
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    params = convert_encoder_state_dict(sd, ENC_CFG)

    img = rng.standard_normal((2, *HW, 3)).astype(np.float32)
    got = encoder_forward(params, ENC_CFG, jnp.asarray(img), _pos(2))

    with torch.no_grad():
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        x = tenc.patch_embed.proj(timg).flatten(2).transpose(1, 2)
        tpos = torch.from_numpy(np.asarray(_pos(2)))
        for blk in tenc.blocks_enc:
            x = x + sa_torch(blk, x, tpos)
            x = x + blk.mlp(blk.norm2(x))
        want = tenc.norm_enc(x).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_converted_decoder_full_pipeline_matches_torch(rng):
    """init(2 views) -> update(1 view) -> render(3 views) -> head, torch vs
    converted TPU pipeline, to fp32 tolerance."""
    tdec = TorchDecoder().eval()
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
        want_pm = torch_head(tdec, tr).numpy()

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
