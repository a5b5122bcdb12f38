"""Parametrized torch twin of the reference MUSt3R forward semantics.

An independent torch transcription of the reference's encoder/decoder
behavior (reference must3r/model/decoder.py update/render with kv memory,
feedback mechanism, linear head), built with the REFERENCE's state-dict
key names so `must3r_tpu.checkpoint.convert_*_state_dict` applies
directly. Used at tiny dims by tests/test_checkpoint.py and at flagship
dims (ViT-L 24x1024 / ViT-B 12x768) by scripts/validate_reference.py to
anchor accuracy when the published .pth weights are unavailable.

This module is deliberately NOT on any production import path: torch is a
test-only dependency of this repo.
"""

import math

import torch
import torch.nn as nn


class TorchMlp(nn.Module):
    def __init__(self, d, hidden, out=None):
        super().__init__()
        self.fc1 = nn.Linear(d, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, out or d)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchEncBlock(nn.Module):
    def __init__(self, d, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = TorchMlp(d, int(mlp_ratio * d))
        self.heads = heads


class TorchDecBlock(nn.Module):
    def __init__(self, d, heads, mlp_ratio=4.0):
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
        self.mlp = TorchMlp(d, int(mlp_ratio * d))
        self.heads = heads


class TorchEncoder(nn.Module):
    def __init__(self, d, depth, heads, patch_size, mlp_ratio=4.0):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch_size,
                                          stride=patch_size)
        self.blocks_enc = nn.ModuleList(
            [TorchEncBlock(d, heads, mlp_ratio) for _ in range(depth)])
        self.norm_enc = nn.LayerNorm(d, eps=1e-6)


class TorchDecoder(nn.Module):
    def __init__(self, d_enc, d, depth, heads, patch_size, mlp_ratio=4.0):
        super().__init__()
        self.feat_embed_enc_to_dec = nn.Linear(d_enc, d)
        self.image2_embed = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.blocks_dec = nn.ModuleList(
            [TorchDecBlock(d, heads, mlp_ratio) for _ in range(depth)])
        self.feedback_layer = TorchMlp(d, int(mlp_ratio * d))
        self.feedback_norm = nn.LayerNorm(d, eps=1e-6)
        self.norm_dec = nn.LayerNorm(d, eps=1e-6)
        self.head_dec = nn.Module()
        self.head_dec.proj = nn.Linear(d, patch_size * patch_size * 7)
        self.patch_size = patch_size


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


def torch_encoder_forward(enc, img, pos):
    """img [B, H, W, 3] channels-last float; pos [B, N, 2]."""
    timg = img.permute(0, 3, 1, 2)
    x = enc.patch_embed.proj(timg).flatten(2).transpose(1, 2)
    for blk in enc.blocks_enc:
        x = x + sa_torch(blk, x, pos)
        x = x + blk.mlp(blk.norm2(x))
    return enc.norm_enc(x)


def torch_decoder_forward(dec, x_enc, pos, mem=None, render=False,
                          causal=False):
    """Independent transcription of reference MUSt3R.forward semantics
    (kv memory mode). mem = (k_list, v_list, labels, n_imgs) or None.

    causal=True applies the CausalMUSt3R training rule (reference
    decoder.py:394-400): each image attends strictly-earlier labels,
    with the init exception that image 0 of a fresh memory attends
    labels < 2 (itself and image 1)."""
    depth = len(dec.blocks_dec)
    d_dec = dec.image2_embed.shape[-1]
    b, g, n, _ = x_enc.shape
    x = dec.feat_embed_enc_to_dec(x_enc)
    if mem is None:
        x[:, 1:] += dec.image2_embed
        old_k = [torch.zeros(b, 0, d_dec) for _ in range(depth)]
        old_v = [torch.zeros(b, 0, d_dec) for _ in range(depth)]
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
            own = n_imgs + gi
            if render or (n_imgs == 0 and g == 1):
                allow = torch.ones(b, n, lab.shape[1], dtype=torch.bool)
            elif causal:
                if n_imgs == 0 and g > 1 and gi == 0:
                    allow = (lab < 2)[:, None].expand(b, n, -1)
                else:
                    allow = (lab < own)[:, None].expand(b, n, -1)
            else:
                allow = (lab != own)[:, None].expand(b, n, -1)
            outs.append(ca_torch(blk, xg[:, gi], k, v, allow))
        x = x + torch.stack(outs, 1).reshape(b * g, n, -1)
        x = x + blk.mlp(blk.norm3(x))

    if not render:
        offset = dec.feedback_layer(dec.feedback_norm(raws[-1]))
        new_k, new_v = [], []
        for li, blk in enumerate(dec.blocks_dec):
            adj = raws[li] + offset if li < depth - 1 else raws[li]
            y = blk.norm_y(adj)
            new_k.append(torch.cat([old_k[li], blk.cross_attn.projk(y)], 1))
            new_v.append(torch.cat([old_v[li], blk.cross_attn.projv(y)], 1))
        mem_out = (new_k, new_v, labels, n_imgs + g)
    else:
        mem_out = mem
    return mem_out, x.reshape(b, g, n, -1)


def torch_head(dec, toks, hw):
    """norm_dec + linear + pixel-shuffle unpatchify to [B, G, H, W, 7]."""
    p = dec.patch_size
    b, g, n, _ = toks.shape
    x = dec.head_dec.proj(dec.norm_dec(toks)).reshape(b * g, n, -1)
    hp, wp = hw[0] // p, hw[1] // p
    x = x.transpose(-1, -2).reshape(b * g, -1, hp, wp)
    x = torch.nn.functional.pixel_shuffle(x, p)
    return x.permute(0, 2, 3, 1).reshape(b, g, hw[0], hw[1], -1)


def torch_decoder_refine(dec, x_enc, pos, mem, old_labels):
    """Refinement pass (reference inference_multi_ar refinement,
    engine/inference.py:412-443): re-run the update forward for
    already-seen images -- they attend the full memory including their
    own OLD tokens (those carry a different label) -- then overwrite the
    original tokens in place by label. Label 0 is never refined."""
    depth = len(dec.blocks_dec)
    b, g, n, _ = x_enc.shape
    old_len = mem[0][0].shape[1]
    mem2, toks = torch_decoder_forward(dec, x_enc, pos, mem)
    k_out = [k[:, :old_len].clone() for k in mem2[0]]
    v_out = [v[:, :old_len].clone() for v in mem2[1]]
    labels = mem[2]
    for gi in range(g):
        lab = int(old_labels[gi])
        if lab <= 0:
            continue
        idx = (labels[0] == lab).nonzero().squeeze(-1)
        if idx.numel() == 0:
            continue
        for li in range(depth):
            k_out[li][:, idx] = mem2[0][li][:, old_len + gi * n:
                                            old_len + (gi + 1) * n]
            v_out[li][:, idx] = mem2[1][li][:, old_len + gi * n:
                                            old_len + (gi + 1) * n]
    return (k_out, v_out, labels, mem[3]), toks


def torch_mem_evict(mem, label):
    """Drop every memory row of one image label (reference
    _remove_from_mem, engine/inference.py:204-212)."""
    k, v, labels, n_imgs = mem
    keep = labels[0] != label
    return ([kk[:, keep] for kk in k], [vv[:, keep] for vv in v],
            labels[:, keep], n_imgs)


def torch_mem_relabel(mem, old, new):
    """Rewrite one image label (reference _restore_label_in_mem,
    engine/inference.py:215-218)."""
    k, v, labels, n_imgs = mem
    labels = torch.where(labels == old,
                         torch.as_tensor(new, dtype=labels.dtype), labels)
    return (k, v, labels, n_imgs)
