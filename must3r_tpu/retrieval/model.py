"""Retrieval head over frozen encoder features.

Parity target: reference `must3r/retrieval/model.py` -- the MASt3R-style
"trainingfree" retrieval head: optional PCA-whitening (`Whitener`, learned
offline via `pcawhitenlearn_shrinkage`), an MLP projector, L2-norm
attention, top-k local feature selection (`how_select_local`) and global
weighted-SPoC pooling. Pure jnp functions over a params dict; a converter
ingests the published `*_trainingfree.pth` state dicts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pcawhiten_learn(x: np.ndarray, shrinkage: float = 1.0
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Learn PCA whitening (mean m [1, D], projection P [D, D]) from
    descriptors [N, D] (reference model.py:18-35, after the HOW repo)."""
    n = x.shape[0]
    m = x.mean(axis=0, keepdims=True)
    xc = x - m
    cov = (xc.T @ xc)
    cov = (cov + cov.T) / (2 * n)
    eigval, eigvec = np.linalg.eigh(cov)
    order = eigval.argsort()[::-1]
    eigval = np.clip(eigval[order], 1e-14, None)
    eigvec = eigvec[:, order]
    p = np.linalg.inv(np.diag(eigval ** (0.5 * shrinkage))) @ eigvec.T
    return m, p.T


def whiten(params: Dict, x, l2norm: Optional[int] = None):
    """x [..., D] -> (x - m) @ p, optionally L2-normalized (fp64 in the
    reference; fp32 here -- descriptors, not geometry)."""
    y = (x - params["m"].reshape(-1)) @ params["p"]
    if l2norm is not None:
        y = y / jnp.clip(jnp.linalg.norm(y, axis=l2norm, keepdims=True),
                         1e-12)
    return y


def weighted_spoc(feat, attn):
    """[B, N, C], [B, N] -> L2-normalized attention-weighted sum [B, C]."""
    g = jnp.sum(feat * attn[..., None], axis=-2)
    return g / jnp.clip(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def how_select_local(feat, attn, nfeat):
    """Top-k features by attention. feat [B, N, C], attn [B, N].

    nfeat < 0 selects a fraction (reference model.py:85-101).
    Returns (topk_feat [B, k, C], topk_attn [B, k], indices [B, k])."""
    b, n, c = feat.shape
    if nfeat < 0:
        assert nfeat >= -1.0
        k = int(-nfeat * n)
    else:
        k = int(nfeat)
    k = min(k, n)
    topk_attn, idx = jax.lax.top_k(attn, k)
    topk_feat = jnp.take_along_axis(feat, idx[..., None], axis=1)
    return topk_feat, topk_attn, idx


class RetrievalHead:
    """Functional retrieval head. params:
      'prewhiten' {m, p} | None, 'projector' [ {w, b} ... with LN/GELU
      between ], 'postwhiten' {m, p} | None."""

    def __init__(self, params: Dict, nfeat: int = 300,
                 residual: bool = False):
        self.params = params
        self.nfeat = nfeat
        self.residual = residual
        self._features_and_attention = jax.jit(self.features_and_attention)
        self._forward_local = jax.jit(
            lambda x: how_select_local(*self.features_and_attention(x),
                                       self.nfeat))

    def features_and_attention(self, x):
        p = self.params
        if p.get("prewhiten") is not None:
            x = whiten(p["prewhiten"], x)
        h = x
        layers = p.get("projector") or []
        for i, layer in enumerate(layers):
            h = h @ layer["w"] + layer["b"]
            if i < len(layers) - 1:
                mu = jnp.mean(h, axis=-1, keepdims=True)
                var = jnp.var(h, axis=-1, keepdims=True)
                hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
                h = jax.nn.gelu(hn * layer["ln_scale"] + layer["ln_bias"],
                                approximate=False)
        if self.residual:
            h = h + x
        attn = jnp.linalg.norm(h, axis=-1)        # featweights='l2norm'
        if p.get("postwhiten") is not None:
            h = whiten(p["postwhiten"], h)
        return h, attn

    def forward_local(self, x):
        return self._forward_local(x)

    def forward_global(self, x):
        feat, attn = self._features_and_attention(x)
        return weighted_spoc(feat, attn)

    def extract_local_features(self, tokens) -> Tuple[np.ndarray,
                                                      np.ndarray]:
        """Encoder tokens -> stacked local features + image ids
        (reference extract_local_features / MUSt3R_Retriever._preproc).

        Accepts a single [V, N, D] array (device arrays stay on device --
        crucial through a slow host link: the full token set is ~150 MB at
        50 views while the selected features are ~20x smaller) or a list
        of per-image [N_i, D] arrays. Uniform shapes run as ONE jitted
        batch with a single host fetch of just the top-k features."""
        if not isinstance(tokens, (list, tuple)):
            tokens_list = None
            x = tokens
        else:
            tokens_list = tokens
            shapes = {tuple(np.shape(t)) for t in tokens_list}
            x = None
            if len(shapes) == 1:
                arrs = tokens_list
                if any(isinstance(t, np.ndarray) for t in arrs):
                    x = jnp.asarray(np.stack([np.asarray(t) for t in arrs]))
                else:
                    x = jnp.stack([jnp.asarray(t) for t in arrs])
        if x is not None:
            f, _, _ = self.forward_local(x)
            feats_b = np.asarray(f)                      # [V, k, C]
            v, k, _ = feats_b.shape
            ids = np.repeat(np.arange(v, dtype=np.int64), k)
            return feats_b.reshape(v * k, -1), ids
        feats, ids = [], []
        for i, toks in enumerate(tokens_list):
            f, _, _ = self.forward_local(jnp.asarray(toks)[None])
            f = np.asarray(f[0])
            feats.append(f)
            ids.append(np.full(f.shape[0], i, np.int64))
        return np.concatenate(feats), np.concatenate(ids)


def identity_head(dim: int, nfeat: int = 300) -> RetrievalHead:
    """Projector-free head (raw encoder tokens + L2-norm attention) --
    usable without any trained retrieval checkpoint."""
    return RetrievalHead({"prewhiten": None, "projector": [],
                          "postwhiten": None}, nfeat=nfeat)


def convert_torch_retrieval_checkpoint(path: str) -> RetrievalHead:
    """Load a reference `*_trainingfree.pth` retrieval checkpoint."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    args = ckpt["args"]
    sd = {k: v.float().numpy() for k, v in ckpt["model"].items()}
    params: Dict = {"prewhiten": None, "postwhiten": None, "projector": []}
    if "prewhiten.m" in sd:
        params["prewhiten"] = {"m": jnp.asarray(sd["prewhiten.m"]),
                               "p": jnp.asarray(sd["prewhiten.p"])}
    if "postwhiten.m" in sd:
        params["postwhiten"] = {"m": jnp.asarray(sd["postwhiten.m"]),
                                "p": jnp.asarray(sd["postwhiten.p"])}
    # projector = Sequential(Linear, LayerNorm, GELU, ..., Linear)
    lin_ids = sorted({int(k.split(".")[1]) for k in sd
                      if k.startswith("projector.") and k.endswith(".weight")
                      and sd[k].ndim == 2})
    layers = []
    for li in lin_ids:
        layer = {"w": jnp.asarray(sd[f"projector.{li}.weight"].T),
                 "b": jnp.asarray(sd[f"projector.{li}.bias"])}
        ln_key = f"projector.{li + 1}.weight"
        if ln_key in sd and sd[ln_key].ndim == 1:
            layer["ln_scale"] = jnp.asarray(sd[ln_key])
            layer["ln_bias"] = jnp.asarray(sd[f"projector.{li + 1}.bias"])
        layers.append(layer)
    params["projector"] = layers
    head = RetrievalHead(params, nfeat=getattr(args, "nfeat", 300),
                         residual=getattr(args, "residual", False))
    return head
