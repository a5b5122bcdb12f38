"""Production-kwarg signature matrix, walked on CPU.

Round-4 regression: a sharded-update refactor added an `extra_kv` kwarg
that broke `decoder_update` on TPU hardware only, because the production
pallas dispatch paths (impl='pallas') were unreachable from CPU tests —
`_default_impl` picks 'chunked' off-TPU and every kernel's `interpret`
flag defaulted to False. This matrix pins EVERY production call-site's
exact kwargs across {impl} x {mesh} x {kv_quant}, with the pallas
kernels running in interpret mode (ops.attention.INTERPRET_DEFAULT), so
a signature or plumbing drift in any of them fails HERE before it can
reach hardware.

Call sites pinned (kwargs copied from the production sources):
  engine/inference.py:192-235  InferenceCore update/refine/render/
                               update_seq/render_post
  engine/train.py:169-213      causal update w/ dropout mask + remat
                               + render, under jax.grad
  slam/model.py:171-178        unroll_layers frame update + render
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from must3r_tpu.config import DecoderConfig
from must3r_tpu.memory import init_memory
from must3r_tpu.models.decoder import decoder_render, decoder_update
from must3r_tpu.ops import attention as att_mod


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Route every pallas kernel through interpret mode so impl='pallas'
    paths trace and execute on CPU exactly as production dispatches them."""
    monkeypatch.setattr(att_mod, "INTERPRET_DEFAULT", True)


def _tiny_cfg():
    return DecoderConfig(img_size=(32, 32), enc_embed_dim=48, patch_size=16,
                         embed_dim=64, output_dim=16 * 16 * 7, depth=2,
                         num_heads=2)


def _core(impl, mesh=None, kv_quant=None):
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.config import EncoderConfig

    dec_cfg = _tiny_cfg()
    enc_cfg = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=48,
                            depth=1, num_heads=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.float32, impl=impl,
                         mesh=mesh, kv_quant=kv_quant), dec_cfg


def _views(dec_cfg, g, seed=1):
    n = 4  # (32/16)^2 tokens per view
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, g, n, dec_cfg.enc_embed_dim)),
                    jnp.float32)
    pos = jnp.asarray(
        np.broadcast_to(
            np.stack(np.meshgrid(np.arange(2), np.arange(2),
                                 indexing="ij"), -1).reshape(1, 1, n, 2),
            (1, g, n, 2)))
    return x, pos


def _sp_mesh():
    assert jax.device_count() >= 2
    return Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("sp",))


# every serving configuration production can construct
_MATRIX = [
    ("pallas", False, None),
    ("pallas", True, None),
    ("pallas", False, "int8"),
    ("pallas", True, "int8"),
    ("pallas", False, "fp8"),
    ("chunked", True, "int8"),
    ("chunked", False, None),
]


@pytest.mark.parametrize("impl,use_mesh,kv_quant", _MATRIX,
                         ids=[f"{i}-{'sp2' if m else 'nomesh'}-{q or 'bf16'}"
                              for i, m, q in _MATRIX])
def test_inference_core_serving_matrix(impl, use_mesh, kv_quant):
    """new_memory -> update(2) -> update(1) -> update_seq -> refine ->
    render -> render_post with the exact InferenceCore jit closures."""
    mesh = _sp_mesh() if use_mesh else None
    core, dec_cfg = _core(impl, mesh=mesh, kv_quant=kv_quant)
    mem = core.new_memory(8, (32, 32), block=8)
    x, pos = _views(dec_cfg, 3)

    mem, toks = core.update(mem, x[:, :2], pos[:, :2])
    assert toks.shape == (1, 2, 4, dec_cfg.embed_dim)
    mem, _ = core.update(mem, x[:, 2:3], pos[:, 2:3])

    xs, ps = _views(dec_cfg, 2, seed=2)
    mem = core.update_seq(mem, xs[0], ps[0], chunk=2)

    labels = jnp.asarray([1, 2], jnp.int32)   # [G] originals; 0 never refined
    mem, _ = core.refine(mem, x[:, :2], pos[:, :2], labels)

    toks_r = core.render(mem, x[:, :1], pos[:, :1])
    assert np.isfinite(np.asarray(toks_r, np.float32)).all()

    pmask = jnp.zeros((1, 1), bool)
    out = core.render_post(mem, x[:, :1], pos[:, :1], pmask, (32, 32))
    assert np.isfinite(np.asarray(out["pts3d"], np.float32)).all()


@pytest.mark.parametrize("impl", ["pallas", "chunked"])
def test_train_step_kwargs_with_grad(impl):
    """The train-loop call site (engine/train.py:169-213): causal update
    with a dropout extra_mask and remat=True, rendered tail, all under
    jax.grad so the backward (custom-VJP flash kernels for 'pallas')
    traces too."""
    from must3r_tpu.models import init_decoder

    dec_cfg = dataclasses.replace(_tiny_cfg(), causal=True)
    params = init_decoder(jax.random.PRNGKey(0), dec_cfg)
    x, pos = _views(dec_cfg, 4)

    def loss_fn(p):
        mem = init_memory(dec_cfg.depth, 1, dec_cfg.num_heads,
                          dec_cfg.head_dim, 16, dtype=jnp.float32)
        extra = jnp.zeros((1, 2, 16), bool)
        mem, toks1 = decoder_update(p, dec_cfg, mem, x[:, :2], pos[:, :2],
                                    causal=True, extra_mask=extra,
                                    dtype=jnp.float32, remat=True,
                                    impl=impl)
        mem, toks2 = decoder_update(p, dec_cfg, mem, x[:, 2:4], pos[:, 2:4],
                                    causal=True, extra_mask=extra,
                                    dtype=jnp.float32, remat=True,
                                    impl=impl)
        toks_r = decoder_render(p, dec_cfg, mem, x[:, :1], pos[:, :1],
                                dtype=jnp.float32, impl=impl)
        return (jnp.sum(toks1.astype(jnp.float32) ** 2)
                + jnp.sum(toks2.astype(jnp.float32) ** 2)
                + jnp.sum(toks_r.astype(jnp.float32) ** 2))

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert any(np.asarray(jnp.abs(g)).max() > 0 for g in leaves)


@pytest.mark.parametrize("impl", ["pallas", "chunked"])
def test_slam_frame_kwargs(impl):
    """The SLAM frame-program call site (slam/model.py:171-178):
    unroll_layers update + read-only render."""
    from must3r_tpu.models import init_decoder

    dec_cfg = _tiny_cfg()
    params = init_decoder(jax.random.PRNGKey(0), dec_cfg)
    x, pos = _views(dec_cfg, 1)
    mem = init_memory(dec_cfg.depth, 1, dec_cfg.num_heads,
                      dec_cfg.head_dim, 16, dtype=jnp.float32)
    mem, toks = decoder_update(params, dec_cfg, mem, x, pos, causal=False,
                               dtype=jnp.float32, unroll_layers=True,
                               impl=impl)
    toks_r = decoder_render(params, dec_cfg, mem, x, pos,
                            dtype=jnp.float32, impl=impl)
    assert np.isfinite(np.asarray(toks, np.float32)).all()
    assert np.isfinite(np.asarray(toks_r, np.float32)).all()
