"""Mixed aspect-ratio routing + profiling util tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.engine import InferenceCore, offline_reconstruction_multi_ar
from must3r_tpu.models import init_decoder, init_encoder
from must3r_tpu.utils import PhaseTimer, device_memory_stats

ENC_CFG = EncoderConfig(img_size=(64, 64), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2)
DEC_CFG = DecoderConfig(img_size=(64, 64), enc_embed_dim=64, patch_size=16,
                        embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2)


@pytest.fixture(scope="module")
def core():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return InferenceCore(init_encoder(k1, ENC_CFG), init_decoder(k2, DEC_CFG),
                         ENC_CFG, DEC_CFG, dtype=jnp.float32, impl="chunked")


def _view(rng, hw, portrait=False):
    return {"img": rng.standard_normal((*hw, 3)).astype(np.float32),
            "portrait": portrait, "true_shape": hw}


def test_multi_ar_mixed_buckets(core, rng):
    views = [_view(rng, (48, 64)), _view(rng, (48, 64)),
             _view(rng, (32, 64)), _view(rng, (48, 64)),
             _view(rng, (32, 64))]
    out = offline_reconstruction_multi_ar(core, views, render_bs=2)
    assert len(out) == 5
    assert out[0]["pts3d"].shape == (48, 64, 3)
    assert out[2]["pts3d"].shape == (32, 64, 3)
    assert out[4]["conf"].shape == (32, 64)
    for r in out:
        assert np.isfinite(r["c2w"]).all()
        assert r["focal"].shape == ()


def test_multi_ar_matches_single_bucket(core, rng):
    """With a uniform collection, multi-AR routing must agree with the
    single-bucket driver."""
    from must3r_tpu.engine import offline_reconstruction

    views = [_view(rng, (48, 64)) for _ in range(4)]
    out_m = offline_reconstruction_multi_ar(core, views, render_bs=4)
    imgs = jnp.asarray(np.stack([v["img"] for v in views]))
    out_s = offline_reconstruction(core, imgs, render_bs=4,
                                   capacity_images=8)
    got = np.stack([r["pts3d"] for r in out_m])
    np.testing.assert_allclose(got, np.asarray(out_s["pts3d"]), rtol=2e-4,
                               atol=2e-4)


def test_multi_ar_fused_matches_unfused(core, rng):
    """The fused path (scan-fused update runs + one-dispatch
    render/head/postprocess) is a dispatch-count optimization only: results
    must match the per-step path. 7 same-shape rest views exercise one full
    scan chunk (3) plus a remainder, across a shape switch."""
    views = ([_view(rng, (48, 64)) for _ in range(6)]
             + [_view(rng, (32, 64)) for _ in range(3)])
    out_f = offline_reconstruction_multi_ar(core, views, render_bs=2,
                                            fused=True, update_chunk=3)
    out_u = offline_reconstruction_multi_ar(core, views, render_bs=2,
                                            fused=False)
    for rf, ru in zip(out_f, out_u):
        for k in rf:
            np.testing.assert_allclose(np.asarray(rf[k]),
                                       np.asarray(ru[k]),
                                       rtol=2e-4, atol=2e-4, err_msg=k)


def test_phase_timer_and_memstats():
    t = PhaseTimer()
    with t.phase("a"):
        x = jnp.ones((8, 8)) * 2
    t.materializing_phase("b", lambda: jnp.sum(x))
    rep = t.report()
    assert "a:" in rep and "b:" in rep
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_multi_ar_portrait_views(core, rng):
    """Portrait views (stored transposed) flow through positions, head
    transpose and postprocess; their outputs stay aligned with storage."""
    views = [_view(rng, (48, 64), portrait=False),
             _view(rng, (48, 64), portrait=True),
             _view(rng, (48, 64), portrait=True),
             _view(rng, (48, 64), portrait=False)]
    out = offline_reconstruction_multi_ar(core, views, render_bs=4)
    for r in out:
        assert r["pts3d"].shape == (48, 64, 3)
        assert np.isfinite(r["pts3d"]).all()
    # a portrait view must produce different predictions than the same
    # pixels treated as landscape (positions + head arrangement differ)
    v_land = [dict(views[1], portrait=False)]
    v_port = [dict(views[1], portrait=True)]
    out_l = offline_reconstruction_multi_ar(core, v_land, render_bs=1)
    out_p = offline_reconstruction_multi_ar(core, v_port, render_bs=1)
    assert np.abs(out_l[0]["pts3d"] - out_p[0]["pts3d"]).max() > 1e-4
