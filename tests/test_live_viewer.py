"""Live streaming viewer: HTTP round-trip + per-batch feed from
offline_reconstruction (the viser streaming role,
reference demo/viser.py:211-266 + inference.py:448-449)."""

import struct
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from must3r_tpu.demo.live import _MAGIC, LiveViewer


def _fetch(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_live_viewer_http_roundtrip(rng):
    viewer = LiveViewer(port=0, verbose=False)
    try:
        page = _fetch(viewer.url).decode()
        assert "must3r-tpu live" in page and "/data.bin" in page
        assert _fetch(viewer.url + "version") == b"0"

        pts = rng.standard_normal((100, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (100, 3)).astype(np.uint8)
        cams = np.zeros((2, 3), np.float32)
        viewer.set_views(pts, cols, cams)
        assert _fetch(viewer.url + "version") == b"1"

        blob = _fetch(viewer.url + "data.bin")
        magic, ver, n, ncam = struct.unpack("<IIII", blob[:16])
        assert magic == _MAGIC and ver == 1 and n == 100 and ncam == 2
        got = np.frombuffer(blob[16:16 + n * 12], "<f4").reshape(n, 3)
        np.testing.assert_allclose(got, pts)
        off = 16 + n * 12
        got_cols = np.frombuffer(blob[off:off + n * 3], np.uint8)
        np.testing.assert_array_equal(got_cols, cols.ravel())

        # second update bumps the version
        viewer.set_views(pts[:10], cols[:10])
        assert _fetch(viewer.url + "version") == b"2"
    finally:
        viewer.close()


def test_offline_reconstruction_streams_updates(rng):
    """on_update fires once per memory batch with that batch's predictions
    and the viewer accumulates them."""
    from must3r_tpu.config import DecoderConfig, EncoderConfig
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.inference import offline_reconstruction

    from must3r_tpu.models import init_decoder, init_encoder

    hw = (32, 32)
    enc_cfg = EncoderConfig(img_size=hw, patch_size=16, embed_dim=32,
                            depth=1, num_heads=2)
    dec_cfg = DecoderConfig(img_size=hw, enc_embed_dim=32, patch_size=16,
                            embed_dim=32, output_dim=16 * 16 * 7, depth=1,
                            num_heads=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.float32, impl="chunked")
    imgs = jnp.asarray(rng.standard_normal((4, *hw, 3)), jnp.float32)

    calls = []
    viewer = LiveViewer(port=0, verbose=False)
    hook = viewer.update_callback(imgs=np.asarray(imgs))

    def on_update(ids, partial):
        calls.append((list(ids), set(partial)))
        hook(ids, partial)

    try:
        offline_reconstruction(core, imgs, img_hw=hw, on_update=on_update)
        # schedule [2, 1, 1] -> 3 update batches
        assert [c[0] for c in calls] == [[0, 1], [2], [3]]
        assert all({"pts3d", "conf"} <= keys for _, keys in calls)
        blob = _fetch(viewer.url + "data.bin")
        _, ver, n, ncam = struct.unpack("<IIII", blob[:16])
        assert ver == 3 and n > 0 and ncam == 4
    finally:
        viewer.close()


def test_interactive_controls_rethreshold(rng):
    """POST /controls re-filters a served SceneState (the gradio
    slider -> get_3D_model_from_scene flow, demo/gradio.py:459-482)."""
    import json
    import struct as _struct

    from must3r_tpu.demo.inference import SceneState

    v, h, w = 3, 8, 8
    conf = 2.0 * np.ones((v, h, w), np.float32)
    conf[0] += 9.0          # view 0 survives any threshold <= 11
    scene = SceneState(
        pts3d=rng.standard_normal((v, h, w, 3)).astype(np.float32),
        pts3d_local=np.zeros((v, h, w, 3), np.float32),
        conf=conf,
        imgs=rng.integers(0, 255, (v, h, w, 3)).astype(np.uint8),
        true_shape=np.tile([h, w], (v, 1)),
        focals=np.ones((v,), np.float32),
        cams2world=np.tile(np.eye(4, dtype=np.float32), (v, 1, 1)),
        image_list=[f"im{i}" for i in range(v)])

    viewer = LiveViewer(port=0, verbose=False)
    try:
        page = _fetch(viewer.url).decode()
        assert "conf thr" in page and "/controls" in page
        viewer.serve_scene(scene, keyframe_ids=[0, 2])
        blob = _fetch(viewer.url + "data.bin")
        _, ver1, n1, ncam1 = _struct.unpack("<IIII", blob[:16])
        assert n1 == v * h * w and ncam1 == v     # thr 1.5 keeps all

        req = urllib.request.Request(
            viewer.url + "controls",
            data=json.dumps({"conf_thr": 5.0, "kf_only": True}).encode(),
            method="POST")
        assert urllib.request.urlopen(req, timeout=10).read() == b"ok"
        blob = _fetch(viewer.url + "data.bin")
        _, ver2, n2, ncam2 = _struct.unpack("<IIII", blob[:16])
        assert ver2 == ver1 + 1
        assert n2 == h * w            # only view 0 survives thr 5
        assert ncam2 == 2             # keyframes-only: views {0, 2}
        assert viewer.controls["conf_thr"] == 5.0
    finally:
        viewer.close()
