"""Interactive web demo end-to-end over real HTTP (tiny core, CPU).

Covers the reference gradio workflow (upload -> run -> explore -> export,
reference must3r/demo/gradio.py:354-513) as served by demo/webapp.py.
"""

import io
import json
import struct
import time
import urllib.request

import jax
import numpy as np
import PIL.Image
import pytest

from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.demo.webapp import WebDemo
from must3r_tpu.engine import InferenceCore
from must3r_tpu.models import init_decoder, init_encoder

ENC_CFG = EncoderConfig(img_size=(64, 64), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2)
DEC_CFG = DecoderConfig(img_size=(64, 64), enc_embed_dim=64, patch_size=16,
                        embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2)


@pytest.fixture(scope="module")
def app():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, ENC_CFG),
                         init_decoder(k2, DEC_CFG),
                         ENC_CFG, DEC_CFG, dtype=jax.numpy.float32,
                         impl="chunked")
    demo = WebDemo(core, image_size=64, port=0, verbose=False)
    yield demo
    demo.close()


def _png(rng, h, w) -> bytes:
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(img).save(buf, "PNG")
    return buf.getvalue()


def _post(url, path, body=b"", qs=""):
    full = url.rstrip("/") + path + (("?" + qs) if qs else "")
    req = urllib.request.Request(full, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def _get(url, path):
    with urllib.request.urlopen(url.rstrip("/") + path, timeout=30) as r:
        return r.read()


def _wait_done(url, timeout_s=600):
    deadline = time.time() + timeout_s
    s = {}
    while time.time() < deadline:
        s = json.loads(_get(url, "/status"))
        if s["state"] in ("done", "error"):
            return s
        time.sleep(0.5)
    return s


def _reset(url):
    assert json.loads(_post(url, "/reset")).get("ok")


def test_webapp_page_and_guards(app, rng):
    page = _get(app.url, "/").decode()
    assert "upload" in page and "run reconstruction" in page
    # run with too few images is refused
    _reset(app.url)
    out = json.loads(_post(app.url, "/run"))
    assert "error" in out
    # undecodable upload is reported, not fatal
    out = json.loads(_post(app.url, "/upload", b"not an image",
                           qs="name=bad.png"))
    assert "error" in out


def test_webapp_end_to_end(app, rng):
    _reset(app.url)
    for i in range(3):
        out = json.loads(_post(app.url, "/upload", _png(rng, 48, 64),
                               qs=f"name=im{i}.png"))
        assert out["count"] == i + 1
    body = json.dumps({"mode": "linseq", "num_mem_images": 3}).encode()
    assert json.loads(_post(app.url, "/run", body)).get("ok")
    s = _wait_done(app.url)
    assert s["state"] == "done", s

    # the viewer snapshot has points (live streaming + final serve_scene)
    data = _get(app.url, "/data.bin")
    n = struct.unpack("<I", data[8:12])[0]
    assert n > 0

    # interactive re-threshold round-trip (the gradio slider flow)
    _post(app.url, "/controls",
          json.dumps({"conf_thr": 1.0}).encode())
    data2 = _get(app.url, "/data.bin")
    assert struct.unpack("<I", data2[8:12])[0] > 0

    # exports
    glb = _get(app.url, "/export.glb?conf_thr=1.0")
    assert glb[:4] == b"glTF"
    ply = _get(app.url, "/export.ply")
    assert ply[:3] == b"ply"

    # reset clears state
    _reset(app.url)
    s = json.loads(_get(app.url, "/status"))
    assert s["n_images"] == 0 and not s["has_scene"]


def test_webapp_mixed_aspect_ratios(app, rng):
    """Mixed-AR uploads route through the multi-AR driver and produce a
    ragged scene that still filters and exports."""
    _reset(app.url)
    for i in range(2):
        _post(app.url, "/upload", _png(rng, 48, 64), qs=f"name=a{i}.png")
    for i in range(2):
        _post(app.url, "/upload", _png(rng, 32, 128), qs=f"name=b{i}.png")
    assert json.loads(_post(app.url, "/run",
                            json.dumps({"mode": "retrieval",
                                        "num_mem_images": 4}).encode()
                            )).get("ok")
    s = _wait_done(app.url)
    assert s["state"] == "done", s
    glb = _get(app.url, "/export.glb?conf_thr=1.0")
    assert glb[:4] == b"glTF"
    _reset(app.url)
