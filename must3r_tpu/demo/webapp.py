"""Interactive web demo: upload images -> reconstruct -> explore/export.

The reference ships this product surface as a gradio app
(reference must3r/demo/gradio.py:354-513: image upload, execution-mode
select, memory-image count, live conf-threshold re-filtering, an embedded
3D viewer, GLB download). gradio does not exist in this environment, so
this is the same workflow on the zero-dependency stdlib HTTP stack of
demo/live.py: the LiveViewer serves the point renderer + controls, and a
`WebDemo` app object adds upload / run / status / export routes plus a
control panel to the page.

Endpoints (beyond the LiveViewer's /, /version, /data.bin, /controls):

  POST /upload?name=<f>   raw image bytes (any PIL format) -> stored
  POST /run               JSON settings -> background reconstruction
  POST /reset             drop uploads + scene
  GET  /status            JSON {state, msg, n_images}
  GET  /export.glb?conf_thr=3   GLB of the current scene
  GET  /export.ply?conf_thr=3   PLY of the current scene

Mixed aspect-ratio uploads are routed through the multi-AR driver and
produce a ragged SceneState (per-view lists); uniform collections use the
keyframed single-bucket pipeline with live per-batch streaming.
"""

from __future__ import annotations

import io
import json
import os
import tempfile
import threading
import urllib.parse
from typing import List, Optional, Tuple

import numpy as np

from must3r_tpu.demo.inference import (
    SceneState,
    must3r_inference,
    must3r_inference_video,
)
from must3r_tpu.demo.live import LiveViewer, make_page
from must3r_tpu.tools.image import denormalize_image, preprocess_image

_PANEL_HTML = """
<div id="app">
<b>must3r-tpu web demo</b><br>
<input id="files" type="file" multiple accept="image/*">
<button id="up">upload</button><br>
mode <select id="mode"><option>retrieval</option><option>linseq</option>
<option>vidseq</option><option>vidslam</option></select>
mem <input id="nmem" type="number" value="20" style="width:44px">
refine <input id="refine" type="number" value="0" style="width:34px"><br>
<button id="runb">run reconstruction</button>
<button id="resetb">reset</button>
<a id="glb" href="/export.glb" style="color:#7a7">GLB</a>
<a id="ply" href="/export.ply" style="color:#7a7">PLY</a><br>
<span id="st">idle</span>
</div>
"""

_PANEL_JS = """
const st=document.getElementById('st');
document.getElementById('up').onclick=async()=>{
  const fs=document.getElementById('files').files;
  for(const f of fs){
    await fetch('/upload?name='+encodeURIComponent(f.name),
                {method:'POST',body:await f.arrayBuffer()});
  }
};
document.getElementById('runb').onclick=()=>{
  fetch('/run',{method:'POST',headers:{'Content-Type':'application/json'},
   body:JSON.stringify({mode:document.getElementById('mode').value,
   num_mem_images:parseInt(document.getElementById('nmem').value),
   num_refinements_iterations:
     parseInt(document.getElementById('refine').value)})});
};
document.getElementById('resetb').onclick=()=>{
  fetch('/reset',{method:'POST'});};
async function pollStatus(){
  try{const s=await (await fetch('/status')).json();
      st.textContent=s.state+' \\u00b7 '+s.n_images+' imgs'
        +(s.msg?' \\u00b7 '+s.msg:'');}catch(e){}
  setTimeout(pollStatus,700);
}
pollStatus();
const glbl=document.getElementById('glb'),plyl=document.getElementById('ply');
thr.addEventListener('change',()=>{
  glbl.href='/export.glb?conf_thr='+thr.value;
  plyl.href='/export.ply?conf_thr='+thr.value;});
"""


def _scene_from_multi_ar(views, results) -> SceneState:
    """Assemble a (possibly ragged) SceneState from per-view multi-AR
    postprocess dicts."""
    rgbs = [denormalize_image(np.asarray(v["img"])) for v in views]
    return SceneState(
        pts3d=[np.asarray(r["pts3d"]) for r in results],
        pts3d_local=[np.asarray(r["pts3d_local"]) for r in results],
        conf=[np.asarray(r["conf"]) for r in results],
        imgs=rgbs,
        true_shape=np.asarray([v["true_shape"] for v in views]),
        focals=np.asarray([float(r["focal"]) for r in results]),
        cams2world=np.stack([np.asarray(r["c2w"]) for r in results]),
        image_list=[v.get("path", str(i)) for i, v in enumerate(views)])


class WebDemo:
    """Upload/run/export control surface over a LiveViewer.

    Args:
      core: an `InferenceCore` (model already loaded).
      image_size: bucket maxdim for `preprocess_image`.
      retrieval_head: optional RetrievalHead for keyframe selection.
    """

    def __init__(self, core, image_size: int = 512, port: int = 0,
                 host: str = "127.0.0.1", retrieval_head=None,
                 verbose: bool = True, max_upload_mb: int = 64):
        self.core = core
        self.image_size = image_size
        self.retrieval_head = retrieval_head
        self.max_upload = max_upload_mb * 1024 * 1024
        self._lock = threading.Lock()
        self._uploads: List[Tuple[str, np.ndarray]] = []
        self._scene: Optional[SceneState] = None
        self._state = "idle"
        self._msg = ""
        self._worker: Optional[threading.Thread] = None
        self.viewer = LiveViewer(port=port, host=host, verbose=False,
                                 page=make_page(_PANEL_HTML, _PANEL_JS),
                                 app=self)
        self.url = self.viewer.url
        if verbose:
            print(f"web demo: {self.url}")

    # -- status ----------------------------------------------------------

    def _set(self, state=None, msg=None):
        with self._lock:
            if state is not None:
                self._state = state
            if msg is not None:
                self._msg = msg

    # -- app protocol (LiveViewer delegates unknown routes here) ----------

    def handle_get(self, path: str, qs: str):
        params = urllib.parse.parse_qs(qs)
        if path == "/status":
            with self._lock:
                body = json.dumps({
                    "state": self._state, "msg": self._msg,
                    "n_images": len(self._uploads),
                    "has_scene": self._scene is not None}).encode()
            return "application/json", body
        if path in ("/export.glb", "/export.ply"):
            with self._lock:
                scene = self._scene
            if scene is None:
                return "application/json", b'{"error": "no scene yet"}'
            thr = float(params.get("conf_thr", ["3.0"])[0])
            from must3r_tpu.demo.export import scene_to_glb, scene_to_ply
            ext = path.rsplit(".", 1)[1]
            with tempfile.TemporaryDirectory() as td:
                out = os.path.join(td, f"scene.{ext}")
                (scene_to_glb if ext == "glb" else scene_to_ply)(
                    scene, out, conf_thr=thr)
                with open(out, "rb") as f:
                    data = f.read()
            return "application/octet-stream", data
        return None

    def handle_post(self, path: str, body: bytes, qs: str):
        params = urllib.parse.parse_qs(qs)
        if path == "/upload":
            if len(body) > self.max_upload:
                return "application/json", b'{"error": "too large"}'
            name = params.get("name", [f"img{len(self._uploads)}"])[0]
            try:
                import PIL.Image
                import PIL.ImageOps
                with PIL.Image.open(io.BytesIO(body)) as pil:
                    pil = PIL.ImageOps.exif_transpose(pil)
                    img = np.asarray(pil.convert("RGB"))
            except Exception as e:  # undecodable upload
                return "application/json", json.dumps(
                    {"error": f"cannot decode {name}: {e}"}).encode()
            with self._lock:
                self._uploads.append((name, img))
                n = len(self._uploads)
            return "application/json", json.dumps({"count": n}).encode()
        if path == "/run":
            try:
                settings = json.loads(body or b"{}")
            except Exception:
                settings = {}
            with self._lock:
                busy = self._worker is not None and self._worker.is_alive()
                n = len(self._uploads)
            if busy:
                return "application/json", b'{"error": "already running"}'
            if n < 2:
                return "application/json", \
                    b'{"error": "need at least 2 images"}'
            self._worker = threading.Thread(
                target=self._run, args=(settings,), daemon=True)
            self._worker.start()
            return "application/json", b'{"ok": true}'
        if path == "/reset":
            with self._lock:
                busy = self._worker is not None and self._worker.is_alive()
                if not busy:
                    self._uploads = []
                    self._scene = None
                    self._state = "idle"
                    self._msg = ""
            ok = b'{"ok": true}' if not busy else \
                b'{"error": "running"}'
            return "application/json", ok
        return None

    # -- reconstruction worker --------------------------------------------

    def _run(self, settings: dict):
        try:
            self._set("running", "preprocessing")
            with self._lock:
                uploads = list(self._uploads)
            views = []
            for name, img in uploads:
                view = preprocess_image(img, self.image_size)
                view["path"] = name
                views.append(view)
            mode = str(settings.get("mode", "retrieval"))
            nmem = int(settings.get("num_mem_images", 20))
            init_n = int(settings.get("init_num_images", 2))
            refine = int(settings.get("num_refinements_iterations", 0))
            shapes = {v["img"].shape for v in views}

            self._set(msg=f"reconstructing ({mode}, {len(views)} views)")
            if mode in ("vidseq", "vidslam"):
                if len(shapes) != 1:
                    raise ValueError("video modes need uniform aspect "
                                     f"ratios, got {sorted(shapes)}")
                scene = must3r_inference_video(
                    self.core, views, init_num_images=init_n,
                    num_refinements_iterations=refine,
                    mode="slam" if mode == "vidslam" else "interval")
            elif len(shapes) == 1:
                imgs_v = np.stack([v["img"] for v in views])
                on_update = self.viewer.update_callback(imgs=imgs_v)
                scene = must3r_inference(
                    self.core, views, num_mem_images=nmem,
                    init_num_images=init_n,
                    is_sequence=(mode == "linseq"),
                    retrieval_head=self.retrieval_head,
                    num_refinements_iterations=refine,
                    on_update=on_update)
            else:
                from must3r_tpu.engine.inference import \
                    offline_reconstruction_multi_ar
                results = offline_reconstruction_multi_ar(
                    self.core, views,
                    mem_views=list(range(min(nmem, len(views)))),
                    init_num_images=init_n)
                scene = _scene_from_multi_ar(views, results)
            with self._lock:
                self._scene = scene
            # hand the viewer the finished scene: the conf slider /
            # keyframes-only toggle now re-filter post-hoc
            self.viewer.serve_scene(scene)
            self._set("done", f"{len(views)} views")
        except Exception as e:  # surface to /status, keep serving
            self._set("error", f"{type(e).__name__}: {e}")

    def close(self):
        self.viewer.close()
