"""SLAM web GUI: live map + frame/depth/confidence panels + controls.

The reference ships this surface as an Open3D desktop GUI
(reference must3r/slam/slam.py:246-564: camera-frame, depth and
confidence image panels, follow-cam toggle, pause control, live map).
open3d does not exist in this environment, so this serves the same
product surface in the browser on the demo/live.py stdlib HTTP stack:

  GET  /panel/frame.png   latest camera frame
  GET  /panel/depth.png   latest predicted depth (grayscale, near=bright)
  GET  /panel/conf.png    latest confidence (blue=low, red=high)
  GET  /gui               JSON {paused, panels_version, stats}
  POST /gui               JSON {paused: bool}

plus the viewer's own /, /version, /data.bin, /controls (map points,
conf-threshold slider). Follow-cam is client-side: the page re-centers
the orbit on the newest camera position. The reference GUI's
video-record buttons capture its OpenGL canvas; a headless server has no
canvas, so recording is intentionally absent.
"""

from __future__ import annotations

import io
import json
import threading
from typing import Optional

import numpy as np

from must3r_tpu.demo.live import LiveViewer, make_page

_SLAM_HTML = """
<div id="app">
<b>must3r-tpu SLAM</b> <span id="sst"></span><br>
<img id="pframe" width="150" style="image-rendering:pixelated">
<img id="pdepth" width="150" style="image-rendering:pixelated">
<img id="pconf" width="150" style="image-rendering:pixelated"><br>
<label><input id="follow" type="checkbox"> follow cam</label>
<button id="pauseb">pause</button>
</div>
"""

_SLAM_JS = """
let pv=-1,paused=false;
const sst=document.getElementById('sst'),
      followc=document.getElementById('follow');
async function pollGui(){
  try{
    const g=await (await fetch('/gui')).json();
    paused=g.paused;
    document.getElementById('pauseb').textContent=paused?'resume':'pause';
    sst.textContent=g.stats;
    if(g.panels_version!==pv){
      pv=g.panels_version;
      for(const n of ['frame','depth','conf'])
        document.getElementById('p'+n).src='/panel/'+n+'.png?v='+pv;
    }
  }catch(e){}
  setTimeout(pollGui,500);
}
pollGui();
document.getElementById('pauseb').onclick=()=>{
  fetch('/gui',{method:'POST',headers:{'Content-Type':'application/json'},
   body:JSON.stringify({paused:!paused})});};
const _recenter=recenter;
recenter=function(){
  _recenter();
  if(followc.checked&&cams.length>=3){
    cx=cams[cams.length-3];cy=cams[cams.length-2];cz=cams[cams.length-1];
  }
};
followc.onchange=()=>{recenter();requestAnimationFrame(draw);};
"""


def _to_png(arr: np.ndarray) -> bytes:
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def _depth_image(depth: np.ndarray) -> np.ndarray:
    """Grayscale u8, near = bright, robust 5-95 percentile range."""
    d = np.asarray(depth, np.float32)
    lo, hi = np.percentile(d, [5.0, 95.0])
    d = np.clip((d - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
    g = ((1.0 - d) * 255).astype(np.uint8)
    return np.stack([g, g, g], -1)


def _conf_image(conf: np.ndarray) -> np.ndarray:
    """Blue (low) -> red (high) confidence map, log-scaled like the
    reference panel (conf >= 1)."""
    c = np.log(np.maximum(np.asarray(conf, np.float32), 1.0))
    c = np.clip(c / max(float(np.percentile(c, 95.0)), 1e-6), 0.0, 1.0)
    r = (c * 255).astype(np.uint8)
    b = ((1.0 - c) * 255).astype(np.uint8)
    return np.stack([r, (0.2 * 255 * np.ones_like(c)).astype(np.uint8), b],
                    -1)


class SlamWebGUI:
    """Browser GUI for a running SLAM session (Open3D GUI role)."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1",
                 verbose: bool = True, panel_every: int = 1):
        self.panel_every = max(1, panel_every)
        self._lock = threading.Lock()
        self._panels = {}
        self._panels_version = 0
        self._paused = False
        self._stats = ""
        self._n_published = 0
        self.viewer = LiveViewer(port=port, host=host, verbose=False,
                                 page=make_page(_SLAM_HTML, _SLAM_JS),
                                 app=self)
        self.url = self.viewer.url
        if verbose:
            print(f"slam gui: {self.url}")

    # -- producer API (called from the SLAM loop) --------------------------

    @property
    def paused(self) -> bool:
        with self._lock:
            return self._paused

    def publish_frame(self, frame_u8: np.ndarray, out: dict,
                      stats: str = ""):
        """Publish the per-frame panels. `out` is the Must3rSLAM()
        result with return_maps=True ('pts3d_local' [H, W, 3],
        'conf' [H, W]); panels update every `panel_every`-th call."""
        self._n_published += 1
        if (self._n_published - 1) % self.panel_every:
            with self._lock:
                self._stats = stats or self._stats
            return
        panels = {"frame": _to_png(np.asarray(frame_u8, np.uint8))}
        if "pts3d_local" in out:
            panels["depth"] = _to_png(
                _depth_image(np.asarray(out["pts3d_local"])[..., 2]))
        if "conf" in out:
            panels["conf"] = _to_png(_conf_image(out["conf"]))
        with self._lock:
            self._panels.update(panels)
            self._panels_version += 1
            if stats:
                self._stats = stats

    def set_map(self, pts, cols, cams=None):
        self.viewer.set_views(pts, cols, cams)

    # LiveViewer-compatible alias (the SLAM CLI treats either as `viewer`)
    set_views = set_map

    # -- app protocol -------------------------------------------------------

    def handle_get(self, path: str, qs: str):
        if path.startswith("/panel/") and path.endswith(".png"):
            name = path[len("/panel/"):-len(".png")]
            with self._lock:
                body = self._panels.get(name)
            if body is None:
                # 1x1 placeholder until the first publish
                body = _to_png(np.zeros((1, 1, 3), np.uint8))
            return "image/png", body
        if path == "/gui":
            with self._lock:
                body = json.dumps({
                    "paused": self._paused,
                    "panels_version": self._panels_version,
                    "stats": self._stats}).encode()
            return "application/json", body
        return None

    def handle_post(self, path: str, body: bytes, qs: str):
        if path != "/gui":
            return None
        try:
            req = json.loads(body or b"{}")
        except Exception:
            req = {}
        with self._lock:
            if "paused" in req:
                self._paused = bool(req["paused"])
            out = json.dumps({"paused": self._paused}).encode()
        return "application/json", out

    def close(self):
        self.viewer.close()
