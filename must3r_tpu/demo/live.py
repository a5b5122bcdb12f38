"""Live reconstruction viewer: watch the pointcloud grow in a browser.

Replaces the reference's viser websocket streaming
(reference must3r/demo/viser.py:211-266, fed per memory batch from
`inference_multi_ar`, inference.py:448-449) with a zero-dependency stdlib
stack:

  * a background `http.server` thread serves
      /          the viewer page (same software point renderer as
                 tools/viz.py's static scene.html, plus polling)
      /version   a monotonically increasing snapshot counter
      /data.bin  the latest snapshot (header + f32 xyz + u8 rgb + f32 cams)
  * producers call :meth:`LiveViewer.set_views` with accumulated points
    per memory batch (offline) or per keyframe (SLAM); the browser polls
    /version a few times a second and refetches only on change.

Usage::

    viewer = LiveViewer(port=8642)          # prints the URL
    offline_reconstruction(core, imgs, on_update=viewer.update_callback())
    ...
    viewer.close()
"""

from __future__ import annotations

import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_MAGIC = 0x4D553352  # 'MU3R'

_PAGE_TMPL = """<!doctype html>
<html><head><meta charset="utf-8"><title>must3r-tpu live</title>
<style>html,body{margin:0;height:100%;background:#111;overflow:hidden}
canvas{display:block}#hud{position:fixed;top:8px;left:8px;color:#9a9;
font:12px monospace}
#ctl{position:fixed;top:8px;right:8px;color:#9a9;font:12px monospace;
background:#1c1c1cd0;padding:8px 10px;border-radius:6px}
#ctl input[type=range]{width:110px;vertical-align:middle}
#ctl label{display:block;margin:3px 0}
#app{position:fixed;bottom:8px;left:8px;color:#9a9;font:12px monospace;
background:#1c1c1cd0;padding:8px 10px;border-radius:6px;max-width:340px}
#app button,#app select{font:12px monospace}</style></head><body>
<div id="hud">must3r-tpu live &middot; waiting for data&hellip;</div>
<!--EXTRA_HTML-->
<div id="ctl">
<label>conf thr <input id="thr" type="range" min="1" max="10" step="0.1"
 value="1.5"> <span id="thrv">1.5</span></label>
<label>point px <input id="psz" type="range" min="1" max="5" step="1"
 value="1"> <span id="pszv">1</span></label>
<label><input id="kf" type="checkbox"> keyframes only</label>
</div>
<canvas id="c"></canvas>
<script>
let pts=new Float32Array(0), cols=new Uint8Array(0), cams=new Float32Array(0);
let N=0, version=-1, pointSize=1;
let cx=0,cy=0,cz=0,scale=1;
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
const hud=document.getElementById('hud');
let yaw=0.6,pitch=-0.4,dist=2.4,panx=0,pany=0;
function recenter(){
  if(!N)return;cx=cy=cz=0;
  for(let i=0;i<N;i++){cx+=pts[3*i];cy+=pts[3*i+1];cz+=pts[3*i+2];}
  cx/=N;cy/=N;cz/=N;scale=1e-6;
  for(let i=0;i<N;i++){const dx=pts[3*i]-cx,dy=pts[3*i+1]-cy,dz=pts[3*i+2]-cz;
  scale=Math.max(scale,Math.hypot(dx,dy,dz));}
}
function draw(){
  const W=cv.width=innerWidth,H=cv.height=innerHeight;
  ctx.fillStyle='#111';ctx.fillRect(0,0,W,H);
  if(!N)return;
  const cyw=Math.cos(yaw),syw=Math.sin(yaw),cp=Math.cos(pitch),sp=Math.sin(pitch);
  const f=0.9*Math.min(W,H), img=ctx.createImageData(W,H), d=img.data;
  const zb=new Float32Array(W*H).fill(1e9);
  function proj(x,y,z){
    x=(x-cx)/scale;y=(y-cy)/scale;z=(z-cz)/scale;
    let X=cyw*x+syw*z, Z=-syw*x+cyw*z;
    let Y=cp*y-sp*Z;  Z=sp*y+cp*Z;
    Z+=dist;
    if(Z<0.05)return null;
    return [W/2+f*X/Z+panx, H/2+f*Y/Z+pany, Z];
  }
  const s=pointSize;
  for(let i=0;i<N;i++){
    const p=proj(pts[3*i],pts[3*i+1],pts[3*i+2]);
    if(!p)continue;const px=p[0]|0,py=p[1]|0;
    for(let ddy=0;ddy<s;ddy++)for(let ddx=0;ddx<s;ddx++){
      const qx=px+ddx,qy=py+ddy;
      if(qx<0||qy<0||qx>=W||qy>=H)continue;
      const o=qy*W+qx;if(p[2]>zb[o])continue;zb[o]=p[2];
      const q=4*o;d[q]=cols[3*i];d[q+1]=cols[3*i+1];d[q+2]=cols[3*i+2];d[q+3]=255;
    }
  }
  ctx.putImageData(img,0,0);
  ctx.strokeStyle='#e33';ctx.lineWidth=1.5;
  for(let i=0;i<cams.length/3;i++){
    const a=proj(cams[3*i],cams[3*i+1],cams[3*i+2]);if(!a)continue;
    ctx.beginPath();ctx.arc(a[0],a[1],4,0,7);ctx.stroke();
  }
}
async function poll(){
  try{
    const r=await fetch('/version');const v=parseInt(await r.text());
    if(v!==version){
      const buf=await (await fetch('/data.bin?v='+v)).arrayBuffer();
      const dv=new DataView(buf);
      const n=dv.getUint32(8,true), ncam=dv.getUint32(12,true);
      let off=16;
      pts=new Float32Array(buf,off,n*3);off+=n*12;
      cols=new Uint8Array(buf,off,n*3);off+=Math.ceil(n*3/4)*4;
      cams=new Float32Array(buf,off,ncam*3);
      N=n;version=v;recenter();
      hud.textContent='must3r-tpu live \\u00b7 '+N+' points \\u00b7 '
        +(ncam)+' cams \\u00b7 v'+v+' \\u00b7 drag=orbit wheel=zoom';
      requestAnimationFrame(draw);
    }
  }catch(e){}
  setTimeout(poll,300);
}
let drag=false,px0=0,py0=0,mode=0;
cv.onmousedown=e=>{drag=true;px0=e.clientX;py0=e.clientY;mode=e.shiftKey?1:0;};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;const dx=e.clientX-px0,dy=e.clientY-py0;
px0=e.clientX;py0=e.clientY;
if(mode){panx+=dx;pany+=dy;}else{yaw+=dx*0.008;pitch+=dy*0.008;}
requestAnimationFrame(draw);};
onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);requestAnimationFrame(draw);};
onresize=()=>requestAnimationFrame(draw);
const thr=document.getElementById('thr'),psz=document.getElementById('psz'),
      kfc=document.getElementById('kf');
function sendCtl(){
  fetch('/controls',{method:'POST',headers:{'Content-Type':
   'application/json'},body:JSON.stringify({conf_thr:parseFloat(thr.value),
   kf_only:kfc.checked})}).catch(()=>{});
}
thr.oninput=()=>{document.getElementById('thrv').textContent=thr.value;};
thr.onchange=sendCtl; kfc.onchange=sendCtl;
psz.oninput=()=>{document.getElementById('pszv').textContent=psz.value;
  pointSize=parseInt(psz.value);requestAnimationFrame(draw);};
//EXTRA_JS
draw();poll();
</script></body></html>
"""


def make_page(extra_html: str = "", extra_js: str = "") -> str:
    """Build the viewer page with optional extra panel markup / script
    (used by the interactive web demo, demo/webapp.py)."""
    return (_PAGE_TMPL.replace("<!--EXTRA_HTML-->", extra_html)
            .replace("//EXTRA_JS", extra_js))


_PAGE = make_page()


def _pack_snapshot(version: int, pts: np.ndarray, cols: np.ndarray,
                   cams: np.ndarray) -> bytes:
    n = len(pts)
    col_bytes = np.ascontiguousarray(cols, np.uint8).tobytes()
    pad = (-len(col_bytes)) % 4
    return b"".join([
        struct.pack("<IIII", _MAGIC, version, n, len(cams)),
        np.ascontiguousarray(pts, "<f4").tobytes(),
        col_bytes, b"\x00" * pad,
        np.ascontiguousarray(cams, "<f4").tobytes(),
    ])


class LiveViewer:
    """Incremental scene viewer over a background HTTP server."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1",
                 max_points: int = 400_000, verbose: bool = True,
                 page: Optional[str] = None, app=None):
        """page: override the served HTML (see `make_page`). app: optional
        object with `handle_get(path, qs) -> (ctype, bytes) | None` and
        `handle_post(path, body, qs) -> (ctype, bytes) | None`; consulted
        for any route the viewer itself doesn't serve (the web demo)."""
        self.max_points = max_points
        self._page = (page or _PAGE).encode()
        self.app = app
        self._lock = threading.Lock()
        self._version = 0
        self._snapshot = _pack_snapshot(0, np.zeros((0, 3), np.float32),
                                        np.zeros((0, 3), np.uint8),
                                        np.zeros((0, 3), np.float32))
        # interactive controls (reference gradio re-threshold sliders,
        # demo/gradio.py:132-156,459-482): the page POSTs /controls;
        # `on_controls` (set by serve_scene) re-filters and re-publishes
        self.controls: dict = {"conf_thr": 1.5, "kf_only": False}
        self.on_controls = None
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                path, _, qs = self.path.partition("?")
                if path in ("/", "/index.html"):
                    body = viewer._page
                    ctype = "text/html"
                elif path == "/version":
                    with viewer._lock:
                        body = str(viewer._version).encode()
                    ctype = "text/plain"
                elif path == "/data.bin":
                    with viewer._lock:
                        body = viewer._snapshot
                    ctype = "application/octet-stream"
                else:
                    res = (viewer.app.handle_get(path, qs)
                           if viewer.app is not None else None)
                    if res is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    ctype, body = res
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                import json

                path, _, qs = self.path.partition("?")
                if path != "/controls":
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n) if n else b""
                    res = (viewer.app.handle_post(path, body, qs)
                           if viewer.app is not None else None)
                    if res is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    ctype, out = res
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(out)))
                    self.end_headers()
                    self.wfile.write(out)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    ctl = json.loads(self.rfile.read(n) or b"{}")
                except Exception:
                    ctl = {}
                with viewer._lock:
                    viewer.controls.update(
                        {k: ctl[k] for k in ("conf_thr", "kf_only")
                         if k in ctl})
                    cb = viewer.on_controls
                    snapshot = dict(viewer.controls)
                if cb is not None:
                    cb(snapshot)
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self.url = f"http://{host}:{self.port}/"
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        if verbose:
            print(f"live viewer: {self.url}")

    # -- producer API -------------------------------------------------------

    def set_views(self, pts: np.ndarray, cols: np.ndarray,
                  cams: Optional[np.ndarray] = None):
        """Publish a snapshot: pts [N, 3] float, cols [N, 3] uint8 (or
        float in [0,1]/[-1,1]), cams [C, 3] camera centers."""
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        cols = np.asarray(cols)
        if cols.dtype != np.uint8:
            c = cols.astype(np.float32)
            if c.min() < -0.01:           # ImgNorm range
                c = c * 0.5 + 0.5
            cols = (np.clip(c, 0, 1) * 255).astype(np.uint8)
        cols = cols.reshape(-1, 3)
        if len(pts) > self.max_points:
            sel = np.random.default_rng(0).choice(
                len(pts), self.max_points, replace=False)
            pts, cols = pts[sel], cols[sel]
        cams = (np.zeros((0, 3), np.float32) if cams is None
                else np.asarray(cams, np.float32).reshape(-1, 3))
        with self._lock:
            self._version += 1
            self._snapshot = _pack_snapshot(self._version, pts, cols, cams)

    def update_callback(self, imgs=None, conf_thr: float = 1.5,
                        imgs_normalized: bool = True):
        """Build an `on_update(ids, partial)` hook for
        `offline_reconstruction`: accumulates each memory batch's
        confidence-filtered points (the viser `set_views` role,
        reference inference.py:448-449).

        imgs: optional [V, H, W, 3] images for true colors; without them
        points are colored by confidence. imgs_normalized says whether
        they are ImgNorm'd ([-1,1]); the caller knows, so we denormalize
        here explicitly rather than letting set_views guess the range
        from the sampled pixel values (a bright crop can be all >= 0 and
        would render half-brightness)."""
        if imgs is not None and np.asarray(imgs).dtype != np.uint8:
            a = np.asarray(imgs, np.float32)
            if imgs_normalized:
                a = a * 0.5 + 0.5
            imgs = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
        acc_pts, acc_cols, acc_cams = [], [], []

        def on_update(ids, partial):
            pts = np.asarray(partial["pts3d"], np.float32)
            conf = np.asarray(partial["conf"], np.float32)
            for j, vid in enumerate(ids):
                keep = conf[j] > conf_thr
                if not keep.any():
                    keep = np.ones_like(conf[j], bool)
                p = pts[j][keep]
                if imgs is not None:
                    c = np.asarray(imgs[vid])[keep]
                else:
                    q = conf[j][keep, None]
                    c = np.concatenate([q / q.max(initial=1.0),
                                        0.5 * np.ones_like(q),
                                        1.0 - q / q.max(initial=1.0)], -1)
                acc_pts.append(p)
                acc_cols.append(c)
            if "c2w" in partial:
                acc_cams.append(np.asarray(
                    partial["c2w"])[:, :3, 3].reshape(-1, 3))
            self.set_views(np.concatenate(acc_pts),
                           np.concatenate(acc_cols),
                           np.concatenate(acc_cams) if acc_cams else None)

        return on_update

    def serve_scene(self, scene, keyframe_ids=None):
        """Interactive post-hoc re-thresholding of a finished SceneState
        (reference gradio's slider -> get_3D_model_from_scene flow,
        demo/gradio.py:459-482): hooks `on_controls` so the browser's
        conf-threshold slider / keyframes-only toggle re-filter the
        already-computed pointmaps -- no re-inference."""
        # per-view lists, not one stacked array: mixed-AR scenes are ragged
        pts = [np.asarray(p, np.float32) for p in scene.pts3d]
        conf = [np.asarray(c, np.float32) for c in scene.conf]

        def to_u8(a):
            a = np.asarray(a)
            if a.dtype != np.uint8:
                a = (np.clip(a.astype(np.float32) * 0.5 + 0.5, 0, 1)
                     * 255).astype(np.uint8)
            return a

        imgs = [to_u8(im) for im in scene.imgs]
        cams = np.asarray(scene.cams2world, np.float32)[:, :3, 3]
        kf = set(int(i) for i in (keyframe_ids or []))

        def push(controls):
            thr = float(controls.get("conf_thr", 1.5))
            kf_only = bool(controls.get("kf_only", False)) and kf
            sel = [i for i in range(len(pts))
                   if not kf_only or i in kf]
            p_parts, c_parts = [], []
            for i in sel:
                keep = conf[i] > thr
                p_parts.append(pts[i][keep])
                c_parts.append(imgs[i][keep])
            self.set_views(
                np.concatenate(p_parts) if p_parts
                else np.zeros((0, 3), np.float32),
                np.concatenate(c_parts) if c_parts
                else np.zeros((0, 3), np.uint8),
                cams[sel] if sel else None)

        self.on_controls = push
        with self._lock:
            snapshot = dict(self.controls)
        push(snapshot)

    def close(self):
        self._server.shutdown()
        self._server.server_close()
