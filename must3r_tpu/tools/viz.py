"""Visualization: dataset debug plots + self-contained HTML scene viewer.

Replaces the reference's viewer stack (dust3r `SceneViz`, viser websocket
streaming, the open3d SLAM GUI -- none of those packages exist here):
  * `plot_views` -- matplotlib 3D scatter of GT/predicted pointmaps with
    camera positions (reference datasets/base/viz.py parity).
  * `scene_to_html` -- writes ONE .html file with the confidence-filtered
    pointcloud embedded as base64 and a ~100-line vanilla-JS orbit
    renderer; opens in any browser with zero dependencies or servers.
"""

from __future__ import annotations

import base64
import json
from typing import Sequence

import numpy as np


def plot_views(views: Sequence[dict], path: str, max_points: int = 20000,
               elev: float = -60, azim: float = -90):
    """Scatter the world pointmaps of dataset views + camera centers."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    rng = np.random.default_rng(0)
    for i, vw in enumerate(views):
        pts = vw["pts3d"][vw["valid_mask"]]
        col = vw["img"][vw["valid_mask"]]
        col = (col * 0.5 + 0.5).clip(0, 1) if col.dtype != np.uint8 \
            else col / 255.0
        if len(pts) > max_points // max(len(views), 1):
            sel = rng.choice(len(pts), max_points // len(views),
                             replace=False)
            pts, col = pts[sel], col[sel]
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=col, s=0.5)
        cam = vw["camera_pose"][:3, 3]
        ax.scatter(*cam, c="red", marker="^", s=60)
        ax.text(*cam, f"cam{i}")
    ax.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


_HTML_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>must3r-tpu scene</title>
<style>html,body{margin:0;height:100%;background:#111;overflow:hidden}
canvas{display:block}#hud{position:fixed;top:8px;left:8px;color:#9a9;
font:12px monospace}</style></head><body>
<div id="hud">must3r-tpu &middot; NPTS points &middot; drag=orbit wheel=zoom
shift-drag=pan</div><canvas id="c"></canvas>
<script>
const PTS = "B64PTS", COLS = "B64COLS", CAMS = JSONCAMS;
function b64f32(s){const b=atob(s),n=b.length,u=new Uint8Array(n);
for(let i=0;i<n;i++)u[i]=b.charCodeAt(i);return new Float32Array(u.buffer);}
function b64u8(s){const b=atob(s),n=b.length,u=new Uint8Array(n);
for(let i=0;i<n;i++)u[i]=b.charCodeAt(i);return u;}
const pts=b64f32(PTS), cols=b64u8(COLS), N=pts.length/3;
let cx=0,cy=0,cz=0;for(let i=0;i<N;i++){cx+=pts[3*i];cy+=pts[3*i+1];cz+=pts[3*i+2];}
cx/=N;cy/=N;cz/=N;let scale=0;
for(let i=0;i<N;i++){const dx=pts[3*i]-cx,dy=pts[3*i+1]-cy,dz=pts[3*i+2]-cz;
scale=Math.max(scale,Math.hypot(dx,dy,dz));}
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let yaw=0.6,pitch=-0.4,dist=2.4,panx=0,pany=0;
function draw(){
  const W=cv.width=innerWidth,H=cv.height=innerHeight;
  ctx.fillStyle='#111';ctx.fillRect(0,0,W,H);
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
  for(let i=0;i<N;i++){
    const p=proj(pts[3*i],pts[3*i+1],pts[3*i+2]);
    if(!p)continue;const px=p[0]|0,py=p[1]|0;
    if(px<0||py<0||px>=W||py>=H)continue;
    const o=py*W+px;if(p[2]>zb[o])continue;zb[o]=p[2];
    const q=4*o;d[q]=cols[3*i];d[q+1]=cols[3*i+1];d[q+2]=cols[3*i+2];d[q+3]=255;
  }
  ctx.putImageData(img,0,0);
  ctx.strokeStyle='#e33';ctx.lineWidth=1.5;
  for(const cam of CAMS){
    const a=proj(cam[0],cam[1],cam[2]);if(!a)continue;
    ctx.beginPath();ctx.arc(a[0],a[1],4,0,7);ctx.stroke();
  }
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
draw();
</script></body></html>
"""


def scene_to_html(scene, path: str, conf_thr: float = 3.0,
                  max_points: int = 400_000) -> str:
    """Write a dependency-free interactive viewer for a SceneState."""
    from must3r_tpu.demo.export import gather_scene_points

    pts, cols = gather_scene_points(scene, conf_thr, max_points)
    cams = [list(map(float, c2w[:3, 3])) for c2w in scene.cams2world]
    html = (_HTML_TEMPLATE
            .replace("NPTS", str(len(pts)))
            .replace("B64PTS", base64.b64encode(
                np.ascontiguousarray(pts, "<f4").tobytes()).decode())
            .replace("B64COLS", base64.b64encode(
                np.ascontiguousarray(cols, np.uint8).tobytes()).decode())
            .replace("JSONCAMS", json.dumps(cams)))
    with open(path, "w") as f:
        f.write(html)
    return path
