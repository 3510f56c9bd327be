"""Interactive web viewer.

Substitute for the reference's websocket/ZMQ viewer stack
(``nerfstudio/viewer/`` — a React/three.js client + bridge subprocess,
SURVEY.md L12): a dependency-free HTTP server with an embedded orbit-control
client.  The browser posts a camera pose, the server renders it through the
pipeline (progressively: a fast low-res pass while interacting, a refined
pass when idle) and returns a PNG.

Usage: ``python scripts/viewer.py --load-config .../config.yml``.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>gfnerf-tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px}
canvas{display:block;margin:auto;cursor:grab}
</style></head><body>
<div id="hud">gfnerf-tpu viewer &mdash; drag: orbit, wheel: zoom, shift-drag: pan</div>
<canvas id="c" width="640" height="480"></canvas>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
let az = 0.5, el = 0.4, radius = __RADIUS__, target = [0,0,0];
let busy = false, dirty = true, hiresTimer = null;
function pose() {
  const ce=Math.cos(el), se=Math.sin(el), ca=Math.cos(az), sa=Math.sin(az);
  const eye=[target[0]+radius*ce*ca, target[1]+radius*ce*sa, target[2]+radius*se];
  const f=[target[0]-eye[0],target[1]-eye[1],target[2]-eye[2]];
  const fl=Math.hypot(...f); f[0]/=fl;f[1]/=fl;f[2]/=fl;
  const up=[0,0,1];
  let r=[f[1]*up[2]-f[2]*up[1], f[2]*up[0]-f[0]*up[2], f[0]*up[1]-f[1]*up[0]];
  const rl=Math.hypot(...r); r[0]/=rl;r[1]/=rl;r[2]/=rl;
  const u=[r[1]*f[2]-r[2]*f[1], r[2]*f[0]-r[0]*f[2], r[0]*f[1]-r[1]*f[0]];
  return [[r[0],u[0],-f[0],eye[0]],[r[1],u[1],-f[1],eye[1]],[r[2],u[2],-f[2],eye[2]]];
}
async function render(scale) {
  if (busy) { dirty = true; return; }
  busy = true;
  const res = await fetch('/render', {method:'POST', body: JSON.stringify(
      {c2w: pose(), width: c.width, height: c.height, downscale: scale})});
  const blob = await res.blob();
  const img = await createImageBitmap(blob);
  ctx.imageSmoothingEnabled = false;
  ctx.drawImage(img, 0, 0, c.width, c.height);
  busy = false;
  if (dirty) { dirty = false; render(4); }
  else if (scale > 1) {
    clearTimeout(hiresTimer);
    hiresTimer = setTimeout(() => render(1), 300);
  }
}
let drag=null;
c.onmousedown = e => drag = [e.clientX, e.clientY, e.shiftKey];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) { target[0] -= dx*radius*0.001; target[2] += dy*radius*0.001; }
  else { az -= dx*0.01; el = Math.min(1.5, Math.max(-1.5, el + dy*0.01)); }
  drag = [e.clientX, e.clientY, drag[2]];
  render(4);
};
c.onwheel = e => { e.preventDefault(); radius *= Math.exp(e.deltaY*0.001); render(4); };
render(2);
</script></body></html>"""


class ViewerServer:
    def __init__(self, pipeline, port: int = 7007,
                 default_radius: float = 4.0, fov_deg: float = 60.0):
        self.pipeline = pipeline
        self.port = port
        self.default_radius = default_radius
        self.fov_deg = fov_deg
        self._lock = threading.Lock()

    def _render(self, req: dict) -> bytes:
        import imageio.v2 as imageio

        from gfnerf_tpu.data.dataparsers.base import CamerasHost

        c2w = np.asarray(req["c2w"], np.float32).reshape(1, 3, 4)
        w = int(req.get("width", 640))
        h = int(req.get("height", 480))
        down = int(req.get("downscale", 1))
        focal = h / 2.0 / np.tan(np.deg2rad(self.fov_deg) / 2.0)
        cams = CamerasHost(
            camera_to_worlds=c2w,
            fx=np.array([focal], np.float32), fy=np.array([focal], np.float32),
            cx=np.array([w / 2.0], np.float32),
            cy=np.array([h / 2.0], np.float32),
            width=np.array([w], np.int32), height=np.array([h], np.int32),
        )
        with self._lock:
            out = self.pipeline.render_camera(cams, 0, step=0, downscale=down)
        rgb = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        imageio.imwrite(buf, rgb, format="png")
        return buf.getvalue()

    def serve_forever(self):
        viewer = self
        radius = self.default_radius

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                page = _PAGE.replace("__RADIUS__", str(radius))
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(page.encode())

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                try:
                    png = viewer._render(req)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(png)
                except Exception as e:  # surface render errors to the client
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(str(e).encode())

        server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        print(f"[viewer] serving on http://localhost:{self.port}")
        server.serve_forever()
