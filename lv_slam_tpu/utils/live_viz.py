"""Live SLAM monitoring server — the reference's RViz surface, ROS-free.

`GlobalGraphNodelet` publishes a marker array (trajectory spheres, edge lines
colored by type, loop radius) and a periodically-regenerated `/map_points`
cloud for live RViz monitoring (`global_graph_nodelet.cpp:771-971` and the
`map_points_publish_timer` at :257-270). Without ROS, the same live surface
is a zero-dependency background HTTP server over the CURRENT SLAM state:

    /            self-contained HTML canvas view (auto-polls /state.json)
    /state.json  trajectory, keyframe nodes, loop edges, subsampled map, stats
    /map.ply     current map cloud as ASCII PLY (CloudCompare/MeshLab)

Publishing is an atomic state swap under a lock; all serialization happens in
the request-handler thread, so `publish*()` costs the SLAM loop ~nothing —
the same reason the reference regenerates its map on a separate wall timer
instead of per keyframe.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence, Tuple

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>lv_slam_tpu live</title>
<style>body{margin:0;background:#111;color:#ddd;font:13px monospace}
#bar{padding:6px 10px;background:#1a1a1a}</style></head>
<body><div id="bar">lv_slam_tpu live &mdash; <span id="stats">waiting</span></div>
<canvas id="c"></canvas><script>
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
function fit(){cv.width=innerWidth;cv.height=innerHeight-30}
fit();addEventListener('resize',fit);
function draw(s){
  ctx.fillStyle='#111';ctx.fillRect(0,0,cv.width,cv.height);
  const pts=[].concat(s.map_points||[],s.trajectory||[]);
  if(!pts.length)return;
  let xs=pts.map(p=>p[0]),ys=pts.map(p=>p[1]);
  const x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),y1=Math.max(...ys);
  const sc=Math.min(cv.width/(x1-x0+10),cv.height/(y1-y0+10));
  const X=p=>(p[0]-x0+5)*sc, Y=p=>cv.height-(p[1]-y0+5)*sc;
  ctx.fillStyle='#666';
  for(const p of s.map_points||[])ctx.fillRect(X(p),Y(p),1.5,1.5);
  if((s.trajectory||[]).length){ctx.strokeStyle='#4a9eff';ctx.lineWidth=2;ctx.beginPath();
    s.trajectory.forEach((p,i)=>i?ctx.lineTo(X(p),Y(p)):ctx.moveTo(X(p),Y(p)));ctx.stroke();}
  ctx.strokeStyle='#ff4040';ctx.lineWidth=1.5;
  for(const e of s.loop_edges||[]){const a=s.keyframes[e[0]],b=s.keyframes[e[1]];
    if(a&&b){ctx.beginPath();ctx.moveTo(X(a),Y(a));ctx.lineTo(X(b),Y(b));ctx.stroke();}}
  ctx.fillStyle='#ffd24a';
  for(const k of s.keyframes||[])ctx.fillRect(X(k)-1.5,Y(k)-1.5,3,3);
  document.getElementById('stats').textContent=JSON.stringify(s.stats||{});
}
async function tick(){try{const r=await fetch('/state.json');draw(await r.json());}
  catch(e){}setTimeout(tick,1000);}
tick();</script></body></html>"""


class LiveViz:
    """Background live-state server. `start()` returns the bound port."""

    def __init__(self, port: int = 0, map_point_cap: int = 60000):
        self._port_req = port
        self._cap = map_point_cap
        self._lock = threading.Lock()
        self._state: dict = {}
        self._map_xyz: Optional[np.ndarray] = None
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        self.port: Optional[int] = None

    # -- publishing (SLAM-loop side; atomic swap, no serialization) ----------
    def publish(
        self,
        trajectory: Optional[np.ndarray] = None,   # (N,4,4) or (N,2/3)
        keyframes: Optional[np.ndarray] = None,    # (K,4,4) or (K,2/3)
        loop_edges: Sequence[Tuple[int, int]] = (),
        map_points: Optional[np.ndarray] = None,   # (M,3)
        stats: Optional[dict] = None,
    ) -> None:
        def _xy(a):
            if a is None:
                return None
            a = np.asarray(a)
            pts = a[:, :2, 3] if a.ndim == 3 else a[:, :2]
            return np.round(pts.astype(np.float64), 2)

        with self._lock:
            if trajectory is not None:
                self._state["trajectory"] = _xy(trajectory)
            if keyframes is not None:
                self._state["keyframes"] = _xy(keyframes)
            if loop_edges:
                self._state["loop_edges"] = [list(map(int, e)) for e in loop_edges]
            if map_points is not None:
                m = np.asarray(map_points, np.float32)
                if m.shape[0] > self._cap:  # evenly-strided live subsample
                    m = m[:: max(1, m.shape[0] // self._cap)][: self._cap]
                self._map_xyz = m
            if stats is not None:
                self._state["stats"] = dict(stats)

    def publish_backend(self, backend, map_points: Optional[np.ndarray] = None) -> None:
        """Publish a `pipeline.backend.GlobalGraph`'s current graph: keyframe
        node positions, loop edges (by keyframe index), optional map cloud."""
        kfs = backend.keyframes
        if not kfs:
            return
        pos = np.stack(
            [(k.estimate if k.estimate is not None else k.odom) for k in kfs]
        )
        node_of = {id(k): i for i, k in enumerate(kfs)}
        edges = [
            (node_of[id(lp.key1)], node_of[id(lp.key2)])
            for lp in backend.loops
            if id(lp.key1) in node_of and id(lp.key2) in node_of
        ]
        self.publish(
            trajectory=pos, keyframes=pos, loop_edges=edges, map_points=map_points,
            stats={"keyframes": len(kfs), "loops": len(backend.loops)},
        )

    # -- server lifecycle ----------------------------------------------------
    def start(self) -> int:
        viz = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, "text/html", _PAGE.encode())
                elif self.path == "/state.json":
                    self._send(200, "application/json", viz._state_json())
                elif self.path == "/map.ply":
                    self._send(200, "application/octet-stream", viz._map_ply())
                else:
                    self._send(404, "text/plain", b"not found")

        self._server = ThreadingHTTPServer(("127.0.0.1", self._port_req), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    # -- serialization (request-handler side) --------------------------------
    def _state_json(self) -> bytes:
        with self._lock:
            st = dict(self._state)
            m = self._map_xyz
        out = {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in st.items()}
        if m is not None:
            out["map_points"] = np.round(m[:, :2].astype(np.float64), 2).tolist()
        return json.dumps(out).encode()

    def _map_ply(self) -> bytes:
        with self._lock:
            m = self._map_xyz
        if m is None:
            m = np.zeros((0, 3), np.float32)
        lines = [
            "ply", "format ascii 1.0", f"element vertex {m.shape[0]}",
            "property float x", "property float y", "property float z",
            "end_header",
        ]
        lines += [f"{p[0]:.3f} {p[1]:.3f} {p[2]:.3f}" for p in m]
        return ("\n".join(lines) + "\n").encode()
