"""Minimal production-style serving endpoint over an AOT artifact.

`mscnn serve --compiled DIR --port N` exposes the compiled deploy
program (io/aot.py) over HTTP with zero model code on the serving host —
the TPU-native replacement for the reference's per-host MATLAB driver
loop (examples/kitti_car/run_mscnn_detection.m:59-162, which re-builds
the net and post-processes every image on the client).

Endpoints (stdlib http.server; single device, requests serialized — the
chip runs one program at a time anyway):
  GET  /healthz          -> {"ok": true, meta}
  POST /detect           -> image bytes (png/jpg) in the body;
                            {"detections": [{class_id, score, bbox
                            [x, y, w, h]}...], "num": N} in original
                            image coordinates (inference.postprocess
                            semantics). Query: ?score_thr=0.5 filters
                            the response (the artifact's own DetectSpec
                            threshold is baked at compile time).
Batch>1 artifacts are served per-request (the batch pads internally);
use detect_many clients for throughput batching.
"""

from __future__ import annotations

import json
from typing import Optional


def make_handler(compiled, class_names: Optional[list] = None):
    """http.server handler class bound to a loaded CompiledDeploy."""
    import http.server

    import cv2
    import numpy as np

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                self._send(200, {"ok": True, "meta": compiled.meta})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/detect":
                self._send(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self._send(400, {"error": "undecodable image"})
                return
            thr = 0.0
            for kv in query.split("&"):
                if kv.startswith("score_thr="):
                    thr = float(kv.split("=", 1)[1])
            det = compiled.detect(img)
            dets = []
            boxes, scores, valid = (det["boxes"], det["scores"],
                                    det["valid"])
            for c in range(boxes.shape[0]):
                for k in range(boxes.shape[1]):
                    if not bool(valid[c, k]) or float(scores[c, k]) < thr:
                        continue
                    name = class_names[c + 1] if class_names else None
                    dets.append({
                        "class_id": c + 1,
                        **({"class": name} if name else {}),
                        "score": float(scores[c, k]),
                        "bbox": [float(v) for v in boxes[c, k]],
                    })
            dets.sort(key=lambda d: -d["score"])
            self._send(200, {"detections": dets, "num": len(dets)})

    return Handler


def serve(artifact_dir: str, port: int = 8437, *,
          class_names: Optional[list] = None, started=None):
    """Load the artifact and serve until interrupted.  `started`
    (optional callable) receives the bound HTTPServer before the loop —
    used by tests to serve from a thread and shut down cleanly."""
    import http.server

    from mscnn_tpu.io import aot

    compiled = aot.load_deploy(artifact_dir)
    httpd = http.server.HTTPServer(
        ("127.0.0.1", port), make_handler(compiled, class_names))
    print(f"serving {artifact_dir} (batch {compiled.batch}, platforms "
          f"{compiled.meta['platforms']}) on http://127.0.0.1:"
          f"{httpd.server_address[1]}")
    if started is not None:
        started(httpd)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0
