"""Stdlib-only HTTP detection server over a serving artifact.

No reference analog (deployment there = re-running ``code/main/test.py``
against registered dataset splits); this is the framework's online-serving
endpoint.  Run::

    python -m wssdl_bus_tpu.serve.server --artifact /tmp/artifact --port 8000

Endpoints:

  ``GET  /healthz``         -> {"status": "ok", platform, batch_sizes, ...}
  ``POST /detect[?thresh=T]`` with an image file (PNG/TIFF/JPEG bytes) as
        the request body -> {"detections": [{"class", "score", "box"}, ...]}
        in original pixel coordinates (same post-processing and schema as
        ``main/predict.py`` — shared ``serve.report_detections``).

Device dispatch is serialized with a lock (one chip, one program); the
ThreadingHTTPServer keeps request parsing and image decode concurrent.
"""

from __future__ import annotations

import argparse
import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MAX_BODY_BYTES = 64 * 1024 * 1024  # generous for any single medical image


class BadImage(ValueError):
    """The request body could not be decoded as an image (client error)."""


class DetectionService:
    """The request-independent core (constructed once, shared by handlers;
    separable from HTTP for tests)."""

    def __init__(self, artifact_dir: str):
        from wssdl_bus_tpu.serve import load_serving
        self.served = load_serving(artifact_dir)
        self._lock = threading.Lock()

    def info(self) -> dict:
        m = self.served.meta
        return {"status": "ok", "net_name": m["net_name"],
                "platform": m["platform"],
                "canvas_hw": m["canvas_hw"],
                "batch_sizes": m["batch_sizes"]}

    def detect_bytes(self, payload: bytes, thresh: float = 0.5) -> dict:
        from PIL import Image

        from wssdl_bus_tpu.serve import report_detections
        try:
            im = Image.open(io.BytesIO(payload))
            if im.mode != "L":
                im = im.convert("L")
            im = np.asarray(im)
        except Exception as e:
            raise BadImage(f"cannot decode image: {e}") from e
        with self._lock:
            (scores, boxes), = self.served.detect([im])
        detections, _ = report_detections(scores, boxes, self.served.cfg,
                                          thresh=thresh)
        return {"image_hw": list(im.shape), "thresh": thresh,
                "detections": detections}


def make_handler(service: DetectionService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                self._reply(200, service.info())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/detect":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            thresh = 0.5
            for kv in query.split("&"):
                if kv.startswith("thresh="):
                    try:
                        thresh = float(kv.split("=", 1)[1])
                    except ValueError:
                        thresh = float("nan")
                    if not math.isfinite(thresh):
                        self._reply(400, {"error": "bad thresh"})
                        return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._reply(400, {"error": "bad Content-Length"})
                return
            if n <= 0:
                self._reply(400, {"error": "empty body (send image bytes)"})
                return
            if n > MAX_BODY_BYTES:
                self._reply(413, {"error": f"body exceeds {MAX_BODY_BYTES} "
                                           "bytes"})
                return
            payload = self.rfile.read(n)
            try:
                result = service.detect_bytes(payload, thresh)
            except BadImage as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:
                # anything else (missing program, device failure) is OURS
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            else:
                self._reply(200, result)

        def log_message(self, fmt, *a):  # quiet by default
            pass

    return Handler


def serve(artifact_dir: str, host: str = "127.0.0.1", port: int = 8000):
    service = DetectionService(artifact_dir)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service  # exposed for tests / embedding
    return httpd


def main():
    ap = argparse.ArgumentParser(description="HTTP detection server")
    ap.add_argument("--artifact", required=True, type=str)
    ap.add_argument("--host", default="127.0.0.1", type=str)
    ap.add_argument("--port", default=8000, type=int)
    args = ap.parse_args()
    httpd = serve(args.artifact, args.host, args.port)
    print(f"serving {args.artifact} on http://{args.host}:{httpd.server_port}"
          f"  (POST /detect, GET /healthz)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
