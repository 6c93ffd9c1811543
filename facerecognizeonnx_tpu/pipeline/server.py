"""HTTP front-end over the micro-batching IdentifyService.

Stdlib-only (http.server — no web framework exists in the image), so
the deployment story is complete without new dependencies: concurrent
HTTP callers ride the same coalesced device micro-batches as in-process
callers. The reference has no serving surface at all (single-threaded
CLI loop, src/main.cpp:214-257) — this is framework extension, not
parity.

Endpoints:
  POST   /identify[?top_k=K]   image bytes (JPEG/PNG/BMP) →
      {"faces": [{"box": [x1,y1,x2,y2], "score": s,
                  "names": [...], "sims": [...]}]}
  POST   /enroll?name=NAME     image bytes → enrolls the best face
  DELETE /enroll?name=NAME     removes every enrollment under NAME
  GET    /healthz              {"status": "ok", "gallery_size": N}
  GET    /stats                micro-batching counters

Run: python -m facerecognizeonnx_tpu serve --port 8080 [--gallery g.npz]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from facerecognizeonnx_tpu.match.gallery import GalleryBank
from facerecognizeonnx_tpu.pipeline.service import IdentifyService


def _decode_image(data: bytes) -> Optional[np.ndarray]:
    import cv2

    arr = np.frombuffer(data, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    return img


class _Handler(BaseHTTPRequestHandler):
    # injected by make_server()
    service: IdentifyService = None
    bank: GalleryBank = None
    enroll_fn = None
    remove_fn = None

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(length)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            self._reply(200, {"status": "ok", "gallery_size": len(self.bank)})
        elif path == "/stats":
            self._reply(200, self.service.stats())
        else:
            self._reply(404, {"error": f"unknown path {path}"})

    def do_POST(self):
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        img = _decode_image(self._read_body())
        if img is None:
            self._reply(400, {"error": "cannot decode image"})
            return
        if url.path == "/identify":
            top_k = int(qs.get("top_k", ["1"])[0])
            res = self.service.identify(img, top_k=top_k)
            faces = []
            for i in range(len(res.valid)):
                if not res.valid[i]:
                    continue
                faces.append({
                    "box": [round(float(v), 2) for v in res.boxes[i]],
                    "score": round(float(res.scores[i]), 4),
                    "names": list(res.names[i]),
                    "sims": [round(float(s), 4) for s in res.sims[i]],
                })
            self._reply(200, {"faces": faces})
        elif url.path == "/enroll":
            name = qs.get("name", [""])[0]
            if not name:
                self._reply(400, {"error": "enroll needs ?name="})
                return
            ok = self.enroll_fn(name, img)
            code = 200 if ok else 422
            self._reply(code, {"enrolled": bool(ok), "name": name,
                               "gallery_size": len(self.bank)})
        else:
            self._reply(404, {"error": f"unknown path {url.path}"})

    def do_DELETE(self):
        url = urlparse(self.path)
        if url.path != "/enroll":
            self._reply(404, {"error": f"unknown path {url.path}"})
            return
        name = parse_qs(url.query).get("name", [""])[0]
        if not name:
            self._reply(400, {"error": "delete needs ?name="})
            return
        removed = self.remove_fn(name)
        self._reply(200 if removed else 404, {
            "removed": removed, "name": name,
            "gallery_size": len(self.bank),
        })


def make_server(
    detector,
    recognizer,
    bank: GalleryBank,
    host: str = "127.0.0.1",
    port: int = 8080,
    max_batch: int = 8,
    batch_window_ms: float = 5.0,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; caller runs serve_forever().

    detector/recognizer: loaded FaceDetector/FaceRecognizer — their
    params feed one shared IdentifyService; enrolls go through the
    standard detect→align→embed path and mutate `bank` in place.
    """
    service = IdentifyService(
        detector.params, recognizer.params, bank, cfg=detector.cfg,
        max_batch=max_batch, batch_window_ms=batch_window_ms,
    )
    lock = threading.Lock()

    def enroll(name: str, image: np.ndarray) -> bool:
        faces = detector.detect(image)
        if not faces:
            return False
        feat = recognizer.extract_feature(image, faces[0])
        if not feat.size:
            return False
        with lock:  # GalleryBank mutation is not thread-safe
            bank.add(name, feat)
        return True

    def remove(name: str) -> int:
        with lock:
            return bank.remove(name)

    handler = type("Handler", (_Handler,), {
        "service": service, "bank": bank, "enroll_fn": staticmethod(enroll),
        "remove_fn": staticmethod(remove),
    })
    server = ThreadingHTTPServer((host, port), handler)
    server.frt_service = service  # for clean shutdown by the caller
    return server
