"""Minimal HTTP retargeting server over streaming sessions.

Stdlib-only serving surface for the TPU-native pipeline: a client
registers a subject once (reference frames encode on device and stay
resident), then streams driving keypoints and receives synthesized
frames. One worker thread owns the TPU; requests queue behind it.

    python -m wacv23_tsnet_tpu.cli.serve --port 8787 [--restore-from ckpt]

API (JSON in, JSON out):
  POST /session   {"src_img": [S,H,W,3] uint8-list (raw BGR),
                   "src_lbl": [S,H,W] class-map list,
                   "src_bbox": [S,H,W] 0/1 list}       -> {"session": id}
  POST /frames    {"session": id, "keypoints": [F,68,2]}
                  -> {"frames": [F,H,W,3] uint8 RGB list, "ms": float}
                  with "encoding": "base64" -> {"frames_b64": ...,
                  "shape": [F,H,W,3], "dtype": "uint8", "ms": float}
                  (~5x less wire text + negligible decode vs int lists)
  GET  /healthz   -> {"ok": true, "backend": "...", "sessions": n}
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class Server:
    def __init__(self, cfg, params, chunk: int = 32):
        from ..infer.streaming import RetargetSession

        self.cfg = cfg
        self.params = params
        self.chunk = chunk
        self.sessions: dict = {}
        self.lock = threading.Lock()   # one worker owns the chip
        self._session_cls = RetargetSession

    def create_session(self, payload: dict) -> str:
        from ..data.codecs import labels_to_onehot

        mean = self.cfg.img_mean_array()
        src_u8 = np.asarray(payload["src_img"], np.uint8)      # (S,H,W,3) BGR
        src_img = (src_u8.astype(np.float32) - mean) / 255.0
        src_lbl = np.transpose(labels_to_onehot(
            np.asarray(payload["src_lbl"], np.uint8), self.cfg.task),
            (0, 2, 3, 1))
        src_bbox = np.asarray(payload["src_bbox"], np.float32)
        with self.lock:
            # output="display": frames come back from the device already
            # quantized to uint8 display space — 4x less tunnel traffic,
            # the binding resource at serving chunk sizes
            session = self._session_cls(self.cfg, self.params, src_img,
                                        src_lbl, src_bbox, chunk=self.chunk,
                                        output="display")
        sid = uuid.uuid4().hex[:12]
        self.sessions[sid] = session
        return sid

    def run_frames(self, payload: dict) -> dict:
        session = self.sessions[payload["session"]]
        kp = np.asarray(payload["keypoints"], np.float32)
        t0 = time.time()
        with self.lock:
            rec = session.push_keypoints(kp)   # (F, H, W, 3) uint8 BGR
        rgb = np.ascontiguousarray(rec[..., ::-1])   # BGR -> RGB
        ms = (time.time() - t0) * 1e3
        if payload.get("encoding") == "base64":
            # JSON int lists cost ~10 MB of text + ~400 ms client decode
            # per 8-frame chunk (measured); base64 of the raw uint8
            # buffer is ~2 MB and decodes in microseconds
            import base64
            return {"frames_b64": base64.b64encode(rgb.tobytes()).decode(),
                    "shape": list(rgb.shape), "dtype": "uint8", "ms": ms}
        return {"frames": rgb.tolist(), "ms": ms}


def make_handler(server: Server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):   # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax
                self._reply(200, {"ok": True,
                                  "backend": jax.default_backend(),
                                  "sessions": len(server.sessions)})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length))
                if self.path == "/session":
                    self._reply(200, {"session":
                                      server.create_session(payload)})
                elif self.path == "/frames":
                    if payload.get("session") not in server.sessions:
                        self._reply(404, {"error": "unknown session"})
                        return
                    self._reply(200, server.run_frames(payload))
                else:
                    self._reply(404, {"error": "not found"})
            except (KeyError, ValueError, TypeError) as exc:
                self._reply(400, {"error": str(exc)})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--restore-from", default="")
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--precision", default="high")
    p.add_argument("--fast-trunk", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="encoders at 1-pass bf16 MXU (inference-adopted tier, 4.7e-4 display drift; artifacts/round5/fast_trunk_drift.json)")
    p.add_argument("--fast-tail", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--toy", action="store_true",
                   help="64x64 toy config (fast smoke serving)")
    args = p.parse_args(argv)

    import dataclasses

    from ..configs import face_config, toy_config
    from .demo_face import load_params

    base = toy_config() if args.toy else face_config()
    cfg = dataclasses.replace(base, precision=args.precision,
                              fast_tail=args.fast_tail,
                              fast_trunk=args.fast_trunk)
    params = load_params(args.restore_from, cfg)
    server = Server(cfg, params, chunk=args.chunk)
    httpd = ThreadingHTTPServer(("127.0.0.1", args.port),
                                make_handler(server))
    print(f"serving on http://127.0.0.1:{args.port} "
          f"(task={cfg.task}, {cfg.image_size}^2)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
