"""Streaming detection service: per-stream recurrent state over HTTP.

The deployment counterpart of the offline ``video.py`` loop (reference:
visualize.py drives frames from disk; here frames arrive over the wire).
Design for the TPU serving path:

- ONE device worker thread owns the chip and runs the jitted T=1
  streaming step (`Detector` forward with carried recurrent state +
  on-device decode/NMS — the same program `bench.py --streaming` measures
  at ~3.5 ms/frame device-paced). HTTP handler threads enqueue requests;
  the worker drains the queue in arrival order, so concurrent streams
  interleave without device contention.
- Per-stream recurrent state lives on device between requests, keyed by
  the client's ``stream`` id (the SNN/ConvLSTM state is the whole point
  of the model: detections integrate the stream's history).
- Fixed input geometry (the model's configured image size): one compiled
  program, no recompiles at serve time.

Endpoints (JSON):
  POST /detect  {"stream": "cam0", "image": <base64 png/jpg>}
      -> {"boxes": [[x1,y1,x2,y2],...], "scores": [...], "classes": [...],
          "latency_ms": float}
  POST /reset   {"stream": "cam0"}   -> {"ok": true}   (drop state)
  GET  /healthz -> {"ok": true, "streams": N, "backend": "tpu"}

Run: python -m snn_object_detectionddp_tpu.serve --config config.yaml \
        --weights runs/train/exp1/best.pt --port 8000
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


@dataclass
class _Job:
    stream: str
    image_u8: Any  # (H, W, 3) uint8 numpy
    reply: queue.Queue = field(default_factory=lambda: queue.Queue(maxsize=1))


class DetectionService:
    """Device worker + per-stream state registry (transport-agnostic)."""

    def __init__(self, detector, params, conf: float = 0.3, iou: float = 0.45,
                 max_det: int = 100, max_streams: int = 64):
        import jax

        from .data.encoding import preprocess_video
        from .models.detect import decode_predictions
        from .ops.nms import batched_nms

        self.detector = detector
        # One-time device placement: checkpoint-restored params are host
        # numpy, and passing them to the jit per request re-uploads the
        # whole model every call (measured seconds/request through the
        # dev tunnel). Committed device arrays are reused by every call.
        self.params = jax.device_put(params)
        self.max_streams = max_streams
        h, w = detector.cfg.model.image_size
        self.image_hw = (h, w)
        reg_max = detector.cfg.model.hyp.reg_max
        nc = detector.cfg.model.num_classes

        @jax.jit
        def predict(params, image_u8, rec_state):
            frames = preprocess_video(image_u8[None, None])  # (1,1,H,W,3)
            raw, new_state = detector.module.apply(
                {"params": params}, frames, rec_state
            )
            boxes, scores = decode_predictions(
                raw, reg_max, nc, image_hw=(h, w)
            )
            out = batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det
            )
            return out, new_state

        self._predict = predict
        self._states: dict[str, Any] = {}
        self._lru: list[str] = []
        # Guards _states/_lru: mutated by the device worker AND by /reset
        # from HTTP handler threads — unsynchronized, a concurrent reset
        # could race the worker's LRU bookkeeping (ValueError) or be
        # silently undone by the worker re-adding the state it just ran.
        self._state_lock = threading.Lock()
        self._q: queue.Queue[_Job | None] = queue.Queue(maxsize=256)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False

    # -- lifecycle ---------------------------------------------------------
    def start(self):
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def stop(self):
        if self._started:
            self._q.put(None)
            self._worker.join(timeout=10)
            self._started = False

    def warmup(self):
        """Compile BOTH serving programs before accepting traffic: the
        first-frame trace (rec_state=None — the model builds zero state)
        and the steady-state trace (concrete state pytree) are different
        jit signatures; without the second, the first repeat frame of
        every deployment would stall on a fresh multi-minute compile."""
        import numpy as np

        h, w = self.image_hw
        for _ in range(2):
            job = _Job("__warmup__", np.zeros((h, w, 3), np.uint8))
            self._q.put(job)
            out = job.reply.get()
            if isinstance(out, Exception):
                raise out
        self.reset("__warmup__")

    # -- API ---------------------------------------------------------------
    def detect(self, stream: str, image_u8) -> dict:
        h, w = self.image_hw
        if image_u8.shape != (h, w, 3):
            raise ValueError(
                f"expected {(h, w, 3)} uint8 image, got {image_u8.shape} "
                "(the serving program is compiled for the configured "
                "model.image_size; resize client-side)"
            )
        job = _Job(stream, image_u8)
        self._q.put(job)
        out = job.reply.get()
        if isinstance(out, Exception):
            raise out
        return out

    def reset(self, stream: str) -> None:
        with self._state_lock:
            self._states.pop(stream, None)
            if stream in self._lru:
                self._lru.remove(stream)

    @property
    def num_streams(self) -> int:
        return len(self._states)

    # -- device worker -----------------------------------------------------
    def _run(self):
        import jax
        import numpy as np

        while True:
            job = self._q.get()
            if job is None:
                return
            t0 = time.perf_counter()
            try:
                state = self._states.get(job.stream)
                out, new_state = self._predict(
                    self.params, jax.device_put(job.image_u8), state
                )
                host = jax.device_get(out)
                with self._state_lock:
                    self._states[job.stream] = new_state
                    if job.stream in self._lru:
                        self._lru.remove(job.stream)
                    self._lru.append(job.stream)
                    while len(self._lru) > self.max_streams:  # bound mem
                        self._states.pop(self._lru.pop(0), None)
                valid = host["valid"][0]
                job.reply.put({
                    "boxes": np.asarray(host["boxes"][0][valid]).round(2).tolist(),
                    "scores": np.asarray(host["scores"][0][valid]).round(4).tolist(),
                    "classes": np.asarray(host["classes"][0][valid]).tolist(),
                    "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
                })
            except Exception as e:  # surface to the caller, keep serving
                job.reply.put(e)


def make_handler(service: DetectionService):
    import cv2
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(200, {"ok": True, "streams": service.num_streams,
                                 "backend": jax.default_backend()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                stream = str(req.get("stream", "default"))
                if self.path == "/reset":
                    service.reset(stream)
                    self._json(200, {"ok": True})
                    return
                if self.path != "/detect":
                    self._json(404, {"error": "unknown path"})
                    return
                raw = base64.b64decode(req["image"])
                bgr = cv2.imdecode(
                    np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR
                )
                if bgr is None:
                    self._json(400, {"error": "undecodable image"})
                    return
                h, w = service.image_hw
                if bgr.shape[:2] != (h, w):
                    bgr = cv2.resize(bgr, (w, h))
                out = service.detect(stream, bgr[:, :, ::-1].copy())
                self._json(200, out)
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(cfg, weights: str | None, port: int = 8000):
    import jax

    from .models.detector import Detector
    from .train.checkpoint import load_checkpoint
    from .train.step import init_state, make_optimizer

    detector = Detector.from_config(cfg)
    if weights:
        tx, _ = make_optimizer(cfg.training.learning_rate, 1)
        template = jax.eval_shape(
            lambda r: init_state(detector.init_params(r), tx),
            jax.random.PRNGKey(0),
        )
        packed = load_checkpoint(weights, template)
        params = packed["state"]["params"]
        print(f"loaded {weights} (epoch {int(packed['epoch'])})", flush=True)
    else:
        params = detector.init_params(jax.random.PRNGKey(0))
        print("WARNING: serving a fresh random init (no --weights)", flush=True)
    service = DetectionService(detector, params).start()
    print("compiling serving program...", flush=True)
    service.warmup()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"serving on :{port} (backend={jax.default_backend()})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        service.stop()


if __name__ == "__main__":
    import argparse

    from .config import load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()
    serve(load_config(args.config), args.weights, args.port)
