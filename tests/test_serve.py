"""Streaming detection service tests: the DetectionService worker (state
carry, LRU bound, shape guard) and the HTTP surface end-to-end on a local
port (tiny model, CPU)."""

import base64
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config


@pytest.fixture(scope="module")
def service():
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.serve import DetectionService

    cfg = Config()
    cfg.model.num_classes = 3
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.image_size = (64, 64)
    detector = Detector.from_config(cfg)
    params = detector.init_params(jax.random.PRNGKey(0))
    svc = DetectionService(detector, params, conf=0.0, max_det=8,
                           max_streams=2).start()
    svc.warmup()
    yield svc
    svc.stop()


def _frame(seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, size=(64, 64, 3), dtype=np.uint8
    )


def test_detect_carries_state_per_stream(service):
    out1 = service.detect("cam0", _frame(0))
    assert {"boxes", "scores", "classes", "latency_ms"} <= set(out1)
    n0 = service.num_streams
    # Same frame, same stream: recurrent state advanced, so scores differ
    # from a fresh stream fed the same frame.
    out2 = service.detect("cam0", _frame(0))
    fresh = service.detect("cam1", _frame(0))
    assert n0 == 1 and service.num_streams == 2
    assert fresh["scores"] == pytest.approx(out1["scores"], abs=1e-4)
    assert out2["scores"] != out1["scores"]


def test_reset_drops_state(service):
    service.detect("tmp", _frame(1))
    before = service.num_streams
    service.reset("tmp")
    assert service.num_streams == before - 1


def test_lru_bounds_streams(service):
    for i in range(4):
        service.detect(f"s{i}", _frame(i))
    assert service.num_streams <= 2  # max_streams=2


def test_shape_guard(service):
    with pytest.raises(ValueError, match="image_size"):
        service.detect("bad", np.zeros((32, 32, 3), np.uint8))


def test_http_end_to_end(service):
    import cv2

    from snn_object_detectionddp_tpu.serve import make_handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"]

        ok, png = cv2.imencode(".png", _frame(2)[:, :, ::-1])
        assert ok
        body = json.dumps({
            "stream": "http0",
            "image": base64.b64encode(png.tobytes()).decode(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert "boxes" in out and "latency_ms" in out

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reset",
            data=json.dumps({"stream": "http0"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["ok"]
    finally:
        httpd.shutdown()
