"""Scan-vs-streaming equivalence (SURVEY §4): one windowed call over T
frames must equal T single-frame calls with carried recurrent state — the
fixed-shape analogue of the reference's frame-by-frame loop
(reference: train.py:64-66)."""

import jax
import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config
from snn_object_detectionddp_tpu.models.detector import Detector


@pytest.fixture(scope="module")
def det_and_params():
    cfg = Config()
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.runtime.precision = "f32"  # exact equivalence, no bf16 noise
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    return det, params


@pytest.mark.parametrize(
    "bottleneck",
    [pytest.param("convlstm", marks=pytest.mark.slow), "lif", "lstm"],
)
def test_window_equals_streaming(det_and_params, bottleneck):
    cfg = Config()
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.bottleneck = bottleneck
    cfg.runtime.precision = "f32"
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(1))

    rng = np.random.RandomState(0)
    frames = rng.rand(3, 1, 64, 64, 3).astype(np.float32)

    raw_window, _ = det.apply(params, frames)

    state = None
    for t in range(3):
        raw_stream, state = det.apply(params, frames[t : t + 1], state)

    for a, b in zip(raw_window, raw_stream):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize(
    "bottleneck",
    [pytest.param("convlstm", marks=pytest.mark.slow), "lif", "lstm"],
)
def test_all_steps_equals_streaming(bottleneck):
    """Chunked streaming (all_steps=True): ONE T-frame call must emit the
    SAME per-frame detection maps as T chained single-frame calls, and the
    same final recurrent state — per-step decoding is a pure batching
    transformation, not a math change."""
    cfg = Config()
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.bottleneck = bottleneck
    cfg.runtime.precision = "f32"
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(2))

    t_steps, b = 4, 2
    rng = np.random.RandomState(5)
    frames = rng.rand(t_steps, b, 64, 64, 3).astype(np.float32)

    raw_chunk, state_chunk = det.apply(params, frames, all_steps=True)
    # (T*B, h, w, c) time-major -> per-step maps
    per_step = [
        tuple(r[t * b : (t + 1) * b] for r in raw_chunk)
        for t in range(t_steps)
    ]

    state = None
    for t in range(t_steps):
        raw_stream, state = det.apply(params, frames[t : t + 1], state)
        for a, bb in zip(per_step[t], raw_stream):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-4
            )
    for a, bb in zip(
        jax.tree.leaves(state_chunk), jax.tree.leaves(state)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-4
        )


def test_spike_rates_observability(det_and_params):
    det, params = det_and_params
    rng = np.random.RandomState(1)
    frames = rng.rand(2, 1, 64, 64, 3).astype(np.float32)
    rates = det.spike_rates(params, frames)
    assert len(rates) >= 8  # every spiking block reports
    assert any("backbone/stem1" in k for k in rates)
    for k, r in rates.items():
        assert 0.0 <= r <= 1.0, (k, r)
    # At random init, some layer must actually fire.
    assert max(rates.values()) > 0.0


def test_detect_image_encodings(det_and_params):
    det, params = det_and_params
    rng = np.random.RandomState(2)
    image = rng.randint(0, 255, size=(1, 64, 64, 3), dtype=np.uint8)
    for enc in ("direct", "rate"):
        out = det.detect_image(params, image, encoding=enc, conf=0.0)
        assert out["boxes"].shape == (1, 300, 4)
        assert out["scores"].shape == (1, 300)
    try:
        det.detect_image(params, image, encoding="banana")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_decode_true_image_space_odd_sizes(det_and_params):
    """At input sizes not divisible by 64 the decoder's resize chain emits
    enlarged head maps (e.g. 64 rows for 480px); decode with image_hw must
    still place boxes in TRUE image pixels (regression: y-coords were
    stretched by map_h*8/H at DSEC-native 480px)."""
    import jax.numpy as jnp

    from snn_object_detectionddp_tpu.models.detect import STRIDES
    from snn_object_detectionddp_tpu.ops.anchors import make_anchors

    det, params = det_and_params
    rng = np.random.RandomState(3)
    h, w = 80, 96  # 80 % 64 != 0 -> stretched maps
    frames = rng.rand(2, 1, h, w, 3).astype(np.float32)
    raw, _ = det.apply(params, frames)
    assert raw[0].shape[1] * 8 != h  # the stretch actually happens here

    boxes, scores = det.decode(raw, image_hw=(h, w))
    b = np.asarray(boxes)
    # Anchor centers in true image space must lie inside the image: check
    # via the decoded boxes' centers spread (a zero-logit head decodes to
    # boxes centered on the anchors).
    centers_x = (b[..., 0] + b[..., 2]) / 2
    centers_y = (b[..., 1] + b[..., 3]) / 2
    assert centers_x.max() <= w + 1e-3
    assert centers_y.max() <= h + 1e-3
    assert centers_y.max() > h * 0.8  # anchors actually cover the image
