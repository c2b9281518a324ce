"""Serving export: serialize the full inference program (preprocess ->
SNN forward -> decode -> NMS) and run the deserialized artifact."""

import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config


@pytest.fixture(scope="module")
def tiny_det():
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector

    cfg = Config()
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.timesteps = 2
    cfg.model.image_size = (64, 64)
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    return det, params


def test_export_roundtrip(tiny_det, tmp_path):
    import jax.numpy as jnp

    from snn_object_detectionddp_tpu.utils.export import (
        build_serving_fn,
        export_serving,
        load_serving,
    )

    det, params = tiny_det
    path = export_serving(
        det, params, tmp_path / "model.stablehlo", batch=1, conf=0.0
    )
    loaded = load_serving(path)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, size=(1, 2, 64, 64, 3), dtype=np.uint8)

    direct = build_serving_fn(det, params, conf=0.0)(jnp.asarray(images))
    via_artifact = loaded.call(jnp.asarray(images))
    # Same program: outputs must match.
    for a, b in zip(
        (direct["boxes"], direct["scores"]),
        (via_artifact["boxes"], via_artifact["scores"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_streaming_export_roundtrip(tiny_det, tmp_path):
    """The exported streaming (init, step) pair must reproduce the live
    jitted streaming programs: run two frames through the deserialized
    artifacts and through build_streaming_fns, compare detections and the
    carried state."""
    import jax

    from snn_object_detectionddp_tpu.utils.export import (
        build_streaming_fns,
        export_streaming,
        load_serving,
    )

    det, params = tiny_det
    init_p, step_p = export_streaming(
        det, params, tmp_path / "init.stablehlo", tmp_path / "step.stablehlo",
        batch=1, conf=0.0, max_det=8,
    )
    init_fn, step_fn = build_streaming_fns(det, params, conf=0.0, max_det=8)

    rng = np.random.RandomState(0)
    f0 = rng.randint(0, 255, size=(1, 64, 64, 3), dtype=np.uint8)
    f1 = rng.randint(0, 255, size=(1, 64, 64, 3), dtype=np.uint8)

    out_ref0, st_ref = init_fn(f0)
    out_ref1, _ = step_fn(f1, st_ref)

    e_init = load_serving(init_p)
    e_step = load_serving(step_p)
    out0, st = e_init.call(f0)
    out1, _ = e_step.call(f1, st)

    for ref, got in ((out_ref0, out0), (out_ref1, out1)):
        np.testing.assert_allclose(
            np.asarray(ref["scores"]), np.asarray(got["scores"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ref["boxes"]), np.asarray(got["boxes"]), atol=1e-3
        )
