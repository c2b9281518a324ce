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
