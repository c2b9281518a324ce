"""Integration: full evaluate_model over the synthetic fixture on CPU."""

import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config
from snn_object_detectionddp_tpu.data.synthetic import make_dataset


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector

    root = tmp_path_factory.mktemp("dsec")
    make_dataset(root, num_sequences=3, splits=("train",), num_frames=6,
                 height=64, width=64)
    cfg = Config()
    cfg.dataset.train.path = str(root / "train")
    cfg.dataset.train.seq_len = 3
    cfg.model.num_classes = 3
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.max_boxes = 8
    cfg.training.batch_size = 4
    cfg.training.num_workers = 2
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    return cfg, det, params


def test_evaluate_model_runs(eval_setup):
    from snn_object_detectionddp_tpu.evals.validator import evaluate_model

    cfg, det, params = eval_setup
    results = evaluate_model(cfg, det, params, batch_size=4)
    expected = {
        "metrics/precision(B)",
        "metrics/recall(B)",
        "metrics/mAP50(B)",
        "metrics/mAP50-95(B)",
        "fitness",
    }
    assert set(results) == expected
    for v in results.values():
        assert np.isfinite(v) and 0.0 <= v <= 1.0
