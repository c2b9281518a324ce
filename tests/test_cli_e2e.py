"""End-to-end CLI surface on the synthetic fixture (CPU, tiny shapes):
train one epoch -> checkpoints appear -> resume -> evaluate -> visualize ->
stitch video. The pytest-resident version of the manual TPU e2e runs."""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute CLI e2e runs

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root for main.py

from snn_object_detectionddp_tpu.config import Config
from snn_object_detectionddp_tpu.data.synthetic import make_dataset


@pytest.fixture(scope="module")
def e2e_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec")
    make_dataset(root, num_sequences=2, splits=("train", "test"), num_frames=5,
                 height=48, width=64, num_objects=2, num_classes=2)
    cfg = Config()
    for split in ("train", "val"):
        sc = cfg.dataset.split(split)
        sc.path = str(root / "train")
        sc.seq_len = 2
    cfg.dataset.test.path = str(root / "test")
    cfg.dataset.test.seq_len = 2
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.max_boxes = 8
    cfg.training.epochs = 1
    cfg.training.batch_size = 2
    cfg.training.num_workers = 1
    cfg.training.save_dir = str(tmp_path_factory.mktemp("run"))
    cfg.training.weights_path = str(Path(cfg.training.save_dir) / "latest.pt")
    return cfg


def test_cli_train_resume_eval_visualize_video(e2e_cfg):
    import main as main_mod
    from snn_object_detectionddp_tpu.models.detector import Detector

    cfg = e2e_cfg
    detector = Detector.from_config(cfg)

    # --- train one epoch ---
    main_mod.train_code(cfg, detector)
    save_dir = Path(cfg.training.save_dir)
    assert (save_dir / "latest.pt").exists()
    assert (save_dir / "best.pt").exists()

    # --- resume for one more epoch ---
    cfg.training.resume_training = True
    cfg.training.epochs = 2
    main_mod.train_code(cfg, detector)

    # --- evaluate (mAP pipeline) ---
    import eval_2

    results = eval_2.evaluate(cfg)
    assert np.isfinite(results["metrics/mAP50(B)"])

    # --- visualize + video ---
    main_mod.visualize_code(cfg, detector)
    viz_dir = save_dir / "visualizations"
    pngs = list(viz_dir.glob("*.png"))
    assert len(pngs) > 0

    from snn_object_detectionddp_tpu.viz.video import stitch_video

    out = stitch_video(viz_dir, save_dir / "video/output.mp4")
    assert Path(out).exists()


def test_cli_train_resume_fsdp_spatial_mesh(tmp_path_factory):
    """The flagship multi-chip config path through the REAL CLI: mesh
    data x spatial with mesh.fsdp on the 8-virtual-device suite mesh —
    train one epoch, checkpoint, resume one more. Covers main.train_code's
    sharded-state placement (place_state), the GSPMD step with FSDP
    in/out shardings, checkpoint save of sharded state, and the resume
    re-placement. 96-px images: the deepest scale must shard in >=2-row
    blocks (train/step.py geometry gate)."""
    import main as main_mod
    from snn_object_detectionddp_tpu.models.detector import Detector

    root = tmp_path_factory.mktemp("dsec_fsdp")
    make_dataset(root, num_sequences=2, splits=("train",), num_frames=5,
                 height=96, width=64, num_objects=2, num_classes=2)
    cfg = Config()
    for split in ("train", "val"):
        sc = cfg.dataset.split(split)
        sc.path = str(root / "train")
        sc.seq_len = 2
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.max_boxes = 8
    cfg.model.image_size = (96, 64)
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.training.num_workers = 1
    cfg.training.remat_chunk = 1  # required by the spatial axis
    cfg.training.save_dir = str(tmp_path_factory.mktemp("run_fsdp"))
    cfg.training.weights_path = str(Path(cfg.training.save_dir) / "latest.pt")
    cfg.mesh.data = 4
    cfg.mesh.spatial = 2
    cfg.mesh.fsdp = True

    detector = Detector.from_config(cfg)
    main_mod.train_code(cfg, detector)
    save_dir = Path(cfg.training.save_dir)
    assert (save_dir / "latest.pt").exists()

    cfg.training.resume_training = True
    cfg.training.epochs = 2
    main_mod.train_code(cfg, detector)
    assert (save_dir / "latest.pt").exists()


def test_cli_eval_tensor_parallel_mesh(e2e_cfg):
    """eval_2 through the real CLI path on a data x tensor mesh
    (``mesh.tensor`` in config — the inference-only channel-parallel
    axis, docs/PARALLELISM.md). Reuses the checkpoint written by the
    first e2e test."""
    import eval_2

    cfg = e2e_cfg
    if not (Path(cfg.training.save_dir) / "best.pt").exists():
        pytest.skip("requires the checkpoint from the train e2e test")
    cfg.mesh.tensor = 2
    try:
        results = eval_2.evaluate(cfg)
    finally:
        cfg.mesh.tensor = 1
    assert np.isfinite(results["metrics/mAP50(B)"])
