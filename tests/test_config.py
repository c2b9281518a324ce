import dataclasses

import pytest
import yaml

from snn_object_detectionddp_tpu.config import Config, load_config


def test_roundtrip_through_dict():
    cfg = Config()
    cfg.model.num_classes = 5
    cfg.training.batch_size = 7
    back = Config.from_dict(cfg.to_dict())
    assert back == cfg


def test_reference_schema_loads(tmp_path):
    """A config written with only the reference's keys (config.yaml:1-37
    schema) must load, with TPU extensions at defaults."""
    raw = {
        "dataset": {
            "train": {"path": "/x/train", "seq_len": 5},
            "val": {"path": "/x/val", "seq_len": 5},
            "test": {"path": "/x/test", "seq_len": 5},
        },
        "mode": "visualize",
        "device": "cuda:3",
        "debug_train": False,
        "debug_test": True,
        "training": {
            "seed": 42,
            "epochs": 10,
            "batch_size": 64,
            "num_workers": 4,
            "learning_rate": 0.0001,
            "weight_decay": 0.0005,
            "save_dir": "runs/train/exp1",
            "resume_training": True,
            "weights_path": "runs/train/exp1/latest.pt",
        },
        "model": {
            "num_classes": 8,
            "yolo_model_name": "yolo11m.pt",
            "use_conv_lstm": True,
            "hyp": {"box": 7.5, "cls": 1.0, "dfl": 2.5, "reg_max": 16},
        },
    }
    p = tmp_path / "ref.yaml"
    p.write_text(yaml.safe_dump(raw))
    cfg = load_config(p)
    assert cfg.mode == "visualize"
    assert cfg.model.bottleneck == "convlstm"  # resolved from use_conv_lstm
    assert cfg.model.hyp.reg_max == 16
    assert cfg.mesh.data == -1  # extension default

    raw["model"]["use_conv_lstm"] = False
    p.write_text(yaml.safe_dump(raw))
    assert load_config(p).model.bottleneck == "lif"


def test_device_cpu_forces_platform(tmp_path):
    """device: "cpu" must pin the JAX platform before backend init (the
    tunneled TPU plugin ignores JAX_PLATFORMS; with its relay down an
    accidental TPU init hangs forever). The suite already runs on a forced
    CPU backend, so this pins the invariant rather than the transition:
    load_config must succeed and leave the platform set to cpu."""
    import jax

    p = tmp_path / "cpu.yaml"
    p.write_text(yaml.safe_dump({"device": "cpu"}))
    cfg = load_config(p)
    assert cfg.device == "cpu"
    assert jax.config.jax_platforms == "cpu"
    assert jax.default_backend() == "cpu"


def test_mesh_spatial_validation():
    with pytest.raises(ValueError):
        Config.from_dict({"mesh": {"spatial": 0}})
    assert Config.from_dict({"mesh": {"spatial": 2}}).mesh.spatial == 2


def test_validation_errors():
    with pytest.raises(ValueError):
        Config.from_dict({"training": {"batch_size": 0}})
    with pytest.raises(ValueError):
        Config.from_dict({"model": {"hyp": {"reg_max": 1}}})
    with pytest.raises(ValueError):
        Config.from_dict({"runtime": {"lif_kernel": "cuda"}})
    with pytest.raises(ValueError):
        Config.from_dict({"model": {"spike": {"reset": "bouncy"}}})
    with pytest.raises(KeyError):
        Config.from_dict({"model": {"n_classes": 3}})


def test_all_sections_are_dataclasses():
    cfg = Config()
    assert dataclasses.is_dataclass(cfg.model.spike)
    assert dataclasses.is_dataclass(cfg.runtime)
