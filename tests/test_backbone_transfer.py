"""Backbone transfer + freeze (the TPU counterpart of the reference's
frozen pretrained feature extractor, reference: model.py:74-98).

- model.backbone_init: shape-checked partial restore of the backbone
  subtree from a prior checkpoint into a fresh init;
- model.freeze_backbone: frozen leaves receive exactly-zero updates
  (grads masked to zero AND weight decay masked off) while the rest of
  the model trains.
"""

import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config


def _tiny_cfg(**model_overrides):
    cfg = Config()
    cfg.model.num_classes = 3
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.max_boxes = 8
    cfg.training.batch_size = 2
    cfg.training.learning_rate = 1e-3
    for k, v in model_overrides.items():
        setattr(cfg.model, k, v)
    return cfg


def _batch(rng, b=2, t=2, h=64, w=64, m=8):
    images = rng.randint(0, 255, size=(b, t, h, w, 3), dtype=np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    labels[:, 0] = [1.0, 0.5, 0.5, 0.4, 0.4]
    mask[:, 0] = True
    return {
        "images": images,
        "labels": labels,
        "label_mask": mask,
        "sample_mask": np.ones((b,), bool),
    }


@pytest.fixture(scope="module")
def saved_ckpt(tmp_path_factory):
    """A briefly-trained tiny model checkpointed to disk."""
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.checkpoint import save_checkpoint
    from snn_object_detectionddp_tpu.train.step import (
        init_state,
        make_optimizer,
        make_step_fns,
    )

    cfg = _tiny_cfg()
    det = Detector.from_config(cfg)
    tx, schedule = make_optimizer(cfg.training.learning_rate, total_steps=10)
    fns = make_step_fns(det, tx, schedule)
    state = init_state(det.init_params(jax.random.PRNGKey(7)), tx, schedule)
    batch = _batch(np.random.RandomState(0))
    for _ in range(2):
        state, _ = fns.train_step(state, batch)
    path = tmp_path_factory.mktemp("ckpt") / "best.pt"
    save_checkpoint(path, jax.device_get(state), epoch=1, best_val_loss=1.0)
    return cfg, path, jax.device_get(state)


def test_backbone_init_restores_exact_leaves(saved_ckpt):
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.checkpoint import (
        load_backbone_params,
    )

    cfg, path, trained_state = saved_ckpt
    det = Detector.from_config(cfg)
    fresh = jax.device_get(det.init_params(jax.random.PRNGKey(99)))
    merged = load_backbone_params(path, fresh)
    # Backbone leaves == the checkpoint's trained backbone, bit-exact.
    got = jax.tree_util.tree_leaves(merged["backbone"])
    want = jax.tree_util.tree_leaves(trained_state["params"]["backbone"])
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # Every other subtree is untouched fresh init.
    for key in merged:
        if key == "backbone":
            continue
        for g, w in zip(
            jax.tree_util.tree_leaves(merged[key]),
            jax.tree_util.tree_leaves(fresh[key]),
        ):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_backbone_init_shape_mismatch_raises(saved_ckpt):
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.checkpoint import (
        load_backbone_params,
    )

    cfg, path, _ = saved_ckpt
    wide = _tiny_cfg(width_mult=0.5)  # different width preset
    det = Detector.from_config(wide)
    fresh = jax.device_get(det.init_params(jax.random.PRNGKey(0)))
    with pytest.raises(ValueError, match="shapes|structure"):
        load_backbone_params(path, fresh)


def test_missing_subtree_raises(tmp_path, saved_ckpt):
    from snn_object_detectionddp_tpu.train.checkpoint import (
        load_backbone_params,
    )

    cfg, path, trained_state = saved_ckpt
    with pytest.raises(ValueError, match="no 'nonexistent' subtree"):
        load_backbone_params(path, trained_state["params"], "nonexistent")


def test_freeze_backbone_zero_updates():
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.step import (
        init_state,
        make_optimizer,
        make_step_fns,
        module_frozen_mask,
    )

    cfg = _tiny_cfg()
    det = Detector.from_config(cfg)
    tx, schedule = make_optimizer(
        cfg.training.learning_rate,
        total_steps=10,
        weight_decay=0.1,  # large wd: decay on frozen leaves would show
        frozen_mask=module_frozen_mask("backbone"),
    )
    fns = make_step_fns(det, tx, schedule)
    params0 = jax.device_get(det.init_params(jax.random.PRNGKey(3)))
    state = init_state(jax.tree.map(lambda x: x.copy(), params0), tx, schedule)
    batch = _batch(np.random.RandomState(2))
    for _ in range(3):
        state, metrics = fns.train_step(state, batch)
    params1 = jax.device_get(state["params"])
    # Frozen backbone: bit-identical after 3 AdamW+wd steps.
    for g, w in zip(
        jax.tree_util.tree_leaves(params1["backbone"]),
        jax.tree_util.tree_leaves(params0["backbone"]),
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # The rest of the model trains: at least the head moved.
    moved = any(
        not np.array_equal(np.asarray(g), np.asarray(w))
        for g, w in zip(
            jax.tree_util.tree_leaves(params1["head"]),
            jax.tree_util.tree_leaves(params0["head"]),
        )
    )
    assert moved
    assert np.isfinite(float(metrics["loss"]))
