import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.ops.nms import batched_nms, non_max_suppression


def _toy():
    # Box 0 and 1 heavily overlap; box 2 is elsewhere.
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],
            [50.0, 50.0, 60.0, 60.0],
        ]
    )
    scores = jnp.array(
        [
            [0.9, 0.0],
            [0.8, 0.0],
            [0.0, 0.7],
        ]
    )
    return boxes, scores


def test_nms_suppresses_overlap():
    boxes, scores = _toy()
    out = non_max_suppression(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_det=5)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2  # box 1 suppressed by box 0
    np.testing.assert_allclose(np.asarray(out["scores"])[:2], [0.9, 0.7], atol=1e-6)
    assert list(np.asarray(out["classes"])[:2]) == [0, 1]


def test_nms_class_aware():
    boxes, scores = _toy()
    # Same overlapping boxes but different classes -> both survive.
    scores = jnp.array([[0.9, 0.0], [0.0, 0.8], [0.0, 0.7]])
    out = non_max_suppression(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_det=5)
    assert np.asarray(out["valid"]).sum() == 3


def test_nms_conf_threshold():
    boxes, scores = _toy()
    out = non_max_suppression(boxes, scores, conf_thres=0.85, iou_thres=0.5, max_det=5)
    assert np.asarray(out["valid"]).sum() == 1
    assert np.asarray(out["scores"])[0] == np.float32(0.9)


def test_nms_multilabel_emits_per_class():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    scores = jnp.array([[0.9, 0.8]])
    single = non_max_suppression(
        boxes, scores, conf_thres=0.5, iou_thres=0.5, max_det=5, multi_label=False
    )
    multi = non_max_suppression(
        boxes, scores, conf_thres=0.5, iou_thres=0.5, max_det=5, multi_label=True
    )
    assert np.asarray(single["valid"]).sum() == 1
    # multi_label: same box emitted for both classes; class-aware NMS keeps both.
    assert np.asarray(multi["valid"]).sum() == 2


def test_batched_nms_shapes():
    boxes, scores = _toy()
    out = batched_nms(boxes[None], scores[None], conf_thres=0.1, max_det=7)
    assert out["boxes"].shape == (1, 7, 4)
    assert out["scores"].shape == (1, 7)
