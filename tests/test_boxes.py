import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.ops.boxes import (
    ciou,
    cxcywh_to_xyxy,
    elementwise_iou,
    pairwise_iou,
    scale_boxes,
    xyxy_to_cxcywh,
)


def test_conversion_roundtrip():
    boxes = jnp.array([[10.0, 20.0, 30.0, 40.0], [0.0, 0.0, 5.0, 5.0]])
    back = cxcywh_to_xyxy(xyxy_to_cxcywh(boxes))
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_pairwise_iou_known_cases():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # identical -> 1
            [20.0, 20.0, 30.0, 30.0],  # disjoint -> 0
            [0.0, 0.0, 10.0, 5.0],  # half -> 0.5
        ]
    )
    iou = np.asarray(pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 0.0, 0.5], atol=1e-5)


def test_ciou_bounds():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 20.0]])
    c = np.asarray(ciou(a, b))
    i = np.asarray(elementwise_iou(a, b))
    assert c[0] > 0.999  # identical boxes
    assert c[1] <= i[1] + 1e-6  # CIoU <= IoU
    assert c[1] > -1.5


def test_scale_boxes():
    boxes = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(scale_boxes(boxes, (100, 200), (50, 100)))
    np.testing.assert_allclose(out, [[5.0, 5.0, 10.0, 10.0]], atol=1e-5)
