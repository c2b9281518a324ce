"""Cross-validate the fixed-shape JAX NMS against an independent numpy
greedy implementation on random boxes (torchvision is not in this image;
this oracle is the same algorithm torchvision.ops.nms implements)."""

import numpy as np
import pytest

import jax.numpy as jnp

from snn_object_detectionddp_tpu.ops.nms import non_max_suppression


def _greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> list[int]:
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / (area[i] + area - inter + 1e-9)
        suppressed |= iou > iou_thr
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_greedy_oracle_single_class(seed):
    rng = np.random.RandomState(seed)
    n = 60
    xy = rng.uniform(0, 80, size=(n, 2))
    wh = rng.uniform(5, 30, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.15, 1.0, size=n).astype(np.float32)

    keep = _greedy_nms(boxes, scores, iou_thr=0.5)
    expected = set(map(tuple, boxes[keep]))

    out = non_max_suppression(
        jnp.asarray(boxes),
        jnp.asarray(scores)[:, None],  # single class
        conf_thres=0.1,
        iou_thres=0.5,
        max_det=n,
    )
    got = set(map(tuple, np.asarray(out["boxes"])[np.asarray(out["valid"])]))
    assert got == expected
