"""Box geometry in JAX: format conversions, pairwise IoU, CIoU.

All functions are fixed-shape, vmap/jit friendly, and operate on the last
axis being the 4 box coordinates. Replaces the reference's reliance on
ultralytics box utilities and its numpy IoU matrix
(reference: utils.py:540-568, ultralytics CIoU inside v8DetectionLoss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx, cy, w, h] -> [x1, y1, x2, y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x1, y1, x2, y2] -> [cx, cy, w, h]."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...,) area, clamped at zero."""
    w = jnp.clip(boxes_xyxy[..., 2] - boxes_xyxy[..., 0], 0.0, None)
    h = jnp.clip(boxes_xyxy[..., 3] - boxes_xyxy[..., 1], 0.0, None)
    return w * h


def pairwise_iou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (..., N, 4) and (..., M, 4) -> (..., N, M).

    Vectorized equivalent of the reference's numpy IoU matrix
    (reference: utils.py:540-568).
    """
    a = a_xyxy[..., :, None, :]  # (..., N, 1, 4)
    b = b_xyxy[..., None, :, :]  # (..., 1, M, 4)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(a_xyxy)[..., :, None]
    area_b = box_area(b_xyxy)[..., None, :]
    union = area_a + area_b - inter
    return inter / (union + EPS)


def elementwise_iou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned boxes: (..., 4) x (..., 4) -> (...,)."""
    lt = jnp.maximum(a_xyxy[..., :2], b_xyxy[..., :2])
    rb = jnp.minimum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a_xyxy) + box_area(b_xyxy) - inter
    return inter / (union + EPS)


def ciou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU between aligned boxes: (..., 4) x (..., 4) -> (...,).

    CIoU = IoU - rho2/c2 - alpha*v, matching the box loss used by the
    reference's v8DetectionLoss (reference: train.py:5,155; SURVEY §2.3).
    """
    iou = elementwise_iou(a_xyxy, b_xyxy)

    # Enclosing box diagonal.
    lt = jnp.minimum(a_xyxy[..., :2], b_xyxy[..., :2])
    rb = jnp.maximum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    cwh = jnp.clip(rb - lt, 0.0, None)
    c2 = cwh[..., 0] ** 2 + cwh[..., 1] ** 2 + EPS

    # Center distance.
    a_c = (a_xyxy[..., :2] + a_xyxy[..., 2:]) / 2.0
    b_c = (b_xyxy[..., :2] + b_xyxy[..., 2:]) / 2.0
    rho2 = jnp.sum((a_c - b_c) ** 2, axis=-1)

    # Aspect-ratio consistency term.
    aw = a_xyxy[..., 2] - a_xyxy[..., 0]
    ah = a_xyxy[..., 3] - a_xyxy[..., 1]
    bw = b_xyxy[..., 2] - b_xyxy[..., 0]
    bh = b_xyxy[..., 3] - b_xyxy[..., 1]
    v = (4.0 / jnp.pi**2) * (
        jnp.arctan(bw / (bh + EPS)) - jnp.arctan(aw / (ah + EPS))
    ) ** 2
    # alpha is a non-differentiated weighting (stop-gradient per CIoU paper).
    alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + EPS)))
    return iou - rho2 / c2 - alpha * v


def scale_boxes(
    boxes_xyxy: jnp.ndarray,
    from_shape: tuple[int, int],
    to_shape: tuple[int, int],
) -> jnp.ndarray:
    """Rescale boxes from one image shape (H, W) to another, then clip.

    Behavioral equivalent of ultralytics ``ops.scale_boxes`` as used for
    overlay rendering (reference: visualize.py:94-98). No letterbox padding
    exists in this pipeline, so scaling is a pure per-axis ratio.
    """
    fh, fw = from_shape
    th, tw = to_shape
    sx = tw / fw
    sy = th / fh
    out = boxes_xyxy * jnp.asarray([sx, sy, sx, sy], dtype=boxes_xyxy.dtype)
    return jnp.stack(
        [
            jnp.clip(out[..., 0], 0, tw),
            jnp.clip(out[..., 1], 0, th),
            jnp.clip(out[..., 2], 0, tw),
            jnp.clip(out[..., 3], 0, th),
        ],
        axis=-1,
    )
