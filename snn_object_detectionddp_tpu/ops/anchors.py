"""Anchor-point generation and distance<->box transforms for the anchor-free
YOLOv8-style head.

Mirrors the semantics of ultralytics ``make_anchors`` / ``dist2bbox`` /
``bbox2dist`` consumed by the reference's Detect head + v8DetectionLoss
(reference: model.py:186-194, train.py:5,155), re-derived for NHWC layouts.
Anchor points live in *grid units* of each scale (pixel coords / stride),
offset to cell centers by +0.5.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_anchors(
    feat_shapes: list[tuple[int, int]],
    strides: list[int],
    offset: float = 0.5,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build anchor points for a list of (H, W) feature shapes.

    Returns:
      anchor_points: (A, 2) cell-center coordinates in grid units per scale,
        concatenated over scales (A = sum H*W).
      stride_tensor: (A, 1) stride of each anchor in pixels.
    """
    points = []
    stride_vals = []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + offset
        sy = jnp.arange(h, dtype=dtype) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        stride_vals.append(jnp.full((h * w, 1), float(s), dtype=dtype))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_vals, axis=0)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray) -> jnp.ndarray:
    """ltrb distances (..., A, 4) + anchors (A, 2) -> xyxy boxes (..., A, 4).

    Both in the same (grid) units.
    """
    lt = distance[..., :2]
    rb = distance[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(
    bbox_xyxy: jnp.ndarray, anchor_points: jnp.ndarray, reg_max: int
) -> jnp.ndarray:
    """xyxy boxes (..., A, 4) + anchors (A, 2) -> ltrb distances clipped to
    [0, reg_max - 1 - eps] for DFL targets."""
    lt = anchor_points - bbox_xyxy[..., :2]
    rb = bbox_xyxy[..., 2:] - anchor_points
    dist = jnp.concatenate([lt, rb], axis=-1)
    return jnp.clip(dist, 0.0, reg_max - 1 - 0.01)
