"""Anchor-free YOLOv8-style detection head with DFL box regression.

In-repo replacement for the ultralytics ``Detect`` module the reference
instantiates fresh (untrained) on top of its temporal U-Net outputs
(reference: model.py:4,186-195): per scale, a 2-conv box branch emitting
``4 * reg_max`` distribution logits and a 2-conv class branch emitting
``nc`` logits, at strides (8, 16, 32). Raw maps feed the training loss;
:func:`decode_predictions` produces (boxes, scores) for NMS, mirroring the
eval-mode concat output the reference consumes (visualize.py:70-74).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import dist2bbox, make_anchors
from .layers import ConvBlock

STRIDES = (8, 16, 32)  # reference: model.py:189


class DetectHead(nn.Module):
    """Per-scale detection head.

    Input: list of 3 feature maps (B, H/s, W/s, C_s).
    Output: list of 3 raw maps (B, H/s, W/s, 4*reg_max + nc) — box
    distribution logits first, then class logits (fp32).
    """

    num_classes: int
    reg_max: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> list[jnp.ndarray]:
        c2 = max(64, 4 * self.reg_max)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100), 128)

        outs = []
        for i, (x, stride) in enumerate(zip(feats, STRIDES)):
            box = ConvBlock(c2, dtype=self.dtype, name=f"box{i}_conv1")(x)
            box = ConvBlock(c2, dtype=self.dtype, name=f"box{i}_conv2")(box)
            box = nn.Conv(
                4 * self.reg_max,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                bias_init=nn.initializers.constant(1.0),
                name=f"box{i}_out",
            )(box)

            # Class bias init encodes a low-objectness prior per scale
            # (ultralytics bias_init convention): b = log(5 / nc / (640/s)^2).
            prior = math.log(5.0 / self.num_classes / (640.0 / stride) ** 2)
            cls = ConvBlock(c3, dtype=self.dtype, name=f"cls{i}_conv1")(x)
            cls = ConvBlock(c3, dtype=self.dtype, name=f"cls{i}_conv2")(cls)
            cls = nn.Conv(
                self.num_classes,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                bias_init=nn.initializers.constant(prior),
                name=f"cls{i}_out",
            )(cls)

            outs.append(
                jnp.concatenate([box, cls], axis=-1).astype(jnp.float32)
            )
        return outs


def dfl_expectation(box_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution Focal Loss decode: softmax expectation over reg_max bins.

    (..., 4*reg_max) -> (..., 4) ltrb distances in grid units.
    """
    shape = box_logits.shape[:-1] + (4, reg_max)
    probs = jax.nn.softmax(box_logits.reshape(shape), axis=-1)
    bins = jnp.arange(reg_max, dtype=probs.dtype)
    return jnp.sum(probs * bins, axis=-1)


def flatten_predictions(
    raw_maps: list[jnp.ndarray], reg_max: int, num_classes: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate per-scale raw maps over anchors.

    Returns (box_logits (B, A, 4*reg_max), cls_logits (B, A, nc),
    anchor_points (A, 2), strides (A, 1)).
    """
    feat_shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    anchor_points, stride_t = make_anchors(feat_shapes, list(STRIDES))
    box_list, cls_list = [], []
    for m in raw_maps:
        b = m.shape[0]
        flat = m.reshape(b, -1, m.shape[-1])
        box_list.append(flat[..., : 4 * reg_max])
        cls_list.append(flat[..., 4 * reg_max :])
    return (
        jnp.concatenate(box_list, axis=1),
        jnp.concatenate(cls_list, axis=1),
        anchor_points,
        stride_t,
    )


def decode_predictions(
    raw_maps: list[jnp.ndarray],
    reg_max: int,
    num_classes: int,
    image_hw: tuple[int, int] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head maps -> (boxes_xyxy (B, A, 4) in pixels, scores (B, A, nc)).

    The inference-time equivalent of ultralytics Detect's eval-mode concat
    output (consumed by the reference at eval_2.py:108 and visualize.py:73).

    Geometry note: when the input H/W is not a multiple of 64 (DSEC 480px),
    the U-Net decoder's resize chain emits a P3 map of ceil-rounded size
    (e.g. 64 rows for 480px -> the head's coordinate space is a uniformly
    stretched 512px image; the loss trains in that same space). Pass
    ``image_hw`` to rescale decoded boxes back to TRUE image pixels — every
    inference call site must do this or y-coordinates are off by up to
    H_map*8/H.
    """
    box_logits, cls_logits, anchor_points, stride_t = flatten_predictions(
        raw_maps, reg_max, num_classes
    )
    dist = dfl_expectation(box_logits, reg_max)  # (B, A, 4) grid units
    boxes = dist2bbox(dist, anchor_points) * stride_t  # (A,1) broadcasts over (B,A,4)
    if image_hw is not None:
        map_h = raw_maps[0].shape[1] * STRIDES[0]
        map_w = raw_maps[0].shape[2] * STRIDES[0]
        sy = image_hw[0] / map_h
        sx = image_hw[1] / map_w
        boxes = boxes * jnp.asarray([sx, sy, sx, sy], dtype=boxes.dtype)
    scores = jax.nn.sigmoid(cls_logits)
    return boxes, scores
