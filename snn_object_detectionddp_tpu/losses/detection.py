"""YOLOv8-style detection loss: TAL assignment + CIoU + BCE + DFL.

In-repo, fixed-shape replacement of the ultralytics ``v8DetectionLoss`` the
reference trains with (reference: train.py:5,68-76,155). Component gains
come from the config hyp block (box 7.5 / cls 1.0 / dfl 2.5 / reg_max 16,
reference: config.yaml:33-37); the scalar training loss is
``(box + cls + dfl) * batch_size`` and the detached 3-vector matches the
reference's per-component logging schema (train.py:89-98).

Label contract: targets arrive padded — (B, M, 5) rows
``[class, cx, cy, w, h]`` normalized to [0, 1] plus a (B, M) validity mask —
the fixed-shape form of the reference's ragged (sum N, 6) collate
(reference: train.py:10-44).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models.detect import dfl_expectation, flatten_predictions
from ..ops.anchors import bbox2dist, dist2bbox
from ..ops.boxes import ciou, cxcywh_to_xyxy
from .tal import task_aligned_assign


class LossComponents(NamedTuple):
    total: jnp.ndarray  # scalar: (box + cls + dfl) * batch_size
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray
    # Foreground anchors assigned by TAL this batch. Pure observability —
    # a sustained 0 means the assigner's bootstrap starved (e.g. every GT
    # box tiny vs the DFL head's initial boxes, so CIoU^6 underflows its
    # eps) and box/dfl losses are silently zero; surfacing the count makes
    # that failure mode visible in TensorBoard instead of a mystery
    # mAP=0 run. Python float 0.0 default keeps construction free of
    # device work at import.
    fg: jnp.ndarray | float = 0.0

    @property
    def vec3(self) -> jnp.ndarray:
        return jnp.stack([self.box, self.cls, self.dfl])


def _dfl_loss(
    pred_dist: jnp.ndarray,  # (B, A, 4, reg_max) logits
    target_ltrb: jnp.ndarray,  # (B, A, 4) in [0, reg_max-1)
) -> jnp.ndarray:
    """Distribution focal loss per anchor: cross-entropy against the two
    integer bins bracketing each target distance. -> (B, A)."""
    tl = jnp.floor(target_ltrb)
    tr = tl + 1.0
    wl = tr - target_ltrb
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)  # (B, A, 4, reg_max)
    reg_max = pred_dist.shape[-1]
    onehot_l = jax.nn.one_hot(tl.astype(jnp.int32), reg_max, dtype=logp.dtype)
    onehot_r = jax.nn.one_hot(tr.astype(jnp.int32), reg_max, dtype=logp.dtype)
    ce_l = -jnp.sum(logp * onehot_l, axis=-1)  # (B, A, 4)
    ce_r = -jnp.sum(logp * onehot_r, axis=-1)
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1)  # (B, A)


def detection_loss(
    raw_maps: list[jnp.ndarray],
    labels: jnp.ndarray,  # (B, M, 5) [cls, cx, cy, w, h] normalized
    label_mask: jnp.ndarray,  # (B, M) bool
    num_classes: int,
    reg_max: int = 16,
    gain_box: float = 7.5,
    gain_cls: float = 1.0,
    gain_dfl: float = 2.5,
    sample_mask: jnp.ndarray | None = None,  # (B,) bool; False = padding row
    cross_replica_axis: str | None = None,
) -> LossComponents:
    """``sample_mask`` excludes padding rows of a final partial batch (the
    loader duplicates the last real image with zeroed labels,
    data/pipeline.py) from every loss term: without it those rows are scored
    as all-background BCE, biasing val loss — which drives best-checkpoint
    selection. With the mask, the loss of a padded batch equals the loss of
    the unpadded batch exactly (tested).

    ``cross_replica_axis``: name of a shard_map mesh axis the batch is split
    over. Every normalization sum (loss-term sums, target_scores_sum, batch
    count) is psum'd over that axis BEFORE the divisions, so each replica
    computes the exact GLOBAL-batch loss — data-parallel training is
    bit-identical math to single-device training, not a mean-of-local-means
    approximation (tests/test_train.py)."""
    if sample_mask is None:
        batch = jnp.asarray(float(raw_maps[0].shape[0]), jnp.float32)
        row_w = None
    else:
        sample_mask = sample_mask.astype(jnp.float32)
        batch = jnp.sum(sample_mask)
        row_w = sample_mask[:, None, None]  # (B, 1, 1)
    if cross_replica_axis is not None:
        batch = jax.lax.psum(batch, cross_replica_axis)
    batch = jnp.maximum(batch, 1.0)
    box_logits, cls_logits, anchor_points, stride_t = flatten_predictions(
        raw_maps, reg_max, num_classes
    )
    box_logits = box_logits.astype(jnp.float32)
    cls_logits = cls_logits.astype(jnp.float32)

    # Image size implied by the P3 map (stride 8), matching how ultralytics
    # derives imgsz from feats inside the loss.
    img_h = raw_maps[0].shape[1] * 8
    img_w = raw_maps[0].shape[2] * 8

    # Decode predictions to grid-unit xyxy.
    pred_dist = box_logits.reshape(box_logits.shape[:-1] + (4, reg_max))
    pred_ltrb = dfl_expectation(box_logits, reg_max)  # (B, A, 4)
    pred_bboxes = dist2bbox(pred_ltrb, anchor_points)  # grid units

    # Ground truth to pixel xyxy.
    gt_labels = labels[..., 0].astype(jnp.int32)
    gt_cxcywh = labels[..., 1:] * jnp.asarray(
        [img_w, img_h, img_w, img_h], dtype=jnp.float32
    )
    gt_bboxes = cxcywh_to_xyxy(gt_cxcywh)
    mask_gt = label_mask & (jnp.sum(gt_cxcywh[..., 2:], axis=-1) > 0)

    # Assignment is a label-construction step, not a differentiable path:
    # both inputs are detached (ultralytics detaches likewise). Without the
    # score detach, grad(pow(score, 0.5)) -> inf once background sigmoids
    # underflow to 0, NaN-ing the whole step.
    pd_scores = jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits))
    assign = task_aligned_assign(
        pd_scores,
        jax.lax.stop_gradient(pred_bboxes) * stride_t,  # pixels
        anchor_points * stride_t,  # pixels
        gt_labels,
        gt_bboxes,
        mask_gt,
    )
    assign = jax.tree.map(jax.lax.stop_gradient, assign)

    target_scores_sum = jnp.sum(assign.target_scores)
    fg_count = assign.fg_mask.astype(jnp.float32)
    if row_w is not None:  # padding rows carry no real assignments
        fg_count = fg_count * row_w[..., 0]
    fg_count = jnp.sum(fg_count)

    # --- Classification: BCE-with-logits against soft targets -------------
    bce = optax_sigmoid_bce(cls_logits, assign.target_scores)
    if row_w is not None:  # zero padding rows' background BCE
        bce = bce * row_w
    sum_cls = jnp.sum(bce)

    # --- Box regression: CIoU on foreground anchors ------------------------
    target_bboxes_grid = assign.target_bboxes / stride_t  # grid units
    weight = jnp.sum(assign.target_scores, axis=-1) * assign.fg_mask  # (B, A)
    if row_w is not None:  # padding rows have no GT, but belt-and-braces
        weight = weight * row_w[..., 0]
    iou = ciou(pred_bboxes, target_bboxes_grid)  # (B, A)
    sum_box = jnp.sum((1.0 - iou) * weight)

    # --- DFL ----------------------------------------------------------------
    target_ltrb = bbox2dist(target_bboxes_grid, anchor_points, reg_max)
    dfl = _dfl_loss(pred_dist, target_ltrb)  # (B, A)
    sum_dfl = jnp.sum(dfl * weight)

    # Normalize by GLOBAL sums: under data-parallel shard_map the divisions
    # happen after a cross-replica psum, reproducing the single-device math.
    if cross_replica_axis is not None:
        target_scores_sum, sum_cls, sum_box, sum_dfl, fg_count = jax.lax.psum(
            (target_scores_sum, sum_cls, sum_box, sum_dfl, fg_count),
            cross_replica_axis,
        )
    target_scores_sum = jnp.maximum(target_scores_sum, 1.0)
    loss_cls = sum_cls / target_scores_sum
    loss_box = sum_box / target_scores_sum
    loss_dfl = sum_dfl / target_scores_sum

    box = loss_box * gain_box
    cls = loss_cls * gain_cls
    dfl_c = loss_dfl * gain_dfl
    total = (box + cls + dfl_c) * batch
    return LossComponents(total=total, box=box, cls=cls, dfl=dfl_c, fg=fg_count)


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable BCE-with-logits (elementwise)."""
    return jnp.clip(logits, 0.0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


class DetectionLoss:
    """Config-bound callable mirroring the reference's
    ``loss_fn(preds, batch) -> (loss_vec, detached_vec)`` usage
    (reference: train.py:68-76)."""

    def __init__(self, num_classes: int, hyp: Any):
        self.num_classes = num_classes
        self.reg_max = hyp.reg_max
        self.gains = (hyp.box, hyp.cls, hyp.dfl)

    def __call__(
        self,
        raw_maps,
        labels,
        label_mask,
        sample_mask=None,
        cross_replica_axis=None,
    ) -> LossComponents:
        return detection_loss(
            raw_maps,
            labels,
            label_mask,
            self.num_classes,
            self.reg_max,
            *self.gains,
            sample_mask=sample_mask,
            cross_replica_axis=cross_replica_axis,
        )
