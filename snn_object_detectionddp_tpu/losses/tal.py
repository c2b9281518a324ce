"""Task-Aligned Assigner (TAL), fixed-shape and fully masked.

Reimplements the assignment strategy inside the reference's ultralytics
``v8DetectionLoss`` (reference: train.py:5,155; SURVEY §2.3) without ragged
tensors: ground truth arrives padded to (B, M, ...) with a validity mask, and
every intermediate is a dense (B, M, A) tensor — the XLA-friendly form of
the PyTorch boolean-indexing original (SURVEY §7 "Hard parts" #1).

Alignment metric: score(gt_class)^alpha * IoU(gt, pred)^beta with
alpha=0.5, beta=6.0, top-k=10 candidate anchors per gt restricted to anchors
whose center lies inside the gt box; anchors claimed by multiple gts resolve
to the gt with the highest IoU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import ciou

ALPHA = 0.5
BETA = 6.0
TOPK = 10
EPS = 1e-9


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy pixels
    target_scores: jnp.ndarray  # (B, A, nc) soft targets in [0, 1]
    fg_mask: jnp.ndarray  # (B, A) bool


def _candidates_in_gts(
    anc_points: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """(A, 2) anchor centers x (B, M, 4) gt xyxy -> (B, M, A) bool."""
    x, y = anc_points[:, 0], anc_points[:, 1]
    x1, y1, x2, y2 = (gt_bboxes[..., i][..., None] for i in range(4))
    return (
        (x[None, None, :] - x1 > eps)
        & (y[None, None, :] - y1 > eps)
        & (x2 - x[None, None, :] > eps)
        & (y2 - y[None, None, :] > eps)
    )


def _topk_mask(metric: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-(B, M) row, a bool mask of the top-k entries along A with
    positive metric. (B, M, A) -> (B, M, A)."""
    k = min(k, metric.shape[-1])
    topk_vals, topk_idx = jax.lax.top_k(metric, k)  # (B, M, k)
    valid = topk_vals > EPS
    onehots = jax.nn.one_hot(topk_idx, metric.shape[-1], dtype=jnp.bool_)
    return jnp.any(onehots & valid[..., None], axis=-2)


def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid class probs
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy pixels
    anc_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    mask_gt: jnp.ndarray,  # (B, M) bool
    topk: int = TOPK,
    alpha: float = ALPHA,
    beta: float = BETA,
) -> AssignResult:
    b, a, nc = pd_scores.shape
    m = gt_labels.shape[1]

    # --- Candidate mask & alignment metric -------------------------------
    mask_in_gts = _candidates_in_gts(anc_points, gt_bboxes)  # (B, M, A)
    # Alignment overlap is CIoU clamped at 0 (ultralytics convention) —
    # center-distance-aware, so among equal-IoU candidates the better-
    # centered prediction wins the assignment.
    overlaps = ciou(
        gt_bboxes[..., :, None, :], pd_bboxes[..., None, :, :]
    )  # (B, M, A)
    overlaps = jnp.clip(overlaps, 0.0, None)

    gt_onehot = jax.nn.one_hot(gt_labels, nc, dtype=pd_scores.dtype)  # (B, M, nc)
    cls_score = jnp.einsum("bac,bmc->bma", pd_scores, gt_onehot)  # (B, M, A)

    valid = mask_in_gts & mask_gt[..., None]
    align = jnp.where(
        valid, jnp.power(cls_score, alpha) * jnp.power(overlaps, beta), 0.0
    )

    # --- Top-k per gt, then resolve multi-assignment by IoU --------------
    mask_topk = _topk_mask(align, topk)
    mask_pos = mask_topk & valid  # (B, M, A)

    fg_counts = jnp.sum(mask_pos, axis=1)  # (B, A)
    fg_mask = fg_counts > 0

    # Anchor claimed by >1 gt -> keep the gt with max IoU (ultralytics
    # select_highest_overlaps semantics; applied unconditionally, which is
    # a no-op for singly-assigned anchors).
    masked_overlaps = jnp.where(mask_pos, overlaps, -1.0)  # (B, M, A)
    target_gt_idx = jnp.argmax(masked_overlaps, axis=1)  # (B, A)
    resolved = jax.nn.one_hot(target_gt_idx, m, axis=1, dtype=jnp.bool_)  # (B, M, A)
    mask_pos = mask_pos & resolved

    # --- Gather per-anchor targets ---------------------------------------
    target_labels = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)  # (B, A)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )  # (B, A, 4)
    target_labels = jnp.where(fg_mask, target_labels, 0)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype)
    target_scores = target_scores * fg_mask[..., None]

    # --- Normalize soft targets by per-gt peak alignment ------------------
    align = jnp.where(mask_pos, align, 0.0)
    pos_align = jnp.max(align, axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlap = jnp.max(jnp.where(mask_pos, overlaps, 0.0), axis=-1, keepdims=True)
    norm_align = jnp.max(
        align * pos_overlap / (pos_align + EPS), axis=1
    )  # (B, A)
    target_scores = target_scores * norm_align[..., None]

    return AssignResult(
        target_labels=target_labels.astype(jnp.int32),
        target_bboxes=target_bboxes,
        target_scores=target_scores,
        fg_mask=fg_mask,
    )
