"""Fixed-shape non-maximum suppression in pure JAX.

Replaces ultralytics ``ops.non_max_suppression`` at the reference's two call
sites (reference: eval_2.py:108-112 conf=0.001/iou=0.6/max_det=300, and
visualize.py:73-78 conf=0.3/iou=0.45/multi_label=True). Everything is static
shape so the whole post-processing stage jits and runs on TPU: candidates are
top-k selected, suppression is a sequential pass over a precomputed IoU
matrix, and outputs are padded to ``max_det`` with a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

# Class-offset used for class-aware suppression (larger than any image dim).
_CLS_OFFSET = 7680.0


# Above this pool size the k x k IoU matrix path switches to the greedy
# O(max_det * k) path (memory O(k) instead of O(k^2)).
_MATRIX_PATH_MAX_K = 4096

# Within the matrix path, pools up to this size use the fixed-point sweep
# (2-4 whole-matrix passes in practice, but worst-case chain depth ~ k
# passes = O(k^3)); larger pools keep the k-step sequential sweep whose
# total work is a bounded O(k^2).
_FIXPOINT_MAX_K = 1024


def _nms_matrix(top_boxes, top_scores, top_cls, top_valid, iou_thres, max_det):
    """Suppression over a precomputed IoU matrix — fastest for small pools.

    The defining recurrence (candidates sorted by descending score) is
    ``keep[i] = valid[i] and no j < i with keep[j] and iou[j, i] > thr``,
    whose unique solution is the classic sequential NMS. A k-step
    ``fori_loop`` computes it directly but is latency-bound on TPU (~1.5 us
    per tiny sequential step; ~0.6 ms at k=400 in the streaming path).
    Instead we iterate the whole-vector map ``keep <- valid & ~any_j<i
    (keep[j] & iou[j,i] > thr)`` to its fixed point: position i's value
    depends only on positions j < i of the previous sweep, so after n
    sweeps positions 0..n-1 are final — the iteration provably reaches the
    exact solution in (suppression-chain depth + 1) sweeps, 2-4 in
    practice, each sweep one (k, k) masked reduction on the VPU.

    Worst case, though, chain depth is ~k (one sweep per chain level —
    adversarially O(k^3) total work), so pools above ``_FIXPOINT_MAX_K``
    keep the k-step sequential sweep whose total work is a bounded O(k^2);
    at those sizes the per-step launch latency is amortized anyway.
    """
    k = top_scores.shape[0]
    offset_boxes = top_boxes + (top_cls.astype(top_boxes.dtype) * _CLS_OFFSET)[
        :, None
    ]
    iou = pairwise_iou(offset_boxes, offset_boxes)  # (k, k)

    order = jnp.arange(k)

    if k <= _FIXPOINT_MAX_K:
        # sup[j, i]: candidate j (higher-scoring, valid) overlaps i.
        sup = (iou > iou_thres) & (order[:, None] < order[None, :])
        sup = sup & top_valid[:, None]

        def cond(carry):
            changed, _ = carry
            return changed

        def body(carry):
            _, keep = carry
            new = top_valid & ~jnp.any(sup & keep[:, None], axis=0)
            return jnp.any(new != keep), new

        _, keep = jax.lax.while_loop(cond, body, (jnp.bool_(True), top_valid))
    else:

        def step(i, keep):
            row_active = keep[i] & top_valid[i]
            suppress = row_active & (iou[i] > iou_thres) & (order > i)
            return keep & ~suppress

        keep = jax.lax.fori_loop(0, k, step, jnp.ones((k,), dtype=bool))
        keep = keep & top_valid

    scores = jnp.where(keep, top_scores, 0.0)
    classes = jnp.where(keep, top_cls, -1)
    boxes = jnp.where(keep[:, None], top_boxes, 0.0)

    # Keep the top max_det survivors (scores of suppressed slots are 0).
    k_out = min(max_det, k)
    sort_scores, sort_idx = jax.lax.top_k(scores, k_out)
    return {
        "boxes": boxes[sort_idx],
        "scores": sort_scores,
        "classes": classes[sort_idx],
        "valid": keep[sort_idx],
    }


def _nms_greedy(top_boxes, top_scores, top_cls, top_valid, iou_thres, max_det):
    """Greedy NMS via lax.scan: max_det sequential rounds of
    (argmax score -> emit -> suppress one IoU row). Identical results to the
    matrix path (tested), but memory is O(k), enabling ultralytics-sized
    pre-NMS pools (30k) that the k x k matrix cannot hold."""
    offset_boxes = top_boxes + (top_cls.astype(top_boxes.dtype) * _CLS_OFFSET)[
        :, None
    ]
    scores0 = jnp.where(top_valid, top_scores, 0.0)

    def body(scores, _):
        i = jnp.argmax(scores)
        s = scores[i]
        valid = s > 0.0
        iou_row = pairwise_iou(offset_boxes[i][None, :], offset_boxes)[0]
        suppress = valid & (iou_row > iou_thres)  # includes self
        scores = jnp.where(suppress, 0.0, scores).at[i].set(0.0)
        return scores, (i, s, valid)

    _, (idx, scores, valid) = jax.lax.scan(
        body, scores0, None, length=max_det
    )
    return {
        "boxes": jnp.where(valid[:, None], top_boxes[idx], 0.0),
        "scores": jnp.where(valid, scores, 0.0),
        "classes": jnp.where(valid, top_cls[idx], -1),
        "valid": valid,
    }


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "max_det",
        "multi_label",
        "pre_nms_topk",
    ),
)
def non_max_suppression(
    boxes_xyxy: jnp.ndarray,
    class_scores: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    multi_label: bool = False,
    pre_nms_topk: int | None = None,
) -> dict[str, jnp.ndarray]:
    """Single-image fixed-shape NMS.

    Args:
      boxes_xyxy: (A, 4) decoded boxes in pixels.
      class_scores: (A, nc) per-class confidences in [0, 1].
      multi_label: if True a box may be emitted once per class above
        threshold (reference: visualize.py:76); otherwise argmax class only.
      pre_nms_topk: pre-NMS candidate pool size. Default 4*max_det (ample at
        visualization thresholds). Eval at conf=0.001 should pass
        ultralytics' 30000 so low-confidence candidates are kept for mAP
        comparability (pools > 4096 take the O(k) greedy path).

    Returns dict with fixed shapes:
      boxes (max_det, 4), scores (max_det,), classes (max_det,) int32,
      valid (max_det,) bool. Invalid slots have score 0 and class -1.
    """
    num_anchors, nc = class_scores.shape

    if multi_label:
        flat_scores = class_scores.reshape(-1)  # (A*nc,)
        cand_cls = jnp.tile(jnp.arange(nc, dtype=jnp.int32), (num_anchors,))
        cand_box_idx = jnp.repeat(
            jnp.arange(num_anchors, dtype=jnp.int32), nc
        )
    else:
        flat_scores = jnp.max(class_scores, axis=-1)  # (A,)
        cand_cls = jnp.argmax(class_scores, axis=-1).astype(jnp.int32)
        cand_box_idx = jnp.arange(num_anchors, dtype=jnp.int32)

    conf_mask = flat_scores >= conf_thres
    masked_scores = jnp.where(conf_mask, flat_scores, -1.0)

    if pre_nms_topk is None:
        pre_nms_topk = 4 * max_det
    k = min(pre_nms_topk, masked_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    top_cls = cand_cls[top_idx]
    top_boxes = boxes_xyxy[cand_box_idx[top_idx]]
    top_valid = top_scores > 0.0

    nms_fn = _nms_matrix if k <= _MATRIX_PATH_MAX_K else _nms_greedy
    out = nms_fn(top_boxes, top_scores, top_cls, top_valid, iou_thres, max_det)

    k_out = out["scores"].shape[0]
    if k_out < max_det:
        pad = max_det - k_out
        out = {
            "boxes": jnp.pad(out["boxes"], ((0, pad), (0, 0))),
            "scores": jnp.pad(out["scores"], (0, pad)),
            "classes": jnp.pad(out["classes"], (0, pad), constant_values=-1),
            "valid": jnp.pad(out["valid"], (0, pad)),
        }
    return out


def batched_nms(
    boxes_xyxy: jnp.ndarray,
    class_scores: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    multi_label: bool = False,
    pre_nms_topk: int | None = None,
) -> dict[str, jnp.ndarray]:
    """vmap of :func:`non_max_suppression` over a leading batch axis."""
    fn = partial(
        non_max_suppression,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        multi_label=multi_label,
        pre_nms_topk=pre_nms_topk,
    )
    return jax.vmap(fn)(boxes_xyxy, class_scores)
