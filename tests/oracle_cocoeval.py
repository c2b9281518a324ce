"""Clean-room COCO-style mAP oracle for cross-validating evals/map.py.

Implemented directly from the published pycocotools COCOeval algorithm
(bbox task, no crowd/ignore regions, area range "all"), NOT from this
repo's evals/map.py — the point is an independent second opinion on the
matching + AP conventions (VERDICT round-1 missing #3; the real
pycocotools/ultralytics packages are not installable on this host):

- per image, per class, detections sorted by descending score;
- each detection greedily takes the *unmatched* GT with the highest IoU,
  if that IoU clears the threshold (score-ordered greedy, the COCO order —
  ultralytics instead sorts candidate pairs globally by IoU; the two
  coincide unless boxes overlap heavily);
- PR accumulation over the whole dataset per class, precision envelope
  (right-to-left running max), precision sampled at 101 recall thresholds
  with searchsorted (not trapezoid integration);
- mAP = mean over classes that have GT.
"""

from __future__ import annotations

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 0.96, 0.05), 2)
REC_THRESHOLDS = np.linspace(0.0, 1.0, 101)


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + np.spacing(1))


def _match_image_class(det_boxes, det_scores, gt_boxes, n_thr):
    """COCOeval.evaluateImg for one (image, class): -> (D, T) tp flags."""
    d = det_boxes.shape[0]
    tp = np.zeros((d, n_thr), bool)
    if d == 0 or gt_boxes.shape[0] == 0:
        return tp
    order = np.argsort(-det_scores, kind="mergesort")
    ious = iou_xyxy(det_boxes[order], gt_boxes)  # (D, G)
    for ti, thr in enumerate(IOU_THRESHOLDS[:n_thr]):
        gt_taken = np.zeros(gt_boxes.shape[0], bool)
        for di in range(d):
            best, best_iou = -1, min(thr, 1 - 1e-10)
            for gi in range(gt_boxes.shape[0]):
                if gt_taken[gi]:
                    continue
                if ious[di, gi] > best_iou:
                    best, best_iou = gi, ious[di, gi]
            if best >= 0:
                gt_taken[best] = True
                tp[order[di], ti] = True
    return tp


def coco_map(images: list[dict], num_classes: int) -> dict:
    """images: list of dicts with det_boxes (D,4), det_scores (D,),
    det_cls (D,), gt_boxes (G,4), gt_cls (G,). Returns
    {"mAP50": float, "mAP50-95": float, "ap": (C, T)}."""
    n_thr = len(IOU_THRESHOLDS)
    ap = np.full((num_classes, n_thr), np.nan)
    for c in range(num_classes):
        n_gt = sum(int((im["gt_cls"] == c).sum()) for im in images)
        if n_gt == 0:
            continue
        tps, scores = [], []
        for im in images:
            dsel = im["det_cls"] == c
            gsel = im["gt_cls"] == c
            tps.append(
                _match_image_class(
                    im["det_boxes"][dsel],
                    im["det_scores"][dsel],
                    im["gt_boxes"][gsel],
                    n_thr,
                )
            )
            scores.append(im["det_scores"][dsel])
        tp = np.concatenate(tps) if tps else np.zeros((0, n_thr), bool)
        sc = np.concatenate(scores) if scores else np.zeros(0)
        order = np.argsort(-sc, kind="mergesort")
        tp = tp[order]
        for ti in range(n_thr):
            tp_cum = tp[:, ti].cumsum()
            fp_cum = (~tp[:, ti]).cumsum()
            rc = tp_cum / n_gt
            pr = tp_cum / (tp_cum + fp_cum + np.spacing(1))
            # Precision envelope (right-to-left running max), then sample
            # at the 101 recall thresholds — pycocotools accumulate().
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, REC_THRESHOLDS, side="left")
            q = np.zeros(len(REC_THRESHOLDS))
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            ap[c, ti] = q.mean()
    present = ~np.isnan(ap[:, 0])
    if not present.any():
        return {"mAP50": 0.0, "mAP50-95": 0.0, "ap": ap}
    return {
        "mAP50": float(ap[present, 0].mean()),
        "mAP50-95": float(ap[present].mean()),
        "ap": ap,
    }
