import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.losses.tal import task_aligned_assign
from snn_object_detectionddp_tpu.ops.anchors import make_anchors


def _setup(nc=3, m=4):
    # One 8x8 grid at stride 8 -> 64 anchors over a 64x64 image.
    anc, strides = make_anchors([(8, 8)], [8])
    anc_px = anc * strides
    a = anc_px.shape[0]
    # Predicted boxes: a fixed 16x16 box centered on each anchor.
    pd_boxes = jnp.concatenate([anc_px - 8.0, anc_px + 8.0], axis=-1)[None]
    pd_scores = jnp.full((1, a, nc), 0.5)
    return anc_px, pd_boxes, pd_scores


def test_assign_single_gt():
    anc_px, pd_boxes, pd_scores = _setup()
    gt_boxes = jnp.array([[[8.0, 8.0, 40.0, 40.0]] + [[0.0] * 4] * 3])
    gt_labels = jnp.array([[2, 0, 0, 0]])
    mask_gt = jnp.array([[True, False, False, False]])

    res = task_aligned_assign(
        pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask_gt
    )
    fg = np.asarray(res.fg_mask)[0]
    assert fg.sum() > 0
    assert fg.sum() <= 10  # topk
    # All fg anchors must lie inside the gt box.
    centers = np.asarray(anc_px)[fg]
    assert (centers > 8.0).all() and (centers < 40.0).all()
    # Assigned targets: class 2, the gt box.
    labels = np.asarray(res.target_labels)[0][fg]
    assert (labels == 2).all()
    boxes = np.asarray(res.target_bboxes)[0][fg]
    np.testing.assert_allclose(boxes, np.tile([8.0, 8.0, 40.0, 40.0], (fg.sum(), 1)))
    # Scores only on the gt class, bounded by 1, zero on background anchors.
    scores = np.asarray(res.target_scores)[0]
    assert scores[~fg].sum() == 0.0
    assert scores[fg][:, 2].max() <= 1.0 + 1e-6
    assert scores[fg][:, [0, 1]].sum() == 0.0


def test_assign_no_gt():
    anc_px, pd_boxes, pd_scores = _setup()
    gt_boxes = jnp.zeros((1, 4, 4))
    gt_labels = jnp.zeros((1, 4), jnp.int32)
    mask_gt = jnp.zeros((1, 4), bool)
    res = task_aligned_assign(
        pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask_gt
    )
    assert np.asarray(res.fg_mask).sum() == 0
    assert np.asarray(res.target_scores).sum() == 0.0


def test_multi_gt_resolution_by_iou():
    """An anchor inside two gt boxes goes to the gt with higher IoU to the
    anchor's predicted box."""
    anc_px, pd_boxes, pd_scores = _setup()
    # Big box covering everything, small box matching pred size near anchor (20,20).
    gt_boxes = jnp.array(
        [[[0.0, 0.0, 64.0, 64.0], [12.0, 12.0, 28.0, 28.0]] + [[0.0] * 4] * 2]
    )
    gt_labels = jnp.array([[1, 2, 0, 0]])
    mask_gt = jnp.array([[True, True, False, False]])
    res = task_aligned_assign(
        pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask_gt
    )
    # The anchor at (20.5, 20.5)*? -> grid anchor centers are at 4,12,20,...
    # Anchor center (20, 20): pred box (12..28) == small gt -> IoU 1 vs big gt
    # IoU (256/4096). Must be assigned to class 2.
    idx = np.argmin(
        np.abs(np.asarray(anc_px) - np.array([20.0, 20.0])).sum(-1)
    )
    labels = np.asarray(res.target_labels)[0]
    fg = np.asarray(res.fg_mask)[0]
    assert fg[idx]
    assert labels[idx] == 2


def _oracle_assign(
    pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt,
    topk=10, alpha=0.5, beta=6.0, eps=1e-9,
):
    """Independent brute-force reference for task_aligned_assign: plain
    python loops and sets over (b, m, a), following the ultralytics
    TaskAlignedAssigner semantics (candidates strictly inside the gt box,
    align = score^alpha * clip(ciou)^beta, per-gt top-k with positive
    metric, multi-claim resolution by max IoU with lowest-index ties,
    per-gt peak normalization of soft targets). Only the CIoU primitive is
    shared with the implementation under test (it has its own oracle in
    tests/test_boxes.py)."""
    from snn_object_detectionddp_tpu.ops.boxes import ciou as _ciou

    B, A, nc = pd_scores.shape
    M = gt_labels.shape[1]
    overlaps = np.clip(
        np.asarray(
            _ciou(
                jnp.asarray(gt_bboxes)[:, :, None, :],
                jnp.asarray(pd_bboxes)[:, None, :, :],
            )
        ),
        0.0,
        None,
    )  # (B, M, A)

    tl = np.zeros((B, A), np.int32)
    tb = np.zeros((B, A, 4), np.float64)
    ts = np.zeros((B, A, nc), np.float64)
    fg = np.zeros((B, A), bool)
    for b in range(B):
        align = np.zeros((M, A))
        claim = np.zeros((M, A), bool)
        for m in range(M):
            if not mask_gt[b, m]:
                continue
            x1, y1, x2, y2 = gt_bboxes[b, m]
            for a in range(A):
                x, y = anc_points[a]
                if not (
                    x - x1 > eps and y - y1 > eps and x2 - x > eps and y2 - y > eps
                ):
                    continue
                s = pd_scores[b, a, int(gt_labels[b, m])]
                align[m, a] = (s ** alpha) * (overlaps[b, m, a] ** beta)
            order = np.argsort(-align[m])[:topk]
            for a in order:
                if align[m, a] > 1e-9:
                    claim[m, a] = True
        # conflict resolution + target construction
        resolved = np.zeros((M, A), bool)
        for a in range(A):
            claimants = [m for m in range(M) if claim[m, a]]
            if not claimants:
                continue
            fg[b, a] = True
            best = max(claimants, key=lambda m: (overlaps[b, m, a], -m))
            resolved[best, a] = True
            tl[b, a] = gt_labels[b, best]
            tb[b, a] = gt_bboxes[b, best]
        align = np.where(resolved, align, 0.0)
        for m in range(M):
            pos_align = align[m].max()
            pos_overlap = np.where(resolved[m], overlaps[b, m], 0.0).max()
            norm = align[m] * pos_overlap / (pos_align + 1e-9)
            for a in range(A):
                if resolved[m, a]:
                    ts[b, a, tl[b, a]] = max(ts[b, a, tl[b, a]], norm[a])
    return tl, tb, ts, fg


def test_assign_matches_bruteforce_oracle_randomized():
    """Differential sweep: the fixed-shape, fully-masked XLA assigner must
    reproduce an independent looping oracle over random scenes — including
    empty scenes, padded gt rows, degenerate boxes, and crowded anchors
    claimed by several gts (SURVEY §7 hard-part #1: the ragged->dense
    rewrite is exactly where convention drift would hide)."""
    rng = np.random.RandomState(0)
    anc, strides = make_anchors([(8, 8), (4, 4)], [8, 16])
    anc_px = np.asarray(anc * strides)
    A = anc_px.shape[0]
    nc, M, B = 4, 6, 3

    for trial in range(8):
        pd_scores = rng.rand(B, A, nc).astype(np.float64)
        centers = rng.rand(B, A, 2) * 64.0
        halves = rng.rand(B, A, 2) * 24.0 + 2.0
        pd_boxes = np.concatenate([centers - halves, centers + halves], -1)
        gt_centers = rng.rand(B, M, 2) * 64.0
        gt_halves = rng.rand(B, M, 2) * 28.0 + 1.0
        gt_boxes = np.concatenate(
            [gt_centers - gt_halves, gt_centers + gt_halves], -1
        )
        gt_labels = rng.randint(0, nc, size=(B, M)).astype(np.int32)
        mask_gt = rng.rand(B, M) < 0.7
        mask_gt[0] = False  # one all-padding sample per trial
        gt_boxes[~mask_gt] = 0.0  # padded rows are degenerate, as the loader pads

        res = task_aligned_assign(
            jnp.asarray(pd_scores),
            jnp.asarray(pd_boxes),
            jnp.asarray(anc_px),
            jnp.asarray(gt_labels),
            jnp.asarray(gt_boxes),
            jnp.asarray(mask_gt),
        )
        tl, tb, ts, fg = _oracle_assign(
            pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask_gt
        )
        np.testing.assert_array_equal(np.asarray(res.fg_mask), fg)
        np.testing.assert_array_equal(
            np.asarray(res.target_labels)[fg], tl[fg]
        )
        np.testing.assert_allclose(
            np.asarray(res.target_bboxes)[fg], tb[fg], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(res.target_scores), ts, rtol=1e-4, atol=1e-5
        )
