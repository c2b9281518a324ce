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
