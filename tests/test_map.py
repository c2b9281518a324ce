import numpy as np

from snn_object_detectionddp_tpu.evals.map import (
    DetMetrics,
    IOU_THRESHOLDS,
    match_predictions,
)


def _boxes(*rows):
    return np.array(rows, np.float32)


def test_perfect_predictions_full_map():
    m = DetMetrics(num_classes=2)
    gt = _boxes([0, 0, 10, 10], [20, 20, 40, 40])
    gt_cls = np.array([0.0, 1.0])
    m.update(gt.copy(), np.array([0.9, 0.8]), gt_cls.copy(), gt, gt_cls)
    r = m.compute()
    # 101-point trapezoid drops the envelope to 0 at recall 1.0, so a
    # perfect detector scores ~0.995 (same convention as ultralytics).
    assert r["metrics/mAP50(B)"] > 0.99
    assert r["metrics/mAP50-95(B)"] > 0.98
    assert r["metrics/precision(B)"] > 0.999
    assert r["metrics/recall(B)"] > 0.999
    assert abs(r["fitness"] - (0.1 * r["metrics/mAP50(B)"] + 0.9 * r["metrics/mAP50-95(B)"])) < 1e-9


def test_no_predictions_zero_map():
    m = DetMetrics(num_classes=2)
    gt = _boxes([0, 0, 10, 10])
    m.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), gt, np.array([0.0]))
    r = m.compute()
    assert r["metrics/mAP50(B)"] == 0.0


def test_wrong_class_never_matches():
    tp = match_predictions(
        _boxes([0, 0, 10, 10]),
        np.array([1.0]),
        _boxes([0, 0, 10, 10]),
        np.array([0.0]),
    )
    assert not tp.any()


def test_iou_threshold_gradation():
    """A prediction with IoU ~0.6 counts at threshold 0.5/0.55/0.6 only."""
    pred = _boxes([0, 0, 10, 6])  # vs gt [0,0,10,10]: IoU = 60/100 = 0.6
    tp = match_predictions(
        pred, np.array([0.0]), _boxes([0, 0, 10, 10]), np.array([0.0])
    )
    expected = IOU_THRESHOLDS <= 0.6
    np.testing.assert_array_equal(tp[0], expected)


def test_duplicate_detection_counts_once():
    """Two predictions on one gt: one TP, one FP -> AP50 stays 1.0 only if
    the duplicate is lower-confidence... here it halves precision tail."""
    m = DetMetrics(num_classes=1)
    gt = _boxes([0, 0, 10, 10])
    preds = _boxes([0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5])
    m.update(preds, np.array([0.9, 0.8]), np.zeros(2), gt, np.zeros(1))
    r = m.compute()
    # TP at conf .9 reaches recall 1 with precision 1 -> AP50 ~ 1.
    assert r["metrics/mAP50(B)"] > 0.99
    # Both matched? No: second must be FP.
    tp = match_predictions(preds, np.zeros(2), gt, np.zeros(1))
    assert tp[:, 0].sum() == 1


def test_missed_gt_lowers_recall():
    m = DetMetrics(num_classes=1)
    gt = _boxes([0, 0, 10, 10], [30, 30, 40, 40])
    preds = _boxes([0, 0, 10, 10])
    m.update(preds, np.array([0.9]), np.zeros(1), gt, np.zeros(2))
    r = m.compute()
    assert abs(r["metrics/recall(B)"] - 0.5) < 1e-6
    # ultralytics convention: the precision-0 sentinel sits just past the
    # last attained recall (recall[-1] + 0.01), so AP ~ attained recall *
    # precision = 0.5, NOT a linear ramp to (1, 0) (which gave 0.75 and
    # disagreed with both ultralytics and pycocotools — caught by the
    # oracle cross-validation, tests/test_map_oracle.py).
    assert abs(r["metrics/mAP50(B)"] - 0.505) < 0.01
