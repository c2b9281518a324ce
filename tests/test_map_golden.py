"""Hand-derived COCO-AP golden fixture (VERDICT r4 next #7).

pycocotools cannot be installed on this host (no egress), so the
third-party cross-check in test_map_oracle.py is permanently skipped here.
This file replaces that latent check with one that EXECUTES: a small
scenario whose COCO 101-point APs are derived by hand below, digit by
digit, independently of both the clean-room oracle (tests/oracle_cocoeval)
and the production DetMetrics (evals/map.py). The oracle must reproduce
the numbers exactly; DetMetrics (ultralytics AP convention — np.interp
over the PR envelope instead of COCOeval's step lookup) must agree within
its documented convention envelope.

Scenario (1 class, 2 images, 3 GT boxes, 5 detections):

  image A: GT A1=[0,0,10,10], A2=[20,20,30,30]
    d1 score 0.90 box [0,0,10,10]   -> IoU(A1) = 1.0
    d2 score 0.85 box [40,40,50,50] -> IoU 0 with everything (always FP)
    d4 score 0.75 box [21,20,31,30] -> IoU(A2) = 90/110 = 0.8181..
  image B: GT B1=[0,0,10,10]
    d3 score 0.80 box [2,0,12,10]   -> IoU(B1) = 80/120 = 0.6666..
    d5 score 0.70 box [0,0,10,20]   -> IoU(B1) = 100/200 = 0.5, but B1 is
       always taken by d3 at the only thresholds (.5-.65) where 0.5 could
       match, and 0.5 < every higher threshold -> always FP.

Per IoU threshold t (nGT=3; detections score-sorted d1,d2,d3,d4,d5):

  t in {.50,.55,.60,.65}: TP,FP,TP,TP,FP
    PR points (R, P): (1/3, 1), (2/3, 2/3), (1, 3/4)
    right-max envelope: 1 for r<=1/3, 3/4 above
    101-pt AP = (34*1 + 67*(3/4)) / 101 = 84.25/101 = 0.83415841..
      [recall thresholds 0.00..0.33 -> 34 points at precision 1;
       0.34..1.00 -> 67 points at 3/4]
  t in {.70,.75,.80}: d3 drops (0.667 < t): TP,FP,FP,TP,FP
    points: (1/3, 1), (2/3, 1/2); recall never reaches 1
    AP = (34*1 + 33*(1/2) + 34*0) / 101 = 50.5/101 = 0.5
  t in {.85,.90,.95}: d4 drops too (0.818 < t): only d1 is TP
    AP = 34/101 = 0.33663366..

  mAP50    = 84.25/101                       = 0.8341584158..
  mAP50-95 = (4*(84.25/101) + 3*0.5 + 3*(34/101)) / 10
           = 0.5846534653..
"""

import numpy as np

from snn_object_detectionddp_tpu.evals.map import DetMetrics
from tests.oracle_cocoeval import coco_map

GOLDEN_AP50 = 84.25 / 101.0
GOLDEN_AP50_95 = (4 * (84.25 / 101.0) + 3 * 0.5 + 3 * (34.0 / 101.0)) / 10.0


def _images():
    a = {
        "gt_boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
        "gt_cls": np.array([0, 0]),
        "det_boxes": np.array(
            [[0, 0, 10, 10], [40, 40, 50, 50], [21, 20, 31, 30]], float
        ),
        "det_scores": np.array([0.90, 0.85, 0.75]),
        "det_cls": np.array([0, 0, 0]),
    }
    b = {
        "gt_boxes": np.array([[0, 0, 10, 10]], float),
        "gt_cls": np.array([0]),
        "det_boxes": np.array([[2, 0, 12, 10], [0, 0, 10, 20]], float),
        "det_scores": np.array([0.80, 0.70]),
        "det_cls": np.array([0, 0]),
    }
    return [a, b]


def test_oracle_matches_hand_derivation_exactly():
    """The clean-room COCOeval oracle must reproduce the hand-computed
    101-point APs to float precision — this is the executable third-party-
    independent anchor for the whole mAP stack."""
    res = coco_map(_images(), num_classes=1)
    np.testing.assert_allclose(res["mAP50"], GOLDEN_AP50, atol=1e-9)
    np.testing.assert_allclose(res["mAP50-95"], GOLDEN_AP50_95, atol=1e-9)


def test_detmetrics_matches_hand_derivation():
    """Production DetMetrics agrees within the ultralytics-vs-COCO
    interpolation convention envelope (np.interp over the same envelope
    vs step lookup; bounded well under the oracle sweep's 0.03)."""
    m = DetMetrics(1)
    for im in _images():
        m.update(
            im["det_boxes"],
            im["det_scores"],
            im["det_cls"],
            im["gt_boxes"],
            im["gt_cls"],
        )
    res = m.compute()
    assert abs(res["metrics/mAP50(B)"] - GOLDEN_AP50) < 0.02
    assert abs(res["metrics/mAP50-95(B)"] - GOLDEN_AP50_95) < 0.02


def test_oracle_iou_knife_edges():
    """Pin the exact IoUs the derivation depends on (a transcription error
    in the fixture would silently re-derive different APs)."""
    from tests.oracle_cocoeval import iou_xyxy

    a1 = np.array([[0, 0, 10, 10]], float)
    a2 = np.array([[20, 20, 30, 30]], float)
    np.testing.assert_allclose(
        iou_xyxy(np.array([[21, 20, 31, 30]], float), a2)[0, 0], 90 / 110
    )
    np.testing.assert_allclose(
        iou_xyxy(np.array([[2, 0, 12, 10]], float), a1)[0, 0], 80 / 120
    )
    np.testing.assert_allclose(
        iou_xyxy(np.array([[0, 0, 10, 20]], float), a1)[0, 0], 0.5
    )
