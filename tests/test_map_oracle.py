"""Cross-validate evals/map.py against the independent COCO-style oracle
(tests/oracle_cocoeval.py) on randomized detection/GT fixtures.

A convention mismatch in the production metric (candidate pool, match
order, AP interpolation, per-class aggregation) shows up as a systematic
gap against the oracle; the two implementations share no code. Known,
bounded convention deltas between the ultralytics lineage (which
evals/map.py follows, as the reference's eval_2.py:125-130 does) and the
COCO lineage:

- matching order: ultralytics sorts candidate (gt, det) pairs globally by
  IoU; COCO walks detections by descending score. They diverge only when
  boxes overlap heavily.
- AP integration: trapezoid over the interpolated envelope vs 101-point
  sampling of the envelope. Differs by O(1/101) per PR step.

Scenes below use moderately separated objects so those deltas stay small;
the assertion tolerance (0.02 absolute) is far below the gap any real
convention bug produces (pool truncation, wrong class handling, missed
dedup all shift mAP by 0.1+ on these fixtures).
"""

import numpy as np

from snn_object_detectionddp_tpu.evals.map import DetMetrics

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from oracle_cocoeval import coco_map  # noqa: E402

NC = 4


def _random_scene(rng, img=640, n_obj=8, jitter=6.0, drop_p=0.25, fp=3):
    """GT boxes on a loose grid (bounded overlap) + jittered detections with
    drops, score noise, and false positives."""
    gt_boxes, gt_cls = [], []
    for _ in range(n_obj):
        w, h = rng.uniform(40, 120, 2)
        x1 = rng.uniform(0, img - w)
        y1 = rng.uniform(0, img - h)
        gt_boxes.append([x1, y1, x1 + w, y1 + h])
        gt_cls.append(rng.randint(NC))
    gt_boxes = np.asarray(gt_boxes, np.float64)
    gt_cls = np.asarray(gt_cls)

    det_boxes, det_scores, det_cls = [], [], []
    for b, c in zip(gt_boxes, gt_cls):
        if rng.rand() < drop_p:
            continue  # missed detection
        noise = rng.uniform(-jitter, jitter, 4)
        det_boxes.append(b + noise)
        det_scores.append(rng.uniform(0.3, 0.99))
        det_cls.append(c if rng.rand() > 0.1 else rng.randint(NC))
    for _ in range(fp):  # false positives
        w, h = rng.uniform(30, 90, 2)
        x1 = rng.uniform(0, img - w)
        y1 = rng.uniform(0, img - h)
        det_boxes.append([x1, y1, x1 + w, y1 + h])
        det_scores.append(rng.uniform(0.05, 0.5))
        det_cls.append(rng.randint(NC))
    det_boxes = (
        np.asarray(det_boxes, np.float64) if det_boxes else np.zeros((0, 4))
    )
    return {
        "det_boxes": det_boxes,
        "det_scores": np.asarray(det_scores, np.float64),
        "det_cls": np.asarray(det_cls),
        "gt_boxes": gt_boxes,
        "gt_cls": gt_cls,
    }


def _both(images):
    m = DetMetrics(NC)
    for im in images:
        m.update(
            im["det_boxes"],
            im["det_scores"],
            im["det_cls"],
            im["gt_boxes"],
            im["gt_cls"],
        )
    ours = m.compute()
    oracle = coco_map(images, NC)
    return ours, oracle


def test_map_matches_oracle_randomized():
    rng = np.random.RandomState(0)
    for trial in range(5):
        images = [_random_scene(rng) for _ in range(12)]
        ours, oracle = _both(images)
        assert abs(ours["metrics/mAP50(B)"] - oracle["mAP50"]) < 0.02, (
            trial,
            ours["metrics/mAP50(B)"],
            oracle["mAP50"],
        )
        assert abs(ours["metrics/mAP50-95(B)"] - oracle["mAP50-95"]) < 0.02, (
            trial,
            ours["metrics/mAP50-95(B)"],
            oracle["mAP50-95"],
        )


def test_map_matches_oracle_perfect_detections():
    """Exact detections -> both must report exactly 1.0."""
    rng = np.random.RandomState(1)
    images = []
    for _ in range(4):
        s = _random_scene(rng, jitter=0.0, drop_p=0.0, fp=0)
        s["det_cls"] = s["gt_cls"].copy()  # no class flips
        s["det_boxes"] = s["gt_boxes"].copy()
        images.append(s)
    ours, oracle = _both(images)
    assert abs(ours["metrics/mAP50-95(B)"] - 1.0) < 1e-6
    assert abs(oracle["mAP50-95"] - 1.0) < 1e-6


def test_map_matches_oracle_hand_case():
    """Structured case where the *matching* conventions coincide exactly:
    separated boxes, one miss, one false positive, one localization error.
    Residual difference is only the integration convention (trapezoid over
    the envelope vs 101-point sampling), bounded by ~1/101 per PR step."""
    images = [
        {
            "det_boxes": np.array(
                [
                    [0, 0, 100, 100],  # exact TP
                    [200, 0, 290, 100],  # IoU ~0.82 vs gt [200,0,300,100]
                    [0, 400, 80, 480],  # FP (no gt there)
                ],
                np.float64,
            ),
            "det_scores": np.array([0.9, 0.8, 0.7]),
            "det_cls": np.array([0, 0, 0]),
            "gt_boxes": np.array(
                [
                    [0, 0, 100, 100],
                    [200, 0, 300, 100],
                    [400, 400, 500, 500],  # missed
                ],
                np.float64,
            ),
            "gt_cls": np.array([0, 0, 0]),
        }
    ]
    ours, oracle = _both(images)
    assert abs(ours["metrics/mAP50(B)"] - oracle["mAP50"]) < 0.01
    assert abs(ours["metrics/mAP50-95(B)"] - oracle["mAP50-95"]) < 0.01


def test_map_oracle_catches_pool_truncation():
    """Meta-test: the oracle must actually detect a convention bug. Keeping
    only the top-3 detections per image (simulating an over-aggressive
    pre-NMS pool) must produce a visible mAP gap against the oracle fed the
    full set."""
    rng = np.random.RandomState(2)
    images = [_random_scene(rng, n_obj=10, drop_p=0.0, fp=0) for _ in range(8)]
    truncated = []
    for im in images:
        order = np.argsort(-im["det_scores"])[:3]
        truncated.append(
            {
                **im,
                "det_boxes": im["det_boxes"][order],
                "det_scores": im["det_scores"][order],
                "det_cls": im["det_cls"][order],
            }
        )
    m = DetMetrics(NC)
    for im in truncated:
        m.update(
            im["det_boxes"],
            im["det_scores"],
            im["det_cls"],
            im["gt_boxes"],
            im["gt_cls"],
        )
    ours_truncated = m.compute()
    oracle_full = coco_map(images, NC)
    assert (
        oracle_full["mAP50"] - ours_truncated["metrics/mAP50(B)"] > 0.1
    ), "oracle failed to expose pool truncation"
