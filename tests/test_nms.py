import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.ops.nms import batched_nms, non_max_suppression


def _toy():
    # Box 0 and 1 heavily overlap; box 2 is elsewhere.
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],
            [50.0, 50.0, 60.0, 60.0],
        ]
    )
    scores = jnp.array(
        [
            [0.9, 0.0],
            [0.8, 0.0],
            [0.0, 0.7],
        ]
    )
    return boxes, scores


def test_nms_suppresses_overlap():
    boxes, scores = _toy()
    out = non_max_suppression(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_det=5)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2  # box 1 suppressed by box 0
    np.testing.assert_allclose(np.asarray(out["scores"])[:2], [0.9, 0.7], atol=1e-6)
    assert list(np.asarray(out["classes"])[:2]) == [0, 1]


def test_nms_class_aware():
    boxes, scores = _toy()
    # Same overlapping boxes but different classes -> both survive.
    scores = jnp.array([[0.9, 0.0], [0.0, 0.8], [0.0, 0.7]])
    out = non_max_suppression(boxes, scores, conf_thres=0.1, iou_thres=0.5, max_det=5)
    assert np.asarray(out["valid"]).sum() == 3


def test_nms_conf_threshold():
    boxes, scores = _toy()
    out = non_max_suppression(boxes, scores, conf_thres=0.85, iou_thres=0.5, max_det=5)
    assert np.asarray(out["valid"]).sum() == 1
    assert np.asarray(out["scores"])[0] == np.float32(0.9)


def test_nms_multilabel_emits_per_class():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    scores = jnp.array([[0.9, 0.8]])
    single = non_max_suppression(
        boxes, scores, conf_thres=0.5, iou_thres=0.5, max_det=5, multi_label=False
    )
    multi = non_max_suppression(
        boxes, scores, conf_thres=0.5, iou_thres=0.5, max_det=5, multi_label=True
    )
    assert np.asarray(single["valid"]).sum() == 1
    # multi_label: same box emitted for both classes; class-aware NMS keeps both.
    assert np.asarray(multi["valid"]).sum() == 2


def test_batched_nms_shapes():
    boxes, scores = _toy()
    out = batched_nms(boxes[None], scores[None], conf_thres=0.1, max_det=7)
    assert out["boxes"].shape == (1, 7, 4)
    assert out["scores"].shape == (1, 7)


def _random_dets(rng, n=600, nc=3, img=512):
    cx = rng.uniform(0, img, n)
    cy = rng.uniform(0, img, n)
    w = rng.uniform(8, 80, n)
    h = rng.uniform(8, 80, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scores = rng.uniform(0, 1, (n, nc)) ** 3  # long low-conf tail
    return jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32)


def test_greedy_path_matches_matrix_path():
    """The O(k) greedy path (pools > 4096) must produce the same surviving
    set as the IoU-matrix path on identical inputs."""
    from snn_object_detectionddp_tpu.ops import nms as nms_mod

    rng = np.random.RandomState(0)
    boxes, scores = _random_dets(rng)
    kw = dict(conf_thres=0.001, iou_thres=0.6, max_det=50)
    out_m = non_max_suppression(boxes, scores, pre_nms_topk=600, **kw)

    orig = nms_mod._MATRIX_PATH_MAX_K
    nms_mod._MATRIX_PATH_MAX_K = 0  # force greedy
    try:
        out_g = non_max_suppression(boxes, scores, pre_nms_topk=601, **kw)
    finally:
        nms_mod._MATRIX_PATH_MAX_K = orig

    vm, vg = np.asarray(out_m["valid"]), np.asarray(out_g["valid"])
    assert vm.sum() == vg.sum()
    n = vm.sum()
    np.testing.assert_allclose(
        np.asarray(out_m["scores"])[:n], np.asarray(out_g["scores"])[:n], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_m["boxes"])[:n], np.asarray(out_g["boxes"])[:n], atol=1e-4
    )
    assert (np.asarray(out_m["classes"])[:n] == np.asarray(out_g["classes"])[:n]).all()


def test_eval_pool_size_invariance():
    """At eval thresholds (conf=0.001), the output must be identical once the
    pool covers all above-threshold candidates — i.e. 30k (ultralytics) vs
    full-pool give the same mAP-relevant detections (VERDICT round-1 #4)."""
    rng = np.random.RandomState(1)
    boxes, scores = _random_dets(rng, n=2000)
    kw = dict(conf_thres=0.001, iou_thres=0.6, max_det=300)
    out_a = non_max_suppression(boxes, scores, pre_nms_topk=30000, **kw)
    out_b = non_max_suppression(boxes, scores, pre_nms_topk=2000, **kw)
    va, vb = np.asarray(out_a["valid"]), np.asarray(out_b["valid"])
    assert va.sum() == vb.sum()
    n = va.sum()
    np.testing.assert_allclose(
        np.asarray(out_a["scores"])[:n], np.asarray(out_b["scores"])[:n], atol=1e-6
    )


def test_deep_suppression_chain_exact():
    """A chain of boxes each overlapping only its neighbor: exact NMS keeps
    every EVEN-indexed box (odd ones are suppressed by a kept neighbor, so
    they cannot suppress onward). A one-sweep "fast NMS" approximation
    would instead drop every box but the first — this pins the matrix
    path's fixpoint sweep (ops/nms.py::_nms_matrix) to the exact
    sequential semantics at chain depth >> 1.
    """
    n = 21
    # Box i spans [6i, 6i+10): IoU(i, i+1) = 4/16 = 0.25 > 0.2; IoU(i, i+2)=0.
    boxes = jnp.array([[6.0 * i, 0.0, 6.0 * i + 10.0, 10.0] for i in range(n)])
    scores = jnp.array([[0.9 - 0.01 * i] for i in range(n)])  # descending
    out = non_max_suppression(
        boxes, scores, conf_thres=0.05, iou_thres=0.2, max_det=n
    )
    valid = np.asarray(out["valid"])
    kept_x1 = sorted(np.asarray(out["boxes"])[valid][:, 0].tolist())
    assert kept_x1 == [6.0 * i for i in range(0, n, 2)]


def test_large_pool_fori_path_matches_greedy():
    """Pools in (_FIXPOINT_MAX_K, _MATRIX_PATH_MAX_K] take the bounded
    sequential sweep inside the matrix path; same results as the O(k)
    greedy path at an eval-style pool."""
    rng = np.random.RandomState(7)
    n = 3000
    xy = rng.uniform(0, 600, size=(n, 2))
    wh = rng.uniform(10, 60, size=(n, 2))
    boxes = jnp.asarray(
        np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    )
    scores = jnp.asarray(rng.uniform(0.01, 1.0, size=(n, 2)).astype(np.float32))
    a = non_max_suppression(
        boxes, scores, conf_thres=0.05, iou_thres=0.5, max_det=100,
        pre_nms_topk=2048,
    )
    b = non_max_suppression(
        boxes, scores, conf_thres=0.05, iou_thres=0.5, max_det=100,
        pre_nms_topk=8192,  # > _MATRIX_PATH_MAX_K -> greedy path
    )
    # The 2048 pool must contain every survivor of the 8192 pool here
    # (scores above conf are dense, well over max_det survivors exist).
    va, vb = np.asarray(a["valid"]), np.asarray(b["valid"])
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_allclose(
        np.asarray(a["scores"])[va], np.asarray(b["scores"])[vb], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a["boxes"])[va], np.asarray(b["boxes"])[vb], atol=1e-5
    )
