import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.ops.anchors import (
    bbox2dist,
    dist2bbox,
    make_anchors,
)


def test_make_anchors_grid():
    pts, strides = make_anchors([(2, 2), (1, 1)], [8, 16])
    np.testing.assert_allclose(
        np.asarray(pts),
        [[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5], [0.5, 0.5]],
    )
    np.testing.assert_allclose(np.asarray(strides).ravel(), [8, 8, 8, 8, 16])


def test_dist_bbox_inverse():
    pts, _ = make_anchors([(4, 4)], [8])
    rng = np.random.RandomState(0)
    dist = jnp.asarray(rng.uniform(0.1, 3.0, size=(1, 16, 4)).astype(np.float32))
    boxes = dist2bbox(dist, pts)
    back = bbox2dist(boxes, pts, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)
