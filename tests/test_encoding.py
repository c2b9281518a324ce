import jax
import numpy as np

from snn_object_detectionddp_tpu.data.encoding import (
    encode_direct,
    encode_rate,
    preprocess_video,
)
from snn_object_detectionddp_tpu.evals.legacy import compute_iou_list, gt_velocity


def test_preprocess_video_layout_and_range():
    imgs = np.random.RandomState(0).randint(
        0, 255, size=(2, 3, 16, 20, 3), dtype=np.uint8
    )
    out = np.asarray(preprocess_video(imgs), np.float32)
    assert out.shape == (3, 2, 16, 20, 3)  # time-major
    assert out.min() >= 0.0 and out.max() <= 1.0
    # Default output is the model compute dtype (bf16): values match the
    # f32 pipeline up to one bf16 rounding (the first conv consumed
    # bf16(x/255) either way).
    np.testing.assert_allclose(out[1, 0], imgs[0, 1] / 255.0, atol=2.5e-3)
    import jax.numpy as jnp

    out32 = np.asarray(preprocess_video(imgs, dtype=jnp.float32))
    np.testing.assert_allclose(out32[1, 0], imgs[0, 1] / 255.0, atol=1e-6)


def test_preprocess_video_resize():
    imgs = np.zeros((1, 2, 16, 20, 3), np.uint8)
    out = preprocess_video(imgs, out_hw=(8, 10))
    assert out.shape == (2, 1, 8, 10, 3)


def test_encode_direct_repeats():
    imgs = np.random.RandomState(1).randint(0, 255, size=(2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(encode_direct(imgs, timesteps=4))
    assert out.shape == (4, 2, 8, 8, 3)
    np.testing.assert_array_equal(out[0], out[3])


def test_encode_rate_statistics():
    # Uniform gray image: spike probability must track intensity.
    imgs = np.full((1, 32, 32, 3), 64, np.uint8)  # p ~ 0.25
    out = np.asarray(encode_rate(imgs, jax.random.PRNGKey(0), timesteps=64))
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert abs(out.mean() - 64 / 255) < 0.02


def test_compute_iou_list_topn():
    det = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    gt = np.array([[0, 0, 10, 10]], np.float32)
    assert compute_iou_list(det, gt) == 0.5  # (1.0 + 0.0) / 2
    assert compute_iou_list(det, gt, top_n=1) == 1.0


def test_gt_velocity():
    f0 = np.array([[0, 0, 10, 10]], np.float32)
    f1 = np.array([[5, 0, 15, 10]], np.float32)  # center moved +5 px
    v = gt_velocity([f0, f1], frame_dt_s=0.05)
    np.testing.assert_allclose(v, [100.0])  # 5 px / 0.05 s
    assert gt_velocity([f0, np.zeros((0, 4), np.float32)]) == [0.0]
