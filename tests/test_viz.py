import cv2
import numpy as np

from snn_object_detectionddp_tpu.viz.overlay import draw_bboxes
from snn_object_detectionddp_tpu.viz.video import stitch_video


def test_draw_bboxes_marks_pixels():
    img = np.zeros((50, 60, 3), np.uint8)
    out = draw_bboxes(
        img,
        np.array([[10, 10, 30, 30]], np.float32),
        scores=np.array([0.9]),
        classes=np.array([1]),
        class_names=["a", "b"],
    )
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    assert img.sum() == 0  # input untouched (copy semantics)
    # Rectangle edge pixels colored.
    assert out[10, 20].sum() > 0


def test_stitch_video(tmp_path):
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(5):
        img = np.full((32, 48, 3), i * 40, np.uint8)
        cv2.imwrite(str(frames / f"{i:03d}.png"), img)
    out = stitch_video(frames, tmp_path / "v/out.mp4", fps=10)
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 5


def test_stitch_video_empty_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        stitch_video(tmp_path, tmp_path / "o.mp4")


def test_frames_to_video(tmp_path):
    from snn_object_detectionddp_tpu.viz.video import frames_to_video

    rng = np.random.RandomState(0)
    frames_u8 = rng.randint(0, 255, (5, 32, 48, 3), np.uint8)
    out = frames_to_video(frames_u8, tmp_path / "u8.mp4", fps=10)
    assert (tmp_path / "u8.mp4").stat().st_size > 0

    # Float [0, 1] frames are scaled like the reference helper
    # (utils.py:639-667).
    frames_f = rng.rand(4, 32, 48, 3).astype(np.float32)
    frames_to_video(frames_f, tmp_path / "f.mp4")
    assert (tmp_path / "f.mp4").stat().st_size > 0

    import pytest

    with pytest.raises(ValueError):
        frames_to_video(np.zeros((3, 32, 48)), tmp_path / "bad.mp4")
