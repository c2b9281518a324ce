"""Native C++ PNG batch decoder vs cv2 (must be bit-identical RGB)."""

import cv2
import numpy as np
import pytest

from snn_object_detectionddp_tpu.data import native
from snn_object_detectionddp_tpu.data.synthetic import make_sequence


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq")
    make_sequence(root / "s0", num_frames=6, height=48, width=64)
    files = sorted((root / "s0" / "images/left/distorted").glob("*.png"))
    return [str(f) for f in files]


def test_native_available():
    assert native.available(), "libsnnloader.so failed to build/load"


def test_shape_probe(pngs):
    assert native.png_shape(pngs[0]) == (48, 64)


def test_decode_matches_cv2(pngs):
    out = native.decode_batch(pngs, 48, 64, n_threads=3)
    assert out.shape == (len(pngs), 48, 64, 3)
    for i, p in enumerate(pngs):
        ref = cv2.imread(p)[:, :, ::-1]  # BGR -> RGB
        np.testing.assert_array_equal(out[i], ref)


def test_missing_file_raises(pngs):
    with pytest.raises(FileNotFoundError):
        native.decode_batch([pngs[0], "/nonexistent/x.png"], 48, 64)


def test_wrong_size_raises(pngs):
    with pytest.raises(FileNotFoundError):
        native.decode_batch(pngs, 100, 100)


def test_pipeline_uses_native(tmp_path):
    """BatchLoader output must be identical with and without the native
    decoder."""
    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.dsec import DSECIndex
    from snn_object_detectionddp_tpu.data.pipeline import BatchLoader
    from snn_object_detectionddp_tpu.data.synthetic import make_dataset

    make_dataset(tmp_path, num_sequences=1, splits=("train",), num_frames=6,
                 height=48, width=64)
    cfg = Config()
    cfg.dataset.train.path = str(tmp_path / "train")
    cfg.dataset.train.seq_len = 3
    index = DSECIndex(cfg, "train")
    loader = BatchLoader(index, list(range(4)), batch_size=2, max_boxes=4)
    import os

    os.environ["SNN_TPU_NATIVE_DECODE"] = "1"
    try:
        batches_native = [b["images"].copy() for b in loader]
    finally:
        os.environ["SNN_TPU_NATIVE_DECODE"] = "0"
    batches_cv2 = [b["images"].copy() for b in loader]

    for a, b in zip(batches_native, batches_cv2):
        np.testing.assert_array_equal(a, b)
