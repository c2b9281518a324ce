import time

import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config
from snn_object_detectionddp_tpu.data.dsec import (
    DSECIndex,
    normalize_and_clip,
    process_tracks,
    train_val_split,
)
from snn_object_detectionddp_tpu.data.pipeline import BatchLoader, pad_labels
from snn_object_detectionddp_tpu.data.synthetic import TRACKS_DTYPE, make_dataset


def test_process_tracks_nearest_frame():
    """Golden test of nearest-timestamp alignment (reference dataset.py:68-74)."""
    frame_ts = np.array([1000, 2000, 3000], np.int64)
    tracks = np.array(
        [
            (999, 10.0, 20.0, 4.0, 6.0, 1, 1.0, 0),  # before frame 0 -> dropped
            # (quirk parity: reference assigns index -1, never retrieved)
            (1000, 10.0, 20.0, 4.0, 6.0, 1, 1.0, 0),  # exact -> frame 0
            (1501, 0.0, 0.0, 2.0, 2.0, 2, 1.0, 1),  # d(1000)=501 d(2000)=499 -> frame 1
            (1499, 0.0, 0.0, 2.0, 2.0, 0, 1.0, 2),  # -> frame 0
            (3000, 5.0, 5.0, 2.0, 2.0, 1, 1.0, 3),  # exact -> frame 2
            (9999, 1.0, 1.0, 2.0, 2.0, 1, 1.0, 4),  # beyond end -> clipped, frame 2
        ],
        dtype=TRACKS_DTYPE,
    )
    labels = process_tracks(tracks, frame_ts)
    assert sorted(labels) == [0, 1, 2]
    # Frame 0: detections at t=1000 and t=1499 (t=999 dropped).
    assert labels[0].shape == (2, 5)
    # Center conversion: x + w/2, y + h/2 (reference dataset.py:76-82).
    np.testing.assert_allclose(labels[0][0], [1.0, 12.0, 23.0, 4.0, 6.0])
    assert labels[1].shape == (1, 5)
    assert labels[2].shape == (2, 5)


def test_normalize_and_clip():
    # 100x200 image; one valid box, one zero-width, one out-of-bounds.
    labels = np.array(
        [
            [1.0, 100.0, 50.0, 50.0, 20.0],  # valid: cx .5, cy .5, w .25, h .2
            [0.0, 10.0, 10.0, 0.0, 5.0],  # zero-area -> dropped
            [2.0, 198.0, 50.0, 20.0, 10.0],  # clips at right edge
        ],
        np.float32,
    )
    out = normalize_and_clip(labels, img_h=100, img_w=200)
    assert out.shape[0] == 2
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0.5, 0.25, 0.2], atol=1e-6)
    # Clipped box: x1 = (198-10)/200 = .94, x2 = 1.0 -> cx .97, w .06
    np.testing.assert_allclose(out[1], [2.0, 0.97, 0.5, 0.06, 0.1], atol=1e-5)


def test_pad_labels():
    lab, mask = pad_labels(np.ones((2, 5), np.float32), 4)
    assert lab.shape == (4, 5) and mask.tolist() == [True, True, False, False]
    lab, mask = pad_labels(np.ones((9, 5), np.float32), 4)
    assert mask.all()


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec")
    make_dataset(root, num_sequences=3, num_frames=8, height=64, width=96)
    return root


def _config(root, seq_len=3, batch_size=2):
    cfg = Config()
    for split in ("train", "val", "test"):
        sc = cfg.dataset.split(split)
        sc.path = str(root / ("train" if split != "test" else "test"))
        sc.seq_len = seq_len
    cfg.training.batch_size = batch_size
    cfg.model.max_boxes = 8
    return cfg


def test_index_and_split(fixture_root):
    cfg = _config(fixture_root)
    index = DSECIndex(cfg, "train")
    # 3 sequences x (8 - 3 + 1) windows
    assert len(index) == 3 * 6
    tr, va = train_val_split(index)
    assert len(tr) + len(va) == len(index)
    assert len(va) == 6  # one sequence held out
    tr2, va2 = train_val_split(index)
    assert tr == tr2 and va == va2  # seeded determinism


def test_batch_loader_shapes(fixture_root):
    cfg = _config(fixture_root)
    index = DSECIndex(cfg, "train")
    loader = BatchLoader(
        index, list(range(len(index))), batch_size=4, max_boxes=8, num_threads=2
    )
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["images"].shape == (4, 3, 64, 96, 3)
    assert b["images"].dtype == np.uint8
    assert b["labels"].shape == (4, 8, 5)
    assert b["label_mask"].shape == (4, 8)
    assert b["label_mask"].sum() > 0  # synthetic objects exist
    # Normalized labels in range.
    lab = b["labels"][b["label_mask"]]
    assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1).all()
    # Final partial batch: 18 samples, bs 4 -> last batch has 2 real rows.
    last = batches[-1]
    assert last["sample_mask"].tolist() == [True, True, False, False]
    assert last["label_mask"][2:].sum() == 0


def test_abandoned_iterator_joins_producer(fixture_root):
    """Abandoning the generator (e.g. next(iter(loader)) or an early break)
    must stop + join the producer thread instead of leaving it blocked on
    q.put with prefetched decoded batches (advisor round-1 medium #1)."""
    import threading

    cfg = _config(fixture_root)
    index = DSECIndex(cfg, "train")
    loader = BatchLoader(
        index, list(range(len(index))), batch_size=2, num_threads=2, prefetch=2
    )
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # triggers GeneratorExit -> stop event -> join
    # No producer threads may survive the closes.
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_test_mode_returns_paths(fixture_root):
    cfg = _config(fixture_root)
    index = DSECIndex(cfg, "test")
    loader = BatchLoader(index, list(range(4)), batch_size=2, num_threads=1)
    b = next(iter(loader))
    assert "labels" not in b
    assert len(b["paths"]) == 2
    assert b["paths"][0].endswith(".png")


def test_loader_transform_hook(tmp_path):
    """BatchLoader(transform=...) applies a per-frame host transform at
    decode time (working form of the reference dataset's declared-but-
    unwired ``transform`` hook, reference dataset.py:8-20,148-149)."""
    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.dsec import DSECIndex
    from snn_object_detectionddp_tpu.data.pipeline import BatchLoader
    from snn_object_detectionddp_tpu.data.synthetic import make_dataset

    root = tmp_path / "dsec"
    make_dataset(root, num_sequences=2, splits=("train",), num_frames=8,
                 height=32, width=40, num_classes=2)
    cfg = Config()
    cfg.dataset.train.path = str(root / "train")
    cfg.dataset.train.seq_len = 2
    index = DSECIndex(cfg, "train")

    plain = next(iter(BatchLoader(index, [0], batch_size=1, max_boxes=4)))
    inverted = next(iter(BatchLoader(
        index, [0], batch_size=1, max_boxes=4,
        transform=lambda f: 255 - f,
    )))
    np.testing.assert_array_equal(
        inverted["images"][0, 0], 255 - plain["images"][0, 0]
    )
