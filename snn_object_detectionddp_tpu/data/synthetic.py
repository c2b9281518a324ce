"""Synthetic DSEC-shaped dataset fixture.

Generates the exact on-disk layout the reference consumes
(reference: dataset.py:28-48):

    <root>/<sequence>/images/left/distorted/*.png      (frames)
    <root>/<sequence>/images/timestamps.txt            (us, int64, col 0)
    <root>/<sequence>/object_detections/left/tracks.npy (Prophesee structured)

with moving rectangles as "objects" so that detection training has real
signal. Used by tests and benchmarks since no DSEC download exists on this
machine (SURVEY §4, §7 minimum slice).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

# Prophesee GEN1-style structured dtype (fields per reference dataset.py:76-82).
TRACKS_DTYPE = np.dtype(
    [
        ("t", "<u8"),
        ("x", "<f4"),
        ("y", "<f4"),
        ("w", "<f4"),
        ("h", "<f4"),
        ("class_id", "u1"),
        ("class_confidence", "<f4"),
        ("track_id", "<u4"),
    ]
)


def make_sequence(
    seq_dir: Path,
    num_frames: int = 12,
    height: int = 96,
    width: int = 128,
    num_objects: int = 2,
    num_classes: int = 3,
    seed: int = 0,
    frame_dt_us: int = 50_000,
    obj_size: tuple[int, int] | None = None,
) -> None:
    """``obj_size``: (min, max) object side length in pixels. Defaults to
    ~10-22% of the short image side — DSEC-like vehicle scale at any
    resolution. Fixed tiny sizes at high resolution starve the TAL
    assigner's bootstrap: its alignment metric is score^0.5 * CIoU^6
    (ultralytics semantics, losses/tal.py), and against the DFL head's
    ~15x15-grid-unit initial boxes a 20 px ground truth has CIoU ~0.03,
    so 0.03^6 underflows the assigner's 1e-9 eps and box/dfl loss is
    exactly zero forever (observed; the reference would behave the same).
    """
    rng = np.random.RandomState(seed)
    img_dir = seq_dir / "images/left/distorted"
    img_dir.mkdir(parents=True, exist_ok=True)
    det_dir = seq_dir / "object_detections/left"
    det_dir.mkdir(parents=True, exist_ok=True)

    t0 = 1_000_000
    timestamps = t0 + np.arange(num_frames, dtype=np.int64) * frame_dt_us

    if obj_size is None:
        short = min(height, width)
        obj_size = (max(8, int(0.10 * short)), max(12, int(0.22 * short)))

    # Object trajectories: constant-velocity rectangles.
    margin = obj_size[1] + 12
    obj_xy = rng.uniform(
        [8, 8], [max(9, width - margin), max(9, height - margin)],
        size=(num_objects, 2),
    )
    obj_v = rng.uniform(-3, 3, size=(num_objects, 2))
    obj_wh = rng.uniform(obj_size[0], obj_size[1], size=(num_objects, 2))
    obj_cls = rng.randint(0, num_classes, size=num_objects)

    records = []
    for f in range(num_frames):
        img = np.full((height, width, 3), 30, np.uint8)
        img += rng.randint(0, 20, size=img.shape, dtype=np.uint8)
        for o in range(num_objects):
            x, y = obj_xy[o] + obj_v[o] * f
            w, h = obj_wh[o]
            x1, y1 = int(max(0, x)), int(max(0, y))
            x2 = int(min(width - 1, x + w))
            y2 = int(min(height - 1, y + h))
            if x2 <= x1 or y2 <= y1:
                continue
            color = [(200, 60, 60), (60, 200, 60), (60, 60, 200)][obj_cls[o] % 3]
            cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
            # Detection timestamp jittered a little around the frame time
            # (exercises nearest-timestamp alignment, reference dataset.py:68-74).
            det_t = int(timestamps[f] + rng.randint(-5000, 5000))
            records.append(
                (max(det_t, 0), x, y, w, h, obj_cls[o], 1.0, o)
            )
        cv2.imwrite(str(img_dir / f"{f:06d}.png"), img[:, :, ::-1])  # RGB->BGR

    np.savetxt(
        seq_dir / "images/timestamps.txt",
        np.stack([timestamps, timestamps], axis=1),
        fmt="%d",
    )
    tracks = np.array(records, dtype=TRACKS_DTYPE)
    tracks = np.sort(tracks, order="t")
    np.save(det_dir / "tracks.npy", tracks)


def make_dataset(
    root: Path | str,
    num_sequences: int = 3,
    splits: tuple[str, ...] = ("train", "test"),
    **kwargs,
) -> Path:
    """Build <root>/{split}/{seq_xx}/... Returns the root path."""
    root = Path(root)
    for split in splits:
        for i in range(num_sequences):
            make_sequence(
                root / split / f"seq_{i:02d}", seed=i + 100 * len(split), **kwargs
            )
    return root
