"""DSEC dataset indexing and label alignment.

Host-side counterpart of the reference's ``DSECDataset``
(reference: dataset.py:7-228), with identical data contracts:

- scans ``<root>/<seq>/images/left/distorted/*.png`` per sequence dir and
  ``images/timestamps.txt`` (microseconds, int64, first column)
  (reference: dataset.py:28-36);
- loads Prophesee structured ``object_detections/left/tracks.npy`` and
  assigns each detection to its *nearest-timestamp* frame via searchsorted
  with a before/after comparison (reference: dataset.py:53-89);
- converts top-left (x, y, w, h) to center form in pixels
  (reference: dataset.py:76-82);
- builds one sliding-window sample per run of ``seq_len`` consecutive
  frames (reference: dataset.py:45-48);
- per-sample labels for the *last* frame only: filter zero-area, normalize
  by image dims, clip to [0, 1] via a cxcywh->xyxy->cxcywh round trip,
  re-filter (reference: dataset.py:157-225);
- sequence-level 80/20 train/val split seeded with 42
  (reference: main.py:16-27, sklearn train_test_split);
- debug truncation: first 100 train / 20 val / 600 test samples
  (reference: main.py:29-45, 78-89).

Unlike the reference this class does no tensor work — decoding and
batching live in :mod:`.pipeline` so the index stays cheap and picklable.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class Sample:
    image_dir: str
    filenames: tuple[str, ...]  # all frame filenames of the sequence
    start: int  # window start index
    seq_len: int

    @property
    def frame_paths(self) -> list[str]:
        return [
            str(Path(self.image_dir) / self.filenames[self.start + i])
            for i in range(self.seq_len)
        ]

    @property
    def last_frame_path(self) -> str:
        return str(
            Path(self.image_dir) / self.filenames[self.start + self.seq_len - 1]
        )

    @property
    def last_frame_index(self) -> int:
        return self.start + self.seq_len - 1


def process_tracks(
    tracks: np.ndarray, frame_timestamps: np.ndarray
) -> dict[int, np.ndarray]:
    """Nearest-frame label alignment (reference: dataset.py:53-89).

    Returns {frame_idx: (N, 5) float32 [class_id, cx, cy, w, h] in pixels}.
    """
    detection_ts = tracks["t"].astype(np.int64)
    indices = np.searchsorted(frame_timestamps, detection_ts, side="left")
    indices = np.clip(indices, 0, len(frame_timestamps) - 1)
    ts_before = frame_timestamps[np.maximum(0, indices - 1)]
    ts_after = frame_timestamps[indices]
    final = indices - (detection_ts - ts_before < ts_after - detection_ts)

    boxes = np.stack(
        [
            tracks["class_id"].astype(np.float32),
            tracks["x"].astype(np.float32) + tracks["w"].astype(np.float32) / 2.0,
            tracks["y"].astype(np.float32) + tracks["h"].astype(np.float32) / 2.0,
            tracks["w"].astype(np.float32),
            tracks["h"].astype(np.float32),
        ],
        axis=1,
    )
    labels: dict[int, list] = {}
    for i, fidx in enumerate(final):
        # Quirk parity: a detection timestamped before the first frame gets
        # index -1 in the reference (dataset.py:74 underflows) and is never
        # retrieved; we drop it explicitly — same observable behavior.
        if fidx < 0:
            continue
        labels.setdefault(int(fidx), []).append(boxes[i])
    return {k: np.stack(v).astype(np.float32) for k, v in labels.items()}


def normalize_and_clip(labels_px: np.ndarray, img_h: int, img_w: int) -> np.ndarray:
    """(N, 5) [class, cx, cy, w, h] pixels -> normalized, clipped, filtered.

    Exact semantics of the reference's per-sample label path
    (reference: dataset.py:162-219): first-pass zero-area filter, normalize
    by image dims, clip through an xyxy round trip, re-filter.
    """
    arr = labels_px.astype(np.float32).copy()
    arr = arr[(arr[:, 3] > 0) & (arr[:, 4] > 0)]
    if arr.shape[0] == 0:
        return np.zeros((0, 5), np.float32)
    arr[:, 1] /= img_w
    arr[:, 2] /= img_h
    arr[:, 3] /= img_w
    arr[:, 4] /= img_h
    cx, cy, w, h = arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
    x1 = np.clip(cx - w / 2, 0, 1)
    y1 = np.clip(cy - h / 2, 0, 1)
    x2 = np.clip(cx + w / 2, 0, 1)
    y2 = np.clip(cy + h / 2, 0, 1)
    arr[:, 1] = (x1 + x2) / 2
    arr[:, 2] = (y1 + y2) / 2
    arr[:, 3] = x2 - x1
    arr[:, 4] = y2 - y1
    arr = arr[(arr[:, 3] > 0) & (arr[:, 4] > 0)]
    return arr if arr.shape[0] else np.zeros((0, 5), np.float32)


class DSECIndex:
    """Sliding-window index over a DSEC split directory."""

    def __init__(self, config, mode: str = "train"):
        if mode not in ("train", "val", "test"):
            raise ValueError(
                f"Invalid mode '{mode}'. Choose from 'train', 'val', or 'test'."
            )
        self.mode = mode
        split_cfg = config.dataset.split(mode)
        self.seq_len = split_cfg.seq_len
        root = Path(split_cfg.path)

        self.samples: list[Sample] = []
        self.labels: dict[str, dict[int, np.ndarray]] = {}

        for seq_path in sorted(d for d in root.iterdir() if d.is_dir()):
            image_dir = seq_path / "images/left/distorted"
            image_files = sorted(image_dir.glob("*.png"))
            num_images = len(image_files)
            frame_ts = np.loadtxt(
                seq_path / "images/timestamps.txt", usecols=0, dtype=np.int64
            )
            tracks_path = seq_path / "object_detections/left/tracks.npy"
            if self.mode in ("train", "val"):
                tracks = np.load(tracks_path)
                self.labels[str(image_dir)] = process_tracks(tracks, frame_ts)
            elif tracks_path.exists():
                # Test split: GT is optional (the reference's test mode never
                # loads labels, dataset.py:226-228, but its legacy benchmark
                # scores against tracks.npy when present, utils.py:21-82,
                # 594-637) — index it so evals/legacy.py can report
                # avg-IoU / precision@0.5 quality metrics.
                self.labels[str(image_dir)] = process_tracks(
                    np.load(tracks_path), frame_ts
                )
            if num_images >= self.seq_len:
                names = tuple(f.name for f in image_files)
                for i in range(num_images - self.seq_len + 1):
                    self.samples.append(
                        Sample(str(image_dir), names, i, self.seq_len)
                    )
        print(f"Dataset initialized with {len(self.samples)} total sequences.")

    def __len__(self) -> int:
        return len(self.samples)

    def sample_labels(self, idx: int, img_h: int, img_w: int) -> np.ndarray:
        """Normalized (N, 5) labels of the window's last frame."""
        s = self.samples[idx]
        per_frame = self.labels.get(s.image_dir, {})
        raw = per_frame.get(s.last_frame_index)
        if raw is None or raw.shape[0] == 0:
            return np.zeros((0, 5), np.float32)
        return normalize_and_clip(raw, img_h, img_w)


def train_val_split(
    index: DSECIndex, test_size: float = 0.2, seed: int = 42
) -> tuple[list[int], list[int]]:
    """Sequence-level 80/20 split (reference: main.py:16-27): group sample
    indices by sequence dir, split *sequences* with sklearn's seeded
    shuffle, then expand back to sample indices in scan order."""
    from sklearn.model_selection import train_test_split

    seq_groups: dict[str, list[int]] = {}
    for idx, s in enumerate(index.samples):
        seq_groups.setdefault(s.image_dir, []).append(idx)
    train_seqs, val_seqs = train_test_split(
        list(seq_groups), test_size=test_size, random_state=seed
    )
    train_set = set(train_seqs)
    train_idx: list[int] = []
    val_idx: list[int] = []
    for seq, indices in seq_groups.items():
        (train_idx if seq in train_set else val_idx).extend(indices)
    return train_idx, val_idx


def apply_train_debug(
    train_idx: list[int], val_idx: list[int], enabled: bool
) -> tuple[list[int], list[int]]:
    """First 100 train / 20 val samples (reference: main.py:29-45)."""
    if not enabled:
        return train_idx, val_idx
    print("DEBUG MODE: Using a smaller subset for quick iterations.")
    return train_idx[:100], val_idx[:20]


def apply_test_debug(indices: list[int], enabled: bool) -> list[int]:
    """First <=600 test samples (reference: main.py:78-89)."""
    if not enabled:
        return indices
    print("DEBUG MODE: Using a smaller subset for quick iterations.")
    return indices[: min(600, len(indices))]
