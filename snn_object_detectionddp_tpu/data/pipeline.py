"""Fixed-shape host input pipeline: decode -> pad -> batch -> prefetch.

Replaces the reference's ``DataLoader(num_workers=4)`` + ragged
``custom_collate_fn`` (reference: main.py:57-72, train.py:10-44) with a
TPU-friendly contract:

- images:  (B, T, H, W, 3) uint8, decoded by a thread pool (cv2 releases
  the GIL) — normalization/resize/spike-encoding happen on device in a
  fused jit stage (:mod:`.encoding`), per the north star;
- labels:  (B, M, 5) float32 [class, cx, cy, w, h] normalized, zero-padded;
- label_mask: (B, M) bool — the fixed-shape replacement for the ragged
  (sum N, 6) batch-index format;
- sample_mask: (B,) bool — False on padding rows of a final partial batch
  (the reference keeps partial batches; we pad them to shape instead).

A background thread assembles batches ahead of consumption (depth
``prefetch``) so host decode overlaps device compute.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import cv2
import numpy as np

from . import native
from .dsec import DSECIndex


def _use_native() -> bool:
    return os.environ.get("SNN_TPU_NATIVE_DECODE", "0") == "1"


def pad_labels(labels: np.ndarray, max_boxes: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, 5) -> ((M, 5) zero-padded, (M,) bool mask). Overflow truncates."""
    out = np.zeros((max_boxes, 5), np.float32)
    mask = np.zeros((max_boxes,), bool)
    n = min(labels.shape[0], max_boxes)
    if n:
        out[:n] = labels[:n]
        mask[:n] = True
    return out, mask


def _decode_frame(path: str) -> np.ndarray:
    img = cv2.imread(path)  # BGR HWC uint8
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1]  # BGR -> RGB (reference: dataset.py:146)


class BatchLoader:
    """Iterates fixed-shape batches over a list of sample indices.

    Yields dicts: images (B,T,H,W,3) uint8, labels (B,M,5) f32,
    label_mask (B,M) bool, sample_mask (B,) bool, and (test mode)
    'paths': list of last-frame paths.
    """

    def __init__(
        self,
        index: DSECIndex,
        indices: list[int],
        batch_size: int,
        max_boxes: int = 64,
        shuffle: bool = False,
        seed: int = 42,
        num_threads: int = 4,
        prefetch: int = 2,
        drop_last: bool = False,
        transform=None,
    ):
        # ``transform``: optional per-frame callable (H,W,3) uint8 ->
        # (H,W,3) uint8 applied at decode time on the host — the working
        # form of the reference dataset's (declared but never wired)
        # ``transform`` hook, reference dataset.py:8-20,148-149. Geometry
        # must be preserved (labels are not re-derived).
        self.transform = transform
        self.index = index
        self.indices = list(indices)
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # ------------------------------------------------------------------
    def _load_sample(self, idx: int):
        s = self.index.samples[idx]
        frames = [_decode_frame(p) for p in s.frame_paths]
        if self.transform is not None:
            frames = [self.transform(f) for f in frames]
        img_h, img_w = frames[-1].shape[:2]
        images = np.stack(frames)  # (T, H, W, 3) uint8
        if self.index.mode in ("train", "val"):
            labels = self.index.sample_labels(idx, img_h, img_w)
            lab, mask = pad_labels(labels, self.max_boxes)
            return images, lab, mask, s.last_frame_path
        return images, None, None, s.last_frame_path

    def _decode_native(self, batch_indices: list[int]):
        """Whole-batch decode through the C++ thread-pool loader (one call
        for all B*T frames; RGB directly, no BGR pass)."""
        samples = [self.index.samples[i] for i in batch_indices]
        all_paths = [p for s in samples for p in s.frame_paths]
        h, w = native.png_shape(all_paths[0])
        flat = native.decode_batch(all_paths, h, w, self.num_threads)
        t = samples[0].seq_len
        images = flat.reshape(len(samples), t, h, w, 3)
        if self.transform is not None:
            images = np.stack([
                np.stack([self.transform(f) for f in seq]) for seq in images
            ])
        results = []
        for i, (s, idx) in enumerate(zip(samples, batch_indices)):
            if self.index.mode in ("train", "val"):
                lab, mask = pad_labels(
                    self.index.sample_labels(idx, h, w), self.max_boxes
                )
                results.append((images[i], lab, mask, s.last_frame_path))
            else:
                results.append((images[i], None, None, s.last_frame_path))
        return results

    def _make_batch(self, batch_indices: list[int], pool: ThreadPoolExecutor):
        # The C++ loader is opt-in (SNN_TPU_NATIVE_DECODE=1): on this host
        # cv2's SIMD-tuned PNG decode outperforms libpng ~3.5x on a single
        # core, so cv2 threads are the default. Both paths are bit-identical
        # (tests/test_native.py).
        if _use_native() and native.available():
            try:
                results = self._decode_native(batch_indices)
            except Exception:
                results = list(pool.map(self._load_sample, batch_indices))
        else:
            results = list(pool.map(self._load_sample, batch_indices))
        b = len(results)
        bs = self.batch_size
        images = np.stack([r[0] for r in results])
        sample_mask = np.zeros((bs,), bool)
        sample_mask[:b] = True
        if b < bs:  # pad a final partial batch to fixed shape
            pad = np.repeat(images[-1:], bs - b, axis=0)
            images = np.concatenate([images, pad], axis=0)
        batch = {
            "images": images,
            "sample_mask": sample_mask,
            "paths": [r[3] for r in results],
        }
        if self.index.mode in ("train", "val"):
            labels = np.stack([r[1] for r in results])
            masks = np.stack([r[2] for r in results])
            if b < bs:
                labels = np.concatenate(
                    [labels, np.zeros((bs - b,) + labels.shape[1:], np.float32)]
                )
                masks = np.concatenate([masks, np.zeros((bs - b,) + masks.shape[1:], bool)])
            batch["labels"] = labels
            batch["label_mask"] = masks & sample_mask[:, None]
        return batch

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[dict]:
        order = np.array(self.indices)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        steps = len(self)
        chunks = [
            list(order[i * self.batch_size : (i + 1) * self.batch_size])
            for i in range(steps)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put: gives up when the consumer has abandoned the
            # generator (GeneratorExit sets `stop`), so the producer thread
            # and its decoded batches never leak (early `break` from a
            # training loop, `next(iter(loader))`, etc.).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
                try:
                    for chunk in chunks:
                        if stop.is_set():
                            break
                        if not _put(self._make_batch([int(i) for i in chunk], pool)):
                            break
                except Exception as e:  # surface decode errors to consumer
                    _put(e)
                finally:
                    _put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            thread.join()
