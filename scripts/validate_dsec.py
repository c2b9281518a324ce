#!/usr/bin/env python
"""Validate a real DSEC-Det directory tree against this repo's expectations.

One command to answer "can I point config.yaml at this tree and train?":

    python scripts/validate_dsec.py <root> [--seq-len 5] [--num-classes 3]
    python scripts/validate_dsec.py <root> --mode test   # tracks.npy optional
    python scripts/validate_dsec.py --parity             # print the mAP
                                                         # parity protocol

Checks every sequence directory for the exact layout DSECIndex consumes
(data/dsec.py; reference layout contract: dataset.py:28-48):

    <root>/<seq>/images/left/distorted/*.png      frames (PNG, same geometry)
    <root>/<seq>/images/timestamps.txt            int64 us, first column,
                                                  one row per frame,
                                                  non-decreasing
    <root>/<seq>/object_detections/left/tracks.npy
                                                  Prophesee structured array
                                                  with fields t,x,y,w,h,
                                                  class_id (train/val
                                                  required; test optional)

Exit code 0 = the tree will index; 1 = at least one sequence is broken
(each problem is reported with the fix). This host has no egress, so there
is no --download mode; --urls prints where to get DSEC-Det.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REQUIRED_TRACK_FIELDS = ("t", "x", "y", "w", "h", "class_id")

PARITY_PROTOCOL = """\
Reproducing mAP parity vs the reference (matched seeds, identical split)
========================================================================
Both code bases carve the SAME val split out of the train tree: a
sequence-level 80/20 sklearn train_test_split with random_state=42 over
the sorted sequence-directory list (this repo: data/dsec.py::
train_val_split; reference: main.py:16-27). Matching therefore requires
only (a) the same train tree, (b) the same seed (training.seed: 42), and
(c) the same seq_len.

1. Validate the tree:        python scripts/validate_dsec.py /data/dsec/train
2. Point both configs at it: dataset.train.path: /data/dsec/train
                             dataset.train.seq_len: 5
                             training.seed: 42
                             model.num_classes: <N for your tracks.npy>
3. Train this repo:          python main.py --config config.yaml
   Train the reference:      python main.py      (mode: "train")
4. Evaluate this repo:       python eval_2.py --config config.yaml
   Evaluate the reference:   python eval_2.py    (after fixing its two
   crashes: the 3-arg get_train_val_split call and loading
   ckpt["model_state_dict"] instead of the raw dict — reference
   eval_2.py:41,49; SURVEY section 2.7)
5. Both evals run NMS at conf=0.001 iou=0.6 max_det=300 and report the
   mAP50 / mAP50-95 family on the identical seeded val split
   (this repo: evals/validator.py; reference: eval_2.py:63-112).

Caveats for honest comparison:
- This build trains its spiking backbone from scratch; the reference uses
  frozen COCO-pretrained YOLO11m features (model.py:74-98). Expect the
  reference to converge in fewer epochs; use model.backbone_init to
  fine-tune from a prior run of this repo.
- mAP implementations: this repo's evals/map.py is cross-validated
  against a clean-room COCO oracle, a hand-derived exact golden fixture
  (tests/test_map_golden.py — executes everywhere), and (where
  installed) pycocotools (tests/test_map_oracle.py); the reference uses
  ultralytics DetMetrics. Residual implementation skew is sub-point at
  matched inputs.
"""

DSEC_URLS = """\
DSEC-Det download (no egress on this host -- fetch elsewhere):
  https://dsec.ifi.uzh.ch/dsec-detection/   (images + object_detections)
Unpack so each sequence directory contains images/left/distorted/,
images/timestamps.txt and object_detections/left/tracks.npy, e.g.
  <root>/zurich_city_13_a/images/left/distorted/000000.png
  <root>/zurich_city_13_a/images/timestamps.txt
  <root>/zurich_city_13_a/object_detections/left/tracks.npy
Then run:  python scripts/validate_dsec.py <root>
"""


def _err(msgs: list[str], seq: str, problem: str, fix: str) -> None:
    msgs.append(f"  ERROR [{seq}] {problem}\n         fix: {fix}")


def validate_sequence(
    seq_path: Path,
    seq_len: int,
    num_classes: int | None,
    mode: str,
    geometry: list,
    decode_check: bool,
) -> tuple[int, list[str], list[str]]:
    """Returns (num_samples, errors, warnings) for one sequence dir."""
    errors: list[str] = []
    warnings: list[str] = []
    seq = seq_path.name

    image_dir = seq_path / "images/left/distorted"
    if not image_dir.is_dir():
        alt = seq_path / "images/left/rectified"
        hint = (
            "this tree has images/left/rectified -- DSECIndex reads the "
            "distorted stream (reference: dataset.py:31); symlink or "
            "re-extract the distorted images"
            if alt.is_dir()
            else "expected <seq>/images/left/distorted/ with the PNG frames"
        )
        _err(errors, seq, f"missing {image_dir.relative_to(seq_path)}", hint)
        return 0, errors, warnings

    pngs = sorted(image_dir.glob("*.png"))
    if not pngs:
        _err(
            errors, seq, "images/left/distorted contains no *.png",
            "DSEC frames are PNG; check the extraction",
        )
        return 0, errors, warnings

    ts_path = seq_path / "images/timestamps.txt"
    if not ts_path.is_file():
        _err(
            errors, seq, "missing images/timestamps.txt",
            "microsecond int64 timestamps, one row per frame, first column "
            "(reference: dataset.py:35)",
        )
        return 0, errors, warnings
    try:
        ts = np.loadtxt(ts_path, usecols=0, dtype=np.int64, ndmin=1)
    except (ValueError, OverflowError) as e:
        _err(
            errors, seq, f"timestamps.txt does not parse as int64: {e}",
            "first whitespace-separated column must be integer microseconds",
        )
        return 0, errors, warnings
    if len(ts) != len(pngs):
        _err(
            errors, seq,
            f"{len(pngs)} PNG frames but {len(ts)} timestamp rows",
            "timestamps.txt must have exactly one row per frame "
            "(label alignment indexes frames by timestamp row)",
        )
    if len(ts) > 1 and np.any(np.diff(ts) < 0):
        bad = int(np.argmax(np.diff(ts) < 0))
        _err(
            errors, seq,
            f"timestamps decrease at row {bad + 1}",
            "nearest-frame label alignment requires non-decreasing "
            "timestamps (np.searchsorted contract, data/dsec.py)",
        )

    tracks_path = seq_path / "object_detections/left/tracks.npy"
    if not tracks_path.is_file():
        if mode in ("train", "val"):
            _err(
                errors, seq, "missing object_detections/left/tracks.npy",
                "train/val splits require labels (reference: dataset.py:53); "
                "for an unlabeled test split pass --mode test",
            )
        else:
            warnings.append(
                f"  note [{seq}] no tracks.npy -- test split indexes fine, "
                "but the legacy benchmark reports no quality metrics"
            )
    else:
        try:
            tracks = np.load(tracks_path)
        except (ValueError, OSError) as e:
            _err(
                errors, seq, f"tracks.npy does not load: {e}",
                "must be a Prophesee structured numpy array",
            )
            tracks = None
        if tracks is not None:
            names = tracks.dtype.names or ()
            missing = [f for f in REQUIRED_TRACK_FIELDS if f not in names]
            if missing:
                _err(
                    errors, seq,
                    f"tracks.npy lacks fields {missing} (has {list(names)})",
                    "expected the Prophesee schema "
                    "t,x,y,w,h,class_id[,class_confidence,track_id]",
                )
            elif len(tracks) and len(ts):
                t = tracks["t"].astype(np.int64)
                # Timestamp-base mismatches (s vs us, or a different zero)
                # silently dump every label onto the first/last frame.
                span = ts[-1] - ts[0]
                if span > 0 and (
                    t.max() < ts[0] - span or t.min() > ts[-1] + span
                ):
                    _err(
                        errors, seq,
                        f"tracks t-range [{t.min()}, {t.max()}] is disjoint "
                        f"from frame timestamps [{ts[0]}, {ts[-1]}]",
                        "tracks.npy and timestamps.txt must share the same "
                        "microsecond time base",
                    )
                before = int((t < ts[0]).sum())
                if before:
                    warnings.append(
                        f"  note [{seq}] {before} detections timestamped "
                        "before the first frame are dropped (reference "
                        "quirk parity, dataset.py:74)"
                    )
                if num_classes is not None:
                    cmax = int(tracks["class_id"].max())
                    if cmax >= num_classes:
                        _err(
                            errors, seq,
                            f"tracks class_id max {cmax} >= "
                            f"model.num_classes {num_classes}",
                            f"set model.num_classes >= {cmax + 1}",
                        )

    if decode_check and not errors:
        try:
            import cv2

            img = cv2.imread(str(pngs[0]))
            if img is None:
                raise ValueError("cv2.imread returned None")
            hw = (img.shape[0], img.shape[1])
            if geometry and geometry[0] != hw:
                _err(
                    errors, seq,
                    f"frame geometry {hw} differs from "
                    f"{geometry[0]} seen earlier",
                    "all sequences of a split must share one geometry "
                    "(fixed-shape batching); split differing trees",
                )
            elif not geometry:
                geometry.append(hw)
        except ImportError:
            warnings.append("  note: cv2 unavailable; skipped decode check")

    n = max(0, len(pngs) - seq_len + 1)
    if len(pngs) < seq_len:
        warnings.append(
            f"  note [{seq}] only {len(pngs)} frames < seq_len {seq_len}: "
            "sequence contributes zero samples"
        )
    return n, errors, warnings


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("root", nargs="?", help="split directory (e.g. .../train)")
    ap.add_argument("--seq-len", type=int, default=5)
    ap.add_argument("--num-classes", type=int, default=None)
    ap.add_argument(
        "--mode", default="train", choices=("train", "val", "test"),
        help="test makes tracks.npy optional (reference: dataset.py:226-228)",
    )
    ap.add_argument(
        "--no-decode", action="store_true", help="skip the PNG decode check"
    )
    ap.add_argument(
        "--parity", action="store_true",
        help="print the matched-seed mAP parity protocol and exit",
    )
    ap.add_argument(
        "--urls", action="store_true",
        help="print DSEC-Det download locations and exit",
    )
    args = ap.parse_args()

    if args.parity:
        print(PARITY_PROTOCOL)
        return 0
    if args.urls:
        print(DSEC_URLS)
        return 0
    if not args.root:
        ap.error("root is required (or use --parity / --urls)")

    root = Path(args.root)
    if not root.is_dir():
        print(f"ERROR: '{root}' is not a directory")
        return 1
    seq_dirs = sorted(d for d in root.iterdir() if d.is_dir())
    if not seq_dirs:
        print(
            f"ERROR: '{root}' contains no sequence directories "
            "(expected <root>/<seq>/images/left/distorted/...)"
        )
        return 1

    total_samples = 0
    total_errors = 0
    geometry: list = []
    for seq_path in seq_dirs:
        n, errors, warnings = validate_sequence(
            seq_path, args.seq_len, args.num_classes, args.mode,
            geometry, not args.no_decode,
        )
        status = "FAIL" if errors else "ok"
        print(f"[{status}] {seq_path.name}: {n} samples @ seq_len={args.seq_len}")
        for m in errors + warnings:
            print(m)
        total_samples += 0 if errors else n
        total_errors += len(errors)

    print()
    if total_errors:
        print(
            f"FAILED: {total_errors} problem(s) across {len(seq_dirs)} "
            "sequences -- fix the errors above and re-run."
        )
        return 1
    geo = f", geometry {geometry[0]}" if geometry else ""
    print(
        f"OK: {len(seq_dirs)} sequences, {total_samples} sliding-window "
        f"samples at seq_len={args.seq_len}{geo}. Point "
        f"dataset.{args.mode}.path at '{root}' and train. "
        "For the mAP-parity protocol: scripts/validate_dsec.py --parity"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
