"""Generate the 'hard' synthetic DSEC fixtures (VERDICT r4 next #2).

Two trees, same generator (data/synthetic.py::make_sequence_hard):

- runs/hard/dsec/{train,test} — FLAGSHIP geometry (480x640): 30 train
  sequences x 24 frames (-> 480 train samples after the seeded 80/20
  sequence split at seq_len=5) + 8 test sequences. Drives the
  flagship-scale quality demonstration and the backbone-transfer A/B.
- fixtures/hard_nano/{train,test} — nano geometry (128x160): the cheap
  bench-quality fixture. bench.py regenerates this tree deterministically
  (same seeds) and evaluates the committed nano checkpoint on its test
  split, so `fixture_map50_95` moves when the model/loss/NMS/mAP stack
  regresses.

Both idempotent via a .fixture_done marker. Reference layout contract:
dataset.py:28-48.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from snn_object_detectionddp_tpu.data.synthetic import make_sequence_hard

REPO = Path(__file__).resolve().parents[1]


def make_hard_flagship(root: Path | None = None) -> Path:
    root = root or REPO / "runs/hard/dsec"
    done = root / ".fixture_done"
    if done.exists():
        return root
    for i in range(30):
        make_sequence_hard(
            root / "train" / f"seq_{i:02d}",
            num_frames=24, height=480, width=640,
            num_objects=4, num_classes=3, seed=3000 + i,
        )
        print(f"train seq_{i:02d}", flush=True)
    for i in range(8):
        make_sequence_hard(
            root / "test" / f"seq_{i:02d}",
            num_frames=24, height=480, width=640,
            num_objects=4, num_classes=3, seed=7000 + i,
        )
        print(f"test seq_{i:02d}", flush=True)
    done.touch()
    return root


def make_hard_nano(root: Path | None = None) -> Path:
    # Tuning (round-5, measured): v1 at 16 seqs / 4%-min objects / noise 6
    # trained to mAP 0.0 — too few sequences to generalize across the
    # per-sequence background/distractor diversity, and 5 px objects
    # starve the TAL bootstrap (data/synthetic.py docstring). 40 seqs,
    # 7-20% objects, noise 4, jitter 0.85-1.15 lands the committed nano
    # checkpoint below ceiling but well off zero — the discriminating
    # regime the bench metric needs.
    root = root or REPO / "fixtures/hard_nano"
    done = root / ".fixture_done"
    if done.exists():
        return root
    for i in range(40):
        make_sequence_hard(
            root / "train" / f"seq_{i:02d}",
            num_frames=16, height=128, width=160,
            num_objects=4, num_classes=3, seed=5000 + i,
            min_scale=0.07, max_scale=0.20, noise=4.0, jitter=(0.85, 1.15),
        )
    for i in range(6):
        make_sequence_hard(
            root / "test" / f"seq_{i:02d}",
            num_frames=16, height=128, width=160,
            num_objects=4, num_classes=3, seed=8000 + i,
            min_scale=0.07, max_scale=0.20, noise=4.0, jitter=(0.85, 1.15),
        )
    done.touch()
    return root


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "nano"):
        print(f"nano fixture at {make_hard_nano()}")
    if which in ("both", "flagship"):
        print(f"flagship fixture at {make_hard_flagship()}")
