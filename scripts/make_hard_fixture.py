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
    # Parameters incorporate the nano tuning lessons (below): enough
    # sequence diversity to generalize across unseen textures, object
    # sizes clear of the TAL bootstrap dead zone (5-22%% of 480 = 24-106
    # px), moderate photometric jitter. 40 train seqs x 24 frames at
    # seq_len 5 -> 32 seqs / 640 samples in the seeded train split
    # (40 steps/epoch at batch 16).
    root = root or REPO / "runs/hard/dsec"
    done = root / ".fixture_done"
    if done.exists():
        return root
    for i in range(40):
        make_sequence_hard(
            root / "train" / f"seq_{i:02d}",
            num_frames=24, height=480, width=640,
            num_objects=4, num_classes=3, seed=3000 + i,
            min_scale=0.05, max_scale=0.22, noise=4.0,
            jitter=(0.85, 1.15),
        )
        print(f"train seq_{i:02d}", flush=True)
    for i in range(8):
        make_sequence_hard(
            root / "test" / f"seq_{i:02d}",
            num_frames=24, height=480, width=640,
            num_objects=4, num_classes=3, seed=7000 + i,
            min_scale=0.05, max_scale=0.22, noise=4.0,
            jitter=(0.85, 1.15),
        )
        print(f"test seq_{i:02d}", flush=True)
    done.touch()
    return root


def make_hard_nano(root: Path | None = None) -> Path:
    # Tuning (round-5, measured). v1: 16 seqs / 4%-min objects / noise 6
    # -> mAP 0.0 (too few sequences to generalize; 5 px objects starve
    # the TAL bootstrap). v2: 40 seqs / 7-20% objects -> training
    # COLLAPSED to the all-background equilibrium (eval loss 0.0008, zero
    # positive predictions): at 128x160 even 9-26 px objects underflow
    # the assigner's score^0.5 * CIoU^6 metric against the DFL head's
    # initial boxes — the documented TAL bootstrap dead zone
    # (data/synthetic.py docstring; the reference's assigner behaves the
    # same). v3: 10-25% objects (13-32 px) bootstrap reliably while the
    # texture/distractor/occlusion/shape-class difficulty keeps the
    # score below ceiling — the discriminating regime the bench metric
    # needs. v3 (40 seqs, 10-25%, noise 5): trained to val mAP50 0.13 /
    # mAP50-95 0.044 — discriminating but floor-compressed. v4 (final):
    # 80 seqs for background-generalization headroom, noise 3,
    # jitter 0.9-1.1, 4 distractors — difficulty now dominated by the
    # shape-coded classes, occlusion, and unseen textures.
    root = root or REPO / "fixtures/hard_nano"
    done = root / ".fixture_done"
    if done.exists():
        return root
    for i in range(80):
        make_sequence_hard(
            root / "train" / f"seq_{i:02d}",
            num_frames=16, height=128, width=160,
            num_objects=4, num_classes=3, seed=5000 + i,
            min_scale=0.10, max_scale=0.28, noise=3.0,
            jitter=(0.90, 1.10), num_distractors=4,
        )
    for i in range(6):
        make_sequence_hard(
            root / "test" / f"seq_{i:02d}",
            num_frames=16, height=128, width=160,
            num_objects=4, num_classes=3, seed=8000 + i,
            min_scale=0.10, max_scale=0.28, noise=3.0,
            jitter=(0.90, 1.10), num_distractors=4,
        )
    done.touch()
    return root


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "nano"):
        print(f"nano fixture at {make_hard_nano()}")
    if which in ("both", "flagship"):
        print(f"flagship fixture at {make_hard_flagship()}")
