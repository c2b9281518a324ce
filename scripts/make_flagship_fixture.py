"""Generate the synthetic DSEC fixture for the flagship on-chip demo.

Builds the dataset tree `scripts/flagship_demo.yaml` points at
(`runs/flagship_demo/dsec/{train,test}`): 30 training sequences at the
full flagship 480x640 geometry plus a small test split for the
visualize/video stage. Sequence length 24 frames -> 20 sliding-window
samples per sequence at seq_len=5: 600 samples total, of which main.py's
seeded sequence-level 80/20 split keeps 24 sequences (480 samples) for
training -> 30 steps/epoch at batch 16 with drop_last. Idempotent: skips
generation when the tree already exists; run_flagship_demo.sh invokes it
before training so the relay-gated launcher can re-run safely.

Reference layout contract: /root/reference/dataset.py:28-48.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from snn_object_detectionddp_tpu.data.synthetic import make_sequence

ROOT = Path(__file__).resolve().parents[1] / "runs/flagship_demo/dsec"


def main() -> None:
    done = ROOT / ".fixture_done"
    if done.exists():
        print(f"fixture already present at {ROOT}")
        return
    for i in range(30):
        make_sequence(
            ROOT / "train" / f"seq_{i:02d}",
            num_frames=24,
            height=480,
            width=640,
            num_objects=3,
            num_classes=3,
            seed=1000 + i,
        )
        print(f"train seq_{i:02d}", flush=True)
    for i in range(4):
        make_sequence(
            ROOT / "test" / f"seq_{i:02d}",
            num_frames=24,
            height=480,
            width=640,
            num_objects=3,
            num_classes=3,
            seed=9000 + i,
        )
        print(f"test seq_{i:02d}", flush=True)
    done.touch()
    print(f"fixture written to {ROOT}")


if __name__ == "__main__":
    main()
