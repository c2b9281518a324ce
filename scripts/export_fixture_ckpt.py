"""Export a trained checkpoint to the committed bench-quality fixture form.

Converts runs/hard_nano/exp/best.pt (full train state, fp32) into
fixtures/hard_nano_ckpt.pt — a params-only msgpack with fp16 leaves
(~16 MB, committable) that bench.py::measure_fixture_quality loads and
casts back up. fp16 rounding is deterministic, so the committed artifact
yields the same fixture_map50_95 every round until the model/eval stack
actually changes.

Usage: python scripts/export_fixture_ckpt.py [src_ckpt] [dst]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flax import serialization

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "runs/hard_nano/exp/best.pt"
    )
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        REPO / "fixtures/hard_nano_ckpt.pt"
    )
    raw = serialization.msgpack_restore(src.read_bytes())
    params = raw["state"]["params"]
    fp16 = serialization.to_state_dict(
        __import__("jax").tree.map(
            lambda x: np.asarray(x, np.float16)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else np.asarray(x),
            params,
        )
    )
    dst.parent.mkdir(parents=True, exist_ok=True)
    dst.write_bytes(
        serialization.msgpack_serialize({"params": fp16, "epoch": raw["epoch"]})
    )
    n = sum(x.size for x in __import__("jax").tree.leaves(fp16))
    print(f"wrote {dst} ({dst.stat().st_size/2**20:.1f} MB, {n/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
