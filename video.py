"""Stitch the visualization PNGs into video/output.mp4 @ 30 fps.

Counterpart of reference ``video.py`` (video.py:1-31), which hardcodes the
frames folder; here it defaults to ``<save_dir>/visualizations`` from
config.yaml and accepts overrides.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from snn_object_detectionddp_tpu.config import load_config
from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from snn_object_detectionddp_tpu.viz.video import stitch_video

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--frames", default=None, help="PNG folder override")
    ap.add_argument("--output", default="video/output.mp4")
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args()

    frames = args.frames
    if frames is None:
        cfg = load_config(args.config)
        frames = str(Path(cfg.training.save_dir) / "visualizations")
    stitch_video(frames, args.output, args.fps)
