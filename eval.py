"""Legacy tracker benchmark entry point.

Working counterpart of the reference's ``eval.py`` (whose committed form
only runs as a script with cluster-specific paths and calls undefined
helpers — SURVEY §2.7): benchmark detect-every-frame vs detect-every-N +
optical-flow propagation, reporting per-sequence FPS (incl/excl retrieval)
and blended FLOPs/frame, plus avg-IoU / precision@0.5 quality metrics when
ground truth exists.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

from snn_object_detectionddp_tpu.config import load_config
from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from snn_object_detectionddp_tpu.evals.legacy import process_dataset
from snn_object_detectionddp_tpu.models.detector import Detector
from snn_object_detectionddp_tpu.train.checkpoint import load_checkpoint
from snn_object_detectionddp_tpu.train.step import init_state, make_optimizer

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument(
        "--method",
        default="optical_flow",
        choices=["entire_model", "cropped_model", "optical_flow"],
    )
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument(
        "--adaptive-stride",
        action="store_true",
        help="optical_flow method only: adapt the detector interval to "
        "tracking IoU (the reference's '_dynamic' mode, eval.py:108-133)",
    )
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--annotate", action="store_true")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    cfg = load_config(args.config)
    # Fail fast when the accelerator tunnel is down instead of hanging on
    # the first backend touch (snn_object_detectionddp_tpu/utils/backend.py).
    from snn_object_detectionddp_tpu.utils.backend import require_backend

    require_backend()
    detector = Detector.from_config(cfg)
    weights_path = (
        Path(args.weights) if args.weights else Path(cfg.training.save_dir) / "best.pt"
    )
    tx, _ = make_optimizer(cfg.training.learning_rate, 1)
    if weights_path.exists():
        template = jax.eval_shape(
            lambda r: init_state(detector.init_params(r), tx),
            jax.random.PRNGKey(0),
        )
        packed = load_checkpoint(weights_path, template)
        # One-time device placement: checkpoint params restore as host
        # numpy; without this every jitted call re-uploads them (minutes
        # over this host's ~3 MB/s tunnel; a silent per-call tax anywhere).
        params = jax.device_put(packed["state"]["params"])
        print(f"Loaded checkpoint {weights_path}")
    else:
        params = detector.init_params(jax.random.PRNGKey(0))
        print(f"WARNING: no checkpoint at {weights_path}; benchmarking fresh init.")

    compute_stride = None
    if args.adaptive_stride:
        from snn_object_detectionddp_tpu.evals.legacy import (
            default_adaptive_stride,
        )

        compute_stride = default_adaptive_stride

    report = process_dataset(
        cfg,
        detector,
        params,
        method=args.method,
        stride=args.stride,
        max_frames_per_seq=args.max_frames,
        annotate=args.annotate,
        compute_stride=compute_stride,
    )
    print(json.dumps(report["aggregate"], indent=2))
