"""Model mAP evaluation entry point.

Working counterpart of the reference's ``eval_2.py`` (whose committed form
crashes on a split-arity and checkpoint-key bug — SURVEY §2.7; this delivers
its intent): load the best checkpoint, rebuild the seeded val split, run the
recurrent model, NMS (conf=0.001, iou=0.6, max_det=300), and print the
DetMetrics results_dict.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from snn_object_detectionddp_tpu.config import load_config
from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from snn_object_detectionddp_tpu.evals.validator import evaluate_model
from snn_object_detectionddp_tpu.models.detector import Detector
from snn_object_detectionddp_tpu.train.checkpoint import load_checkpoint
from snn_object_detectionddp_tpu.train.step import init_state, make_optimizer


def evaluate(cfg, weights: str | None = None) -> dict:
    detector = Detector.from_config(cfg)

    weights_path = Path(weights) if weights else Path(cfg.training.save_dir) / "best.pt"
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
        print(f"Loaded checkpoint {weights_path} (epoch {int(packed['epoch'])})")
    else:
        params = detector.init_params(jax.random.PRNGKey(0))
        print(f"WARNING: no checkpoint at {weights_path}; evaluating fresh init.")

    # Multi-chip eval: shard val batches over the configured mesh (batch
    # over `data`; image height over `spatial` on a 2-D mesh). Single
    # device keeps the plain single-device jit; so does the Pallas LIF
    # path (the SPMD partitioner cannot split its custom call — fall back
    # rather than fail a run that worked single-device).
    mesh = None
    if jax.device_count() > 1 or cfg.mesh.spatial > 1 or cfg.mesh.tensor > 1:
        if cfg.runtime.lif_kernel == "pallas":
            print(
                "NOTE: runtime.lif_kernel=pallas is not partitionable; "
                "evaluating on a single device."
            )
        else:
            from snn_object_detectionddp_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(
                cfg.mesh.data, cfg.mesh.spatial, tensor=cfg.mesh.tensor
            )
    return evaluate_model(cfg, detector, params, mesh=mesh)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()
    cfg = load_config(args.config)
    # Fail fast when the accelerator tunnel is down instead of hanging on
    # the first backend touch (snn_object_detectionddp_tpu/utils/backend.py).
    from snn_object_detectionddp_tpu.utils.backend import require_backend

    require_backend()
    evaluate(cfg, args.weights)
