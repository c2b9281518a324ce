"""Verify sharded-training gradients against the single-device step on the
CURRENT hardware and config geometry.

The CPU test suite pins mesh-vs-single equivalence on 8 virtual devices
(tests/test_spatial.py, tests/test_train.py), but the XLA SPMD
partitioner's behavior is backend- and geometry-dependent — this repo has
already caught it silently inflating windowed-conv kernel gradients on
2-D meshes (scripts/repro_gspmd_convgrad.py). This script is the
run-it-on-the-pod counterpart: it builds the configured mesh, runs ONE
train step both sharded and unsharded on the same tiny synthetic batch,
and compares loss and gradient norm.

Usage:
    python scripts/check_mesh_grads.py [--config config.yaml] [--t 2] [--b per-device-batch]

Exit 0 when loss agrees to 0.1% and grad_norm to 2% (the tolerances the
CPU suite uses — sharded reductions reassociate f32 sums and a
near-threshold membrane can flip a spike, so bitwise equality is not the
contract; see docs/PARALLELISM.md). Exit 1 with a report otherwise.

The single-device reference runs the same global batch on device 0, so
per-device memory must hold batch = b * data_axis; keep --b small.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--t", type=int, default=2, help="timesteps")
    ap.add_argument("--b", type=int, default=1, help="batch per data shard")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from snn_object_detectionddp_tpu.config import apply_device, load_config
    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        place_state,
        shard_batch,
        state_shardings,
    )
    from snn_object_detectionddp_tpu.train.step import (
        init_state,
        make_optimizer,
        make_step_fns,
    )

    cfg = load_config(args.config)
    apply_device(cfg)
    mesh_cfg = cfg.mesh
    mesh = make_mesh(mesh_cfg.data, mesh_cfg.spatial)
    detector = Detector.from_config(cfg)
    params = detector.init_params(jax.random.PRNGKey(args.seed))
    tx, schedule = make_optimizer(cfg.training.learning_rate, total_steps=10)

    remat_chunk = cfg.training.remat_chunk or (
        1 if mesh_cfg.spatial > 1 else 0
    )
    fns_1 = make_step_fns(detector, tx, schedule, remat_chunk=remat_chunk)
    fns_m = make_step_fns(
        detector, tx, schedule, mesh=mesh, remat_chunk=remat_chunk,
        fsdp=mesh_cfg.fsdp,
    )

    h, w = cfg.model.image_size
    b = args.b * mesh.shape["data"]
    m = cfg.model.max_boxes
    rng = np.random.RandomState(args.seed)
    labels = np.zeros((b, m, 5), np.float32)
    labels[:, 0] = [1.0, 0.5, 0.5, 0.4, 0.4]
    mask = np.zeros((b, m), bool)
    mask[:, 0] = True
    batch = {
        "images": rng.randint(0, 255, size=(b, args.t, h, w, 3), dtype=np.uint8),
        "labels": labels,
        "label_mask": mask,
        "sample_mask": np.ones((b,), bool),
    }

    state_1 = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
    state_m = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
    if mesh_cfg.fsdp:
        # Start from the production layout: params + moments 1/data per
        # device (main.py does the same placement under mesh.fsdp).
        state_m = place_state(
            state_m, state_shardings(mesh, state_m, fsdp=True)
        )
    print(
        f"mesh {mesh.shape} | geometry b={b} t={args.t} {h}x{w} | "
        f"remat_chunk={remat_chunk} | fsdp={mesh_cfg.fsdp}",
        flush=True,
    )
    _, m1 = fns_1.train_step(state_1, batch)
    _, mm = fns_m.train_step(state_m, shard_batch(batch, mesh))
    loss_1, loss_m = float(m1["loss"]), float(mm["loss"])
    gn_1, gn_m = float(m1["grad_norm"]), float(mm["grad_norm"])

    loss_rel = abs(loss_m - loss_1) / max(abs(loss_1), 1e-9)
    gn_rel = abs(gn_m - gn_1) / max(abs(gn_1), 1e-9)
    print(f"loss      single={loss_1:.6f}  mesh={loss_m:.6f}  rel={loss_rel:.2e}")
    print(f"grad_norm single={gn_1:.6f}  mesh={gn_m:.6f}  rel={gn_rel:.2e}")
    ok = loss_rel < 1e-3 and gn_rel < 2e-2
    print("OK: sharded gradients agree with the single-device step"
          if ok else
          "MISMATCH: sharded gradients disagree — do NOT train on this "
          "mesh/geometry (see docs/PARALLELISM.md, "
          "scripts/repro_gspmd_convgrad.py)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
