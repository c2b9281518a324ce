"""Entry point: config-driven train / visualize / test dispatch.

Same CLI surface as the reference's ``main.py`` (reference: main.py:119-158):
behavior selected by ``config["mode"]`` from ``config.yaml`` (an optional
``--config PATH`` flag is added; the reference hardcodes the filename).

Differences by design (TPU rebuild, SURVEY §7):
- ``device`` is a JAX mesh instead of a CUDA string: all visible chips form
  a 1-D data-parallel mesh; gradients all-reduce over ICI.
- The training batch axis must tile over the mesh, so the train loader
  drops a trailing partial batch (the val loader pads + masks instead).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from snn_object_detectionddp_tpu.config import load_config
from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from snn_object_detectionddp_tpu.data.dsec import (
    DSECIndex,
    apply_train_debug,
    train_val_split,
)
from snn_object_detectionddp_tpu.data.pipeline import BatchLoader
from snn_object_detectionddp_tpu.models.detector import Detector
from snn_object_detectionddp_tpu.parallel.mesh import (
    data_axis_size,
    host_shard_indices,
    local_batch_size,
    make_mesh,
    pad_batch_to_devices,
)
from snn_object_detectionddp_tpu.train.checkpoint import (
    load_checkpoint,
    resume_or_init,
)
from snn_object_detectionddp_tpu.train.loop import train_loop
from snn_object_detectionddp_tpu.train.step import (
    init_state,
    make_optimizer,
    make_step_fns,
)


def train_code(cfg, detector: Detector) -> None:
    save_dir = Path(cfg.training.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    index = DSECIndex(cfg, "train")
    train_idx, val_idx = train_val_split(index, seed=cfg.training.seed)
    train_idx, val_idx = apply_train_debug(train_idx, val_idx, cfg.debug_train)

    if cfg.mesh.tensor > 1:
        # Fail here with the explanation rather than deep in make_step_fns.
        raise ValueError(
            "mesh.tensor > 1 is inference-only (eval_2 / serving); "
            "training parallelism is mesh.data x mesh.spatial [+ fsdp] "
            "(docs/PARALLELISM.md)"
        )
    mesh = make_mesh(cfg.mesh.data, cfg.mesh.spatial)
    # Multi-host: each process feeds its own shard of the sample list.
    train_idx = host_shard_indices(train_idx)
    val_idx = host_shard_indices(val_idx)
    # The batch axis tiles over the data axis only (image height tiles
    # over a spatial axis, if any — parallel/mesh.py::batch_specs).
    n_dev = data_axis_size(mesh)
    bs = cfg.training.batch_size
    if bs % n_dev:
        bs = pad_batch_to_devices(bs, n_dev)
        print(f"Rounding batch_size up to {bs} (multiple of {n_dev} devices)")
    # Multi-host: each process's loader feeds its LOCAL slice of the global
    # batch; shard_batch assembles them into the global array (mesh.py).
    bs_local = local_batch_size(bs)

    train_loader = BatchLoader(
        index, train_idx, batch_size=bs_local, max_boxes=cfg.model.max_boxes,
        shuffle=True, seed=cfg.training.seed,
        num_threads=cfg.training.num_workers, prefetch=cfg.runtime.prefetch,
        drop_last=True,
    )
    val_loader = BatchLoader(
        index, val_idx, batch_size=bs_local, max_boxes=cfg.model.max_boxes,
        shuffle=False, num_threads=cfg.training.num_workers,
        prefetch=cfg.runtime.prefetch,
    )
    print(
        f"Total samples: {len(index)}. Train: {len(train_idx)}. "
        f"Val: {len(val_idx)}."
    )

    total_steps = len(train_loader) * cfg.training.epochs
    frozen_mask = None
    if cfg.model.freeze_backbone:
        if cfg.training.param_groups:
            raise ValueError(
                "model.freeze_backbone cannot combine with "
                "training.param_groups (pick one optimizer structure)"
            )
        from snn_object_detectionddp_tpu.train.step import module_frozen_mask

        frozen_mask = module_frozen_mask("backbone")
        print("Backbone frozen: zero updates + no weight decay on backbone.")
    if cfg.training.param_groups:
        # Discriminative LR groups need concrete params for labeling.
        from snn_object_detectionddp_tpu.train.param_groups import (
            make_grouped_optimizer,
        )

        concrete = detector.init_params(jax.random.PRNGKey(cfg.training.seed))
        tx, schedule = make_grouped_optimizer(
            concrete,
            cfg.training.learning_rate,
            total_steps,
            weight_decay=cfg.training.weight_decay,
            grad_clip_norm=cfg.training.grad_clip_norm,
            pct_start=cfg.training.pct_start,
        )
    else:
        tx, schedule = make_optimizer(
            cfg.training.learning_rate,
            total_steps,
            weight_decay=cfg.training.weight_decay,
            grad_clip_norm=cfg.training.grad_clip_norm,
            pct_start=cfg.training.pct_start,
            frozen_mask=frozen_mask,
        )
    if cfg.runtime.debug_nans:
        from snn_object_detectionddp_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging()
    fns = make_step_fns(
        detector, tx, schedule, mesh=mesh, remat=cfg.training.remat,
        remat_chunk=cfg.training.remat_chunk or None,
        grad_accum=cfg.training.grad_accum_steps or 1,
        fsdp=cfg.mesh.fsdp,
        remat_policy=cfg.training.remat_policy,
    )

    rng = jax.random.PRNGKey(cfg.training.seed)
    # Abstract template (no device work); real init only on fresh starts.
    template_state = jax.eval_shape(
        lambda r: init_state(detector.init_params(r), tx, schedule), rng
    )
    def fresh_init():
        params = detector.init_params(rng)
        if cfg.model.backbone_init:
            # Backbone transfer (reference's pretrained-extractor role,
            # model.py:74-98): fresh starts only — a resumed checkpoint
            # already carries trained backbone weights.
            from snn_object_detectionddp_tpu.train.checkpoint import (
                load_backbone_params,
            )

            params = load_backbone_params(cfg.model.backbone_init, params)
        return init_state(params, tx, schedule)

    state, start_epoch, best = resume_or_init(
        cfg, template_state, init_fn=fresh_init
    )
    if cfg.mesh.fsdp:
        # Start sharded (1/data of every weight + moment per device) rather
        # than letting the first step reshard from a single device — at
        # large model scale the unsharded state may not even fit one chip.
        from snn_object_detectionddp_tpu.parallel.mesh import (
            place_state,
            state_shardings,
        )

        state = place_state(state, state_shardings(mesh, state, fsdp=True))

    train_loop(
        state, fns, schedule, train_loader, val_loader, cfg, save_dir,
        start_epoch=start_epoch, best_val_loss=best, mesh=mesh,
        detector=detector,
    )


def visualize_code(cfg, detector: Detector) -> None:
    from snn_object_detectionddp_tpu.viz.overlay import run_visualization

    save_dir = Path(cfg.training.save_dir)
    weights_path = save_dir / "best.pt"
    output_dir = save_dir / "visualizations"
    print(f"Saving visualizations to {output_dir}")

    # best.pt stores the full train state; restore against an abstract
    # eval_shape template (no device work) and use only its params.
    tx, _ = make_optimizer(cfg.training.learning_rate, 1)
    template = jax.eval_shape(
        lambda r: init_state(detector.init_params(r), tx), jax.random.PRNGKey(0)
    )
    packed = load_checkpoint(weights_path, template)
    print(
        f"Model with val loss {float(packed['best_val_loss'])} loaded "
        "successfully for visualization."
    )
    from snn_object_detectionddp_tpu.data.classes import DSEC_DET_CLASSES

    run_visualization(
        cfg,
        detector,
        jax.device_put(packed["state"]["params"]),  # one-time placement
        output_dir,
        class_names=DSEC_DET_CLASSES[: cfg.model.num_classes],
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    args = ap.parse_args()
    cfg = load_config(args.config)

    # Multi-host launch (SURVEY §5 distributed row): initialize DCN BEFORE
    # the first backend touch (Detector.from_config inits params on device).
    from snn_object_detectionddp_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed(cfg)

    # Fail fast if the accelerator tunnel is down (backend init would
    # otherwise hang forever) — after distributed init, which must own the
    # first backend touch on multi-host launches.
    from snn_object_detectionddp_tpu.utils.backend import require_backend

    require_backend()

    detector = Detector.from_config(cfg)

    if cfg.mode == "train":
        train_code(cfg, detector)
    elif cfg.mode == "visualize":
        visualize_code(cfg, detector)
    elif cfg.mode in ("test", "eval"):
        # The reference leaves mode "test" unimplemented (main.py:157-158);
        # we route it to the working mAP evaluation (eval_2 equivalent).
        import eval_2

        eval_2.evaluate(cfg)
