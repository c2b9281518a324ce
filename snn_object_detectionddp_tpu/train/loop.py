"""Training orchestration: epochs, validation, checkpointing, logging.

The reference's ``train_loop`` / ``train_one_epoch`` / ``validate_one_epoch``
(reference: train.py:48-244) rebuilt around jitted sharded steps: host side
only moves batches and logs; all math lives in one XLA program per step.
Async dispatch note: step k's metrics are fetched one iteration LATE —
after step k+1 has been dispatched — so the blocking ``device_get`` never
sits between a step and the next batch's host prep + upload; the H2D
transfer of batch k+1 overlaps the device computing step k (tqdm's loss
postfix therefore lags one step). A fetch placed directly after the
dispatch would stall the host until the step completes and leave the
device idle through every upload.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from tqdm import tqdm

from ..parallel import mesh as _mesh_mod
from ..parallel.mesh import shard_batch
from ..utils.pipelining import DelayedFetch
from ..utils.logging import MetricsLogger, make_writer
from .checkpoint import AsyncCheckpointer
from .step import TrainStepFns


def _device_batch(batch: dict, mesh=None) -> dict:
    db = {k: v for k, v in batch.items() if k != "paths"}
    if mesh is not None:
        return shard_batch(db, mesh)
    return db


def train_one_epoch(
    state, fns: TrainStepFns, loader, logger: MetricsLogger, epoch: int, mesh=None
):
    total = 0.0
    comps = np.zeros(3)
    steps = len(loader)
    pbar = tqdm(loader, desc="Training", total=steps)

    def drain(metrics, batch_idx):
        nonlocal total, comps
        m = jax.device_get(metrics)
        total += float(m["loss"])
        comps += np.array([m["box"], m["cls"], m["dfl"]])
        pbar.set_postfix(loss=f"{float(m['loss']):.4f}")
        logger.train_batch(m, epoch * steps + batch_idx)

    # One-step-delayed fetch: step k runs on device while the loop body
    # prepares + uploads batch k+1 (module docstring; utils/pipelining.py).
    fetch = DelayedFetch(drain)
    for batch_idx, batch in enumerate(pbar):
        state, metrics = fns.train_step(state, _device_batch(batch, mesh))
        fetch.push(metrics, batch_idx)
    fetch.flush()
    return state, total / max(steps, 1), comps / max(steps, 1)


def validate_one_epoch(
    params, fns: TrainStepFns, loader, logger: MetricsLogger, epoch: int, mesh=None
):
    """Returns (avg_loss, avg_components, first_batch). The first batch is
    handed back so callers (spike-rate observability) can reuse it instead of
    spinning up a fresh loader iteration per epoch."""
    total = 0.0
    comps = np.zeros(3)
    steps = len(loader)
    first_batch = None
    pbar = tqdm(loader, desc="Validation", total=steps)

    def drain(metrics, batch_idx):
        nonlocal total, comps
        m = jax.device_get(metrics)
        total += float(m["loss"])
        comps += np.array([m["box"], m["cls"], m["dfl"]])
        pbar.set_postfix(loss=f"{float(m['loss']):.4f}")
        logger.val_batch(m, epoch * steps + batch_idx)

    fetch = DelayedFetch(drain)  # one-step-delayed, as in train_one_epoch
    for batch_idx, batch in enumerate(pbar):
        if first_batch is None:
            first_batch = batch
        fetch.push(fns.eval_step(params, _device_batch(batch, mesh)), batch_idx)
    fetch.flush()
    return total / max(steps, 1), comps / max(steps, 1), first_batch


def train_loop(
    state,
    fns: TrainStepFns,
    schedule,
    train_loader,
    val_loader,
    cfg,
    save_dir: str | Path,
    start_epoch: int = 0,
    best_val_loss: float = float("inf"),
    mesh=None,
    detector=None,
) -> dict:
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    # Multi-host: metrics/state are replicated, so rank 0 owns all event
    # and checkpoint writes (other ranks would produce duplicate files).
    from ..parallel.mesh import is_main_process

    is_main = is_main_process()
    if is_main:
        writer = make_writer(save_dir)
    else:
        from ..utils.logging import NullWriter

        writer = NullWriter()
    logger = MetricsLogger(writer)
    ckptr = AsyncCheckpointer()

    # Multi-host FSDP: a cross-host-sharded state cannot be device_get by
    # rank 0 alone (non-addressable shards would raise inside the async
    # writer thread and silently drop every checkpoint). Detect it once and
    # gather-to-replicated as a COLLECTIVE — every rank runs the gather at
    # the same points (improvement + save cadence, both rank-uniform
    # decisions); rank 0 then snapshots host-side from its local copy.
    needs_gather = mesh is not None and not _mesh_mod.state_is_host_readable(
        state
    )
    gather = (
        _mesh_mod.make_state_gatherer(mesh, state) if needs_gather else None
    )

    def host_snapshot(s):
        """All ranks: collective gather; rank 0 returns host numpy state."""
        g = gather(s)
        return jax.device_get(g) if is_main else None

    epochs = cfg.training.epochs
    best_snap = None  # (snapshotted state, epoch) pending a best.pt write
    for epoch in range(start_epoch, epochs):
        print(f"\n--- Epoch {epoch + 1}/{epochs} ---")
        state, train_loss, train_comps = train_one_epoch(
            state, fns, train_loader, logger, epoch, mesh
        )
        print(f"Average Training Loss: {train_loss}")

        val_loss, val_comps, first_val_batch = validate_one_epoch(
            state["params"], fns, val_loader, logger, epoch, mesh
        )
        print(f"Average Validation Loss: {val_loss}")

        lr = float(schedule(jax.device_get(state["step"])))
        logger.epoch(epoch, train_loss, val_loss, train_comps, val_comps, lr)

        # SNN observability: per-layer firing rates on one val batch —
        # reusing the batch validation already fetched (a fresh
        # next(iter(val_loader)) per epoch would spawn and abandon a
        # producer thread + its prefetched decoded batches every epoch).
        if detector is not None and first_val_batch is not None:
            try:
                from ..data.encoding import preprocess_video

                frames = preprocess_video(
                    first_val_batch["images"], dtype=detector.module.dtype
                )
                rates = detector.spike_rates(state["params"], frames)
                for name, rate in rates.items():
                    writer.add_scalar(f"SpikeRates/{name}", rate, epoch)
            except Exception as e:
                print(f"spike-rate logging skipped: {e}")

        improved = val_loss < best_val_loss
        if improved:
            best_val_loss = val_loss
            # Exact best state, snapshotted on device (cheap copy); written
            # out on the next scheduled write — so best.pt fidelity does not
            # depend on the write cadence. Rank 0 only: other ranks never
            # write best.pt, so snapshotting there would just pin a full
            # extra state copy in HBM for the whole run. (Multi-host FSDP:
            # the gather is collective, so it runs on every rank; only
            # rank 0 keeps the host copy.)
            if needs_gather:
                hs = host_snapshot(state)
                if is_main:
                    best_snap = (hs, epoch)
            elif is_main:
                import jax.numpy as jnp

                best_snap = (jax.tree.map(jnp.copy, state), epoch)
            print(f"New best model (epoch {epoch + 1}), val loss {best_val_loss:.4f}")

        # Checkpoint writes every `save_every_epochs` (reference semantics =
        # 1, train.py:201-241; 0 = final epoch only — for hosts with slow
        # storage/readback). Async: D2H must not stall training. The saved
        # best_val_loss is the post-epoch value (deliberate fix of the
        # reference's stale value, train.py:207 / SURVEY §2.7).
        cadence = getattr(cfg.training, "save_every_epochs", 1)
        is_last = epoch == epochs - 1
        due = is_last or (cadence and (epoch + 1) % cadence == 0)
        # Collective gather OUTSIDE the rank guard (every rank must join).
        latest_state = host_snapshot(state) if (due and needs_gather) else state
        if is_main and due:
            latest = save_dir / "latest.pt"
            ckptr.save(latest_state, epoch, best_val_loss, latest)
            if best_snap is not None:
                snap_state, snap_epoch = best_snap
                ckptr.wait()
                ckptr.save(
                    snap_state, snap_epoch, best_val_loss, save_dir / "best.pt"
                )
                best_snap = None
                print(f"Best checkpoint written to {save_dir / 'best.pt'}")
            print(f"Saved latest model checkpoint to {latest}")

    ckptr.wait()
    writer.flush()
    if hasattr(writer, "close"):
        writer.close()
    print("\nTraining finished!")
    return state
