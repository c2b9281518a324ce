"""Checkpointing with Orbax: ``latest.pt`` / ``best.pt`` under save_dir.

Keeps the reference's naming and resume semantics
(reference: train.py:201-241, main.py:133-151): a checkpoint per epoch at
``<save_dir>/latest.pt``, a copy at ``best.pt`` on val-loss improvement,
``resume_training`` + ``weights_path`` to continue, and warn-and-fresh-init
when the path is missing. Two deliberate fixes over the reference
(SURVEY §2.7): optimizer/schedule state IS saved (resume continues the
OneCycle schedule instead of restarting it), and ``latest.pt`` records the
post-epoch best_val_loss rather than the stale pre-epoch value.

Checkpoints are directories (Orbax format) despite the ``.pt`` suffix — the
suffix is kept so reference configs (``weights_path: .../latest.pt``) work
unchanged.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _pack(state: dict, epoch: int, best_val_loss: float) -> dict:
    return {
        "state": state,
        "epoch": jnp.asarray(epoch, jnp.int32),
        "best_val_loss": jnp.asarray(best_val_loss, jnp.float32),
    }


def save_checkpoint(
    path: str | Path, state: dict, epoch: int, best_val_loss: float
) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ck:
        ck.save(path, _pack(jax.device_get(state), epoch, best_val_loss), force=True)


def load_checkpoint(path: str | Path, template_state: dict) -> dict:
    """Restore against a freshly-initialized template (shapes/dtypes)."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ck:
        return ck.restore(path, _pack(template_state, 0, float("inf")))


def resume_or_init(
    cfg, template_state: dict, init_fn=None
) -> tuple[dict, int, float]:
    """Reference resume semantics (main.py:133-151).

    Returns (state, start_epoch, best_val_loss). ``init_fn`` runs on a
    fresh (non-resumed) start — the hook where the reference applies its
    weight-init recipe (main.py:147-151).
    """
    if cfg.training.resume_training:
        weights_path = Path(cfg.training.weights_path)
        if weights_path.exists():
            print(f"Resuming training: Loading from {weights_path}")
            packed = load_checkpoint(weights_path, template_state)
            best = float(packed["best_val_loss"])
            print(
                "Successfully loaded model and found previous "
                f"best_val_loss: {best}"
            )
            return packed["state"], int(packed["epoch"]) + 1, best
        print(
            f"WARNING: 'resume_training' is True but weights_path "
            f"'{weights_path}' not found."
        )
        print("Initializing model from scratch...")
    else:
        print("Initializing new model from scratch...")
    if init_fn is not None:
        init_fn()
    return template_state, 0, float("inf")
