"""TensorBoard logging with the reference's exact tag schema.

Tags (reference: train.py:85-100, 134-140, 211-226):
  per batch:  Loss/train_batch, Train_Loss_Components_Batch{box,cls,dfl},
              LearningRate/batch, Loss/val_batch, Val_Loss_Components_Batch
  per epoch:  Loss/train, Loss/val, LearningRate,
              Train_Loss_Components, Val_Loss_Components

Uses tensorboardX when available, else falls back to a JSONL writer with
the same tag names (so logs always exist, even in minimal environments).
"""

from __future__ import annotations

import json
import os
from pathlib import Path


class _JsonlWriter:
    def __init__(self, log_dir: str):
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self._f = open(Path(log_dir) / "scalars.jsonl", "a")

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def add_scalars(self, tag, values, step):
        for k, v in values.items():
            self.add_scalar(f"{tag}/{k}", v, step)

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class NullWriter:
    """No-op writer for non-main processes in multi-host training (every
    process stepping the same replicated metrics would write duplicate —
    and file-contending — event streams)."""

    def add_scalar(self, *a, **k):
        pass

    def add_scalars(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def make_writer(save_dir: str | Path):
    log_dir = os.path.join(str(save_dir), "runs")  # reference: train.py:148
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except Exception:
        return _JsonlWriter(log_dir)


class MetricsLogger:
    """Reference tag schema over any writer object."""

    def __init__(self, writer):
        self.writer = writer

    def train_batch(self, metrics: dict, global_step: int) -> None:
        self.writer.add_scalar("Loss/train_batch", metrics["loss"], global_step)
        self.writer.add_scalars(
            "Train_Loss_Components_Batch",
            {
                "box_loss_batch": metrics["box"],
                "cls_loss_batch": metrics["cls"],
                "dfl_loss_batch": metrics["dfl"],
            },
            global_step,
        )
        self.writer.add_scalar("LearningRate/batch", metrics["lr"], global_step)
        if "fg" in metrics:  # TAL foreground-anchor count (observability)
            self.writer.add_scalar(
                "Assign/fg_anchors_batch", metrics["fg"], global_step
            )

    def val_batch(self, metrics: dict, global_step: int) -> None:
        self.writer.add_scalar("Loss/val_batch", metrics["loss"], global_step)
        self.writer.add_scalars(
            "Val_Loss_Components_Batch",
            {
                "box_loss_batch": metrics["box"],
                "cls_loss_batch": metrics["cls"],
                "dfl_loss_batch": metrics["dfl"],
            },
            global_step,
        )

    def epoch(
        self, epoch: int, train_loss, val_loss, train_comps, val_comps, lr
    ) -> None:
        self.writer.add_scalar("Loss/train", train_loss, epoch)
        self.writer.add_scalar("Loss/val", val_loss, epoch)
        self.writer.add_scalar("LearningRate", lr, epoch)
        self.writer.add_scalars(
            "Train_Loss_Components",
            {
                "box_loss": train_comps[0],
                "cls_loss": train_comps[1],
                "dfl_loss": train_comps[2],
            },
            epoch,
        )
        self.writer.add_scalars(
            "Val_Loss_Components",
            {
                "box_loss": val_comps[0],
                "cls_loss": val_comps[1],
                "dfl_loss": val_comps[2],
            },
            epoch,
        )
