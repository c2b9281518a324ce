"""OneCycle learning-rate schedule.

Matches the reference's ``torch.optim.lr_scheduler.OneCycleLR`` settings
(reference: train.py:163-169): peak = ``training.learning_rate``,
``pct_start=0.3``, cosine annealing, stepped every batch, over
``total_steps = len(train_loader) * epochs``. optax's cosine onecycle uses
the same div_factor conventions as the torch defaults (25 / 1e4).
"""

from __future__ import annotations

import optax


def onecycle_schedule(
    peak_lr: float, total_steps: int, pct_start: float = 0.3
) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=peak_lr,
        pct_start=pct_start,
        div_factor=25.0,
        final_div_factor=1e4,
    )
