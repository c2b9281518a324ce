"""OneCycle learning-rate schedule.

Matches the reference's ``torch.optim.lr_scheduler.OneCycleLR`` settings
(reference: train.py:163-169): peak = ``training.learning_rate``,
``pct_start=0.3``, cosine annealing, stepped every batch, over
``total_steps = len(train_loader) * epochs``. optax's cosine onecycle uses
the same div_factor conventions as the torch defaults (25 / 1e4).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

DIV_FACTOR = 25.0
FINAL_DIV_FACTOR = 1e4


def onecycle_schedule(
    peak_lr: float, total_steps: int, pct_start: float = 0.3
) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=peak_lr,
        pct_start=pct_start,
        div_factor=DIV_FACTOR,
        final_div_factor=FINAL_DIV_FACTOR,
    )


def onecycle_lr(step, total_steps, peak, pct_start):
    """Traceable OneCycle value with *dynamic* total_steps/peak/pct.

    Matches optax.cosine_onecycle_schedule (two cosine-eased segments,
    torch OneCycleLR div conventions) but takes its constants as runtime
    values, so changing epochs / loader length / peak LR does NOT change
    the compiled train-step program (compiles are minutes on this host).
    Verified against the optax schedule in tests/test_schedule.py.
    """
    step = jnp.asarray(step, jnp.float32)
    total_steps = jnp.maximum(jnp.asarray(total_steps, jnp.float32), 1.0)
    peak = jnp.asarray(peak, jnp.float32)
    s1 = jnp.floor(pct_start * total_steps)
    init = peak / DIV_FACTOR
    final = init / FINAL_DIV_FACTOR
    f1 = jnp.clip(step / jnp.maximum(s1, 1.0), 0.0, 1.0)
    up = init + (peak - init) * 0.5 * (1.0 - jnp.cos(jnp.pi * f1))
    f2 = jnp.clip((step - s1) / jnp.maximum(total_steps - s1, 1.0), 0.0, 1.0)
    down = peak + (final - peak) * 0.5 * (1.0 - jnp.cos(jnp.pi * f2))
    return jnp.where(step < s1, up, down)
