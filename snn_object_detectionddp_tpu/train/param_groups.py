"""Discriminative learning-rate parameter groups.

The reference defines (but never calls) a 3-group optimizer split:
U-Net weights at base LR, detect-head weights at 2x LR, and biases/norm
params with no weight decay (reference: weight_initialization.py:86-120 —
dead code there, a working feature here, via ``optax.multi_transform``).

Enable with ``training.param_groups: true``.
"""

from __future__ import annotations

import optax

from .schedule import onecycle_schedule


def _group_of(path: tuple, leaf) -> str:
    """Classify a parameter by its tree path.

    - 'no_decay': biases and norm scales/offsets (1-D leaves)
    - 'head':     detect-head weights (2x LR, reference :102-107)
    - 'base':     everything else (U-Net/backbone weights)
    """
    names = [getattr(p, "key", str(p)) for p in path]
    if leaf.ndim <= 1:
        return "no_decay"
    if any(n == "head" for n in names):
        return "head"
    return "base"


def make_grouped_optimizer(
    params,
    peak_lr: float,
    total_steps: int,
    weight_decay: float = 5e-4,
    grad_clip_norm: float = 10.0,
    pct_start: float = 0.3,
    head_lr_mult: float = 2.0,
):
    """optax.multi_transform over {base, head, no_decay} groups."""
    import jax

    labels = jax.tree_util.tree_map_with_path(_group_of, params)

    def adamw_for(mult: float, wd: float):
        sched = onecycle_schedule(peak_lr * mult, total_steps, pct_start)
        return optax.adamw(learning_rate=sched, weight_decay=wd)

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.multi_transform(
            {
                "base": adamw_for(1.0, weight_decay),
                "head": adamw_for(head_lr_mult, weight_decay),
                "no_decay": adamw_for(1.0, 0.0),
            },
            labels,
        ),
    )
    schedule = onecycle_schedule(peak_lr, total_steps, pct_start)
    return tx, schedule
