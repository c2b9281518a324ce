import jax
import jax.numpy as jnp
import numpy as np
import optax

from snn_object_detectionddp_tpu.train.param_groups import (
    _group_of,
    make_grouped_optimizer,
)


def _params():
    return {
        "backbone": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
        "head": {
            "cls0_out": {"kernel": jnp.ones((1, 1, 8, 2)), "bias": jnp.zeros(2)}
        },
        "unet": {"gn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}},
    }


def test_group_labels():
    params = _params()
    labels = jax.tree_util.tree_map_with_path(_group_of, params)
    assert labels["backbone"]["conv"]["kernel"] == "base"
    assert labels["head"]["cls0_out"]["kernel"] == "head"
    assert labels["head"]["cls0_out"]["bias"] == "no_decay"
    assert labels["unet"]["gn"]["scale"] == "no_decay"


def test_head_gets_double_lr():
    params = _params()
    tx, _ = make_grouped_optimizer(
        params, peak_lr=1e-3, total_steps=100, grad_clip_norm=1e9
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # Same gradient (all ones) -> the head weight update must be ~2x the
    # base weight update at every step of the schedule.
    base_u = float(jnp.abs(updates["backbone"]["conv"]["kernel"]).mean())
    head_u = float(jnp.abs(updates["head"]["cls0_out"]["kernel"]).mean())
    assert abs(head_u / base_u - 2.0) < 0.05


def test_no_decay_group_has_no_weight_decay():
    params = _params()
    tx, _ = make_grouped_optimizer(
        params, peak_lr=1e-3, total_steps=100, weight_decay=1.0, grad_clip_norm=1e9
    )
    state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    # With zero grads, decayed groups still move (wd * param); no_decay not.
    assert float(jnp.abs(updates["unet"]["gn"]["scale"]).sum()) == 0.0
    assert float(jnp.abs(updates["backbone"]["conv"]["kernel"]).sum()) > 0.0
