import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_object_detectionddp_tpu.losses.detection import detection_loss

NC = 3
REG_MAX = 8


def _raw_maps(rng, b=2, h=8, w=8, scale=0.1):
    """Three pyramid maps (h, h/2, h/4) with channels 4*reg_max + nc."""
    maps = []
    for s in (1, 2, 4):
        maps.append(
            jnp.asarray(
                rng.randn(b, h // s, w // s, 4 * REG_MAX + NC).astype(np.float32)
            )
            * scale
        )
    return maps


def test_no_labels_zero_box_dfl():
    rng = np.random.RandomState(0)
    maps = _raw_maps(rng)
    labels = jnp.zeros((2, 4, 5))
    mask = jnp.zeros((2, 4), bool)
    out = detection_loss(maps, labels, mask, NC, REG_MAX)
    assert float(out.box) == 0.0
    assert float(out.dfl) == 0.0
    assert float(out.cls) > 0.0  # background BCE
    assert np.isfinite(float(out.total))


def test_loss_gradient_finite():
    rng = np.random.RandomState(1)
    maps = _raw_maps(rng)
    labels = jnp.array(
        [
            [[1.0, 0.5, 0.5, 0.4, 0.4], [0.0, 0.2, 0.2, 0.2, 0.2]],
            [[2.0, 0.7, 0.3, 0.3, 0.3], [0.0, 0.0, 0.0, 0.0, 0.0]],
        ]
    )
    mask = jnp.array([[True, True], [True, False]])

    def scalar(maps):
        return detection_loss(maps, labels, mask, NC, REG_MAX).total

    loss, grads = jax.value_and_grad(scalar)(maps)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # Box/DFL branch must receive gradient (fg anchors exist).
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0


def test_gradient_descent_reduces_loss():
    """Direct SGD on the raw maps must drive the loss down — end-to-end
    sanity of assignment + CIoU + BCE + DFL gradients."""
    rng = np.random.RandomState(2)
    maps = _raw_maps(rng, b=1, scale=0.5)
    labels = jnp.array([[[1.0, 0.5, 0.5, 0.5, 0.5]]])
    mask = jnp.array([[True]])

    @jax.jit
    def step(maps):
        loss, grads = jax.value_and_grad(
            lambda ms: detection_loss(ms, labels, mask, NC, REG_MAX).total
        )(maps)
        return loss, [m - 0.05 * g for m, g in zip(maps, grads)]

    losses = []
    for _ in range(60):
        loss, maps = step(maps)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # Raw-map SGD with a detached assigner oscillates late (targets
    # re-assign as boxes move), so check descent via the best loss reached;
    # real-optimizer convergence is covered by test_train_step_reduces_loss.
    assert min(losses) < 0.8 * losses[0]


def test_confident_background_lowers_cls_loss():
    rng = np.random.RandomState(3)
    maps = _raw_maps(rng, b=1, scale=0.0)  # zero logits
    neg = [m.at[..., 4 * REG_MAX :].add(-8.0) for m in maps]
    labels = jnp.zeros((1, 2, 5))
    mask = jnp.zeros((1, 2), bool)
    l_zero = float(detection_loss(maps, labels, mask, NC, REG_MAX).cls)
    l_neg = float(detection_loss(neg, labels, mask, NC, REG_MAX).cls)
    assert l_neg < l_zero


@pytest.mark.slow
def test_sample_mask_padded_batch_equals_unpadded():
    """A final partial batch is padded by duplicating the last real image
    with zeroed labels (data/pipeline.py); with sample_mask those padding
    rows must not change the loss at all."""
    rng = np.random.RandomState(5)
    maps4 = _raw_maps(rng, b=4)
    labels4 = jnp.zeros((4, 3, 5)).at[:, 0].set(
        jnp.array([1.0, 0.5, 0.5, 0.4, 0.4])
    )
    lmask4 = jnp.zeros((4, 3), bool).at[:, 0].set(True)

    # Unpadded 3-row batch.
    out_real = detection_loss(
        [m[:3] for m in maps4],
        labels4[:3],
        lmask4[:3],
        NC,
        REG_MAX,
        sample_mask=jnp.ones((3,), bool),
    )
    # Same 3 rows padded to 4 by duplicating the last image, labels zeroed.
    maps_pad = [jnp.concatenate([m[:3], m[2:3]], axis=0) for m in maps4]
    labels_pad = labels4.at[3].set(0.0)
    lmask_pad = lmask4.at[3].set(False)
    out_pad = detection_loss(
        maps_pad,
        labels_pad,
        lmask_pad,
        NC,
        REG_MAX,
        sample_mask=jnp.array([True, True, True, False]),
    )
    np.testing.assert_allclose(float(out_pad.total), float(out_real.total), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_pad.vec3), np.asarray(out_real.vec3), rtol=1e-6)

    # Without the mask, the padded batch is biased (extra background BCE
    # scaled by a wrong batch multiplier).
    out_nomask = detection_loss(maps_pad, labels_pad, lmask_pad, NC, REG_MAX)
    assert abs(float(out_nomask.total) - float(out_real.total)) > 1e-3


def test_no_nan_with_extreme_logits():
    """Confident background (very negative class logits, sigmoid underflow
    to 0) must not NaN the gradient — regression test for the undetached
    assigner (grad of pow(score, 0.5) at 0 is inf)."""
    rng = np.random.RandomState(4)
    maps = _raw_maps(rng, b=1, scale=0.1)
    maps = [m.at[..., 4 * REG_MAX :].add(-120.0) for m in maps]  # sigmoid -> 0
    labels = jnp.array([[[1.0, 0.5, 0.5, 0.5, 0.5]]])
    mask = jnp.array([[True]])

    loss, grads = jax.value_and_grad(
        lambda ms: detection_loss(ms, labels, mask, NC, REG_MAX).total
    )(maps)
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g))), "NaN/inf gradient"
