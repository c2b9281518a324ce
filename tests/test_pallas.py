"""Pallas fused-LIF kernel vs the XLA scan reference path (SURVEY §4:
kernels tested in interpret mode against the XLA reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_object_detectionddp_tpu.kernels.lif_pallas import lif_scan_pallas
from snn_object_detectionddp_tpu.models.lif import LIFParams, lif_scan

PARAMS = [
    LIFParams(threshold=1.0, decay=0.5, surrogate_slope=4.0, reset="soft"),
    LIFParams(threshold=0.7, decay=0.9, surrogate_slope=2.0, reset="hard"),
]


@pytest.mark.parametrize("p", PARAMS, ids=["soft", "hard"])
def test_forward_matches_scan(p):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 3, 50, 70).astype(np.float32))  # odd sizes: pad path
    v0 = jnp.asarray(rng.randn(3, 50, 70).astype(np.float32) * 0.1)
    s_ref, v_ref = lif_scan(x, p, v0)
    s_pal, v_pal = lif_scan_pallas(x, v0, p, True)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref), atol=1e-5)


@pytest.mark.parametrize("p", PARAMS, ids=["soft", "hard"])
def test_backward_matches_scan(p):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 2, 40, 40).astype(np.float32))
    v0 = jnp.zeros((2, 40, 40), jnp.float32)
    w = jnp.asarray(rng.randn(3, 2, 40, 40).astype(np.float32))  # random readout

    def loss_ref(x, v0):
        s, v = lif_scan(x, p, v0)
        return jnp.sum(s * w) + jnp.sum(v**2)

    def loss_pal(x, v0):
        s, v = lif_scan_pallas(x, v0, p, True)
        return jnp.sum(s * w) + jnp.sum(v**2)

    gx_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1))(x, v0)
    gx_pal, gv_pal = jax.grad(loss_pal, argnums=(0, 1))(x, v0)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_pal), np.asarray(gv_ref), atol=1e-5)


def test_compiled_cpu_interpret_consistency():
    """interpret=True under jit (compiled interpretation) stays consistent."""
    p = PARAMS[0]
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 128).astype(np.float32))
    v0 = jnp.zeros((8, 128), jnp.float32)

    fn = jax.jit(lambda x, v0: lif_scan_pallas(x, v0, p, True))
    s1, v1 = fn(x, v0)
    s2, v2 = lif_scan(x, p, v0)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_bf16_currents_match_scan():
    """Mixed precision: bf16 currents stream through both paths; membrane
    math stays fp32 — the two implementations must agree exactly."""
    p = PARAMS[0]
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 2, 32, 128).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v0 = jnp.zeros((2, 32, 128), jnp.float32)
    s_ref, v_ref = lif_scan(x, p, v0)
    s_pal, v_pal = lif_scan_pallas(x, v0, p, True)
    assert s_pal.dtype == jnp.bfloat16 and v_pal.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(s_pal, dtype=np.float32), np.asarray(s_ref, dtype=np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(v_pal), np.asarray(v_ref), atol=1e-5
    )

    # Gradient path with bf16 cotangents.
    def loss_pal(x):
        s, v = lif_scan_pallas(x, v0, p, True)
        return jnp.sum(s.astype(jnp.float32)) + jnp.sum(v**2)

    def loss_ref(x):
        s, v = lif_scan(x, p, v0)
        return jnp.sum(s.astype(jnp.float32)) + jnp.sum(v**2)

    g_pal = jax.grad(loss_pal)(x)
    g_ref = jax.grad(loss_ref)(x)
    assert g_pal.dtype == jnp.bfloat16
    # The Pallas path stores its v_pre residuals in bf16 (half the BPTT
    # residual traffic); quantization through the steep surrogate perturbs
    # gradients by <1% relative — fine for surrogate-gradient training.
    d = np.abs(
        np.asarray(g_pal, np.float32) - np.asarray(g_ref, np.float32)
    )
    scale = np.abs(np.asarray(g_ref, np.float32)).max()
    assert d.max() <= 0.02 * scale
    assert d.mean() <= 1e-3 * scale
