"""Equivalence tests for the fused affine+LIF Pallas kernel
(kernels/affine_lif_pallas.py) against the XLA reference path, forward and
backward, in interpret mode (CPU) — the same strategy as tests/test_pallas.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_object_detectionddp_tpu.kernels.affine_lif_pallas import (
    affine_lif_pallas,
    affine_lif_xla,
    pick_tiles,
    supported,
)
from snn_object_detectionddp_tpu.models.lif import LIFParams

PARAMS = [
    LIFParams(threshold=1.0, decay=0.05, surrogate_slope=4.0, reset="soft"),
    LIFParams(threshold=0.7, decay=0.9, surrogate_slope=2.0, reset="hard"),
]
# (T, B, H, W, C) with W*C % 128 == 0; H deliberately not a TILE_H multiple
# in one case to exercise row padding.
SHAPES = [(3, 2, 16, 8, 16), (4, 1, 10, 4, 32), (2, 2, 32, 2, 64)]


def _inputs(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    t, b, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape) * 1.2, dtype)
    a = jnp.asarray(1.0 + 0.3 * rng.randn(t, b, c), jnp.float32)
    bb = jnp.asarray(0.2 * rng.randn(t, b, c), jnp.float32)
    v0 = jnp.asarray(rng.randn(b, h, w, c) * 0.3, jnp.float32)
    return x, a, bb, v0


@pytest.mark.parametrize("p", PARAMS)
@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(p, shape):
    x, a, b, v0 = _inputs(shape, jnp.float32)
    s_ref, v_ref = affine_lif_xla(x, a, b, v0, p)
    s_k, v_k = affine_lif_pallas(x, a, b, v0, p, True)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref), atol=1e-5)


@pytest.mark.parametrize("p", PARAMS)
def test_backward_matches_xla(p):
    shape = (3, 2, 10, 4, 32)
    x, a, b, v0 = _inputs(shape, jnp.float32, seed=1)

    def loss_ref(x, a, b, v0):
        s, v = affine_lif_xla(x, a, b, v0, p)
        return jnp.sum(s * 0.7) + jnp.sum(v * 1.3)

    def loss_k(x, a, b, v0):
        s, v = affine_lif_pallas(x, a, b, v0, p, True)
        return jnp.sum(s * 0.7) + jnp.sum(v * 1.3)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, a, b, v0)
    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, a, b, v0)
    for name, gr, gk in zip(("dx", "da", "db", "dv0"), g_ref, g_k):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), atol=2e-5, err_msg=name
        )


def test_bf16_currents():
    p = PARAMS[0]
    shape = (4, 1, 16, 4, 32)
    x, a, b, v0 = _inputs(shape, jnp.bfloat16, seed=2)
    s_ref, v_ref = affine_lif_xla(x, a, b, v0, p)
    s_k, v_k = affine_lif_pallas(x, a, b, v0, p, True)
    assert s_k.dtype == jnp.bfloat16
    # bf16 rounding of the affine output can flip knife-edge threshold
    # crossings; require near-total agreement instead of exact.
    agree = np.mean(
        np.asarray(s_k, np.float32) == np.asarray(s_ref, np.float32)
    )
    assert agree > 0.999
    np.testing.assert_allclose(
        np.asarray(v_k), np.asarray(v_ref), atol=1e-2
    )


def test_supported_and_chunking():
    assert supported((4, 1, 120, 160, 48))  # stem1: W*C = 7680
    assert supported((4, 1, 15, 20, 512))
    assert not supported((4, 1, 8, 10, 12))  # 120 lanes
    # Every backbone (H, WC, T): tiles must divide exactly (no padding) and
    # the bf16 time-block must fit the VMEM budget.
    for h, wc, t in (
        (120, 7680, 4),
        (120, 15360, 4),
        (60, 10240, 4),
        (30, 10240, 16),
        (15, 10240, 5),
        (7, 128, 2),
    ):
        tile_h, chunk = pick_tiles(h, wc, t)
        assert chunk % 128 == 0 and wc % chunk == 0
        assert h % tile_h == 0
        assert tile_h % 8 == 0 or tile_h == h
        assert t * tile_h * chunk * 2 <= 4 * 1024 * 1024


def test_spiking_conv_block_matches_legacy_groupnorm():
    """The split-GN SpikingConvBlock must compute exactly what the previous
    conv -> nn.GroupNorm(eps=1e-6) -> run_lif composition computed (fp32)."""
    from flax import linen as nn

    from snn_object_detectionddp_tpu.models.layers import (
        SpikingConvBlock,
        _num_groups,
    )
    from snn_object_detectionddp_tpu.models.lif import lif_scan

    p = LIFParams(threshold=1.0, decay=0.05, surrogate_slope=4.0, reset="soft")
    t, b, h, w, cin, cout = 2, 2, 8, 8, 16, 32
    rng = np.random.RandomState(0)
    x_t = jnp.asarray(rng.randn(t, b, h, w, cin), jnp.float32)

    block = SpikingConvBlock(cout, p, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x_t)["params"]
    s_new, v_new = block.apply({"params": params}, x_t)

    # Legacy composition with identical conv kernel + GN affine params.
    conv = nn.Conv(cout, (3, 3), padding="SAME", use_bias=False,
                   dtype=jnp.float32, param_dtype=jnp.float32)
    gn = nn.GroupNorm(num_groups=_num_groups(cout), epsilon=1e-6,
                      dtype=jnp.float32)
    y = conv.apply({"params": params["Conv_0"]}, x_t.reshape(t * b, h, w, cin))
    y = gn.apply(
        {"params": {"scale": params["gn_scale"], "bias": params["gn_bias"]}},
        y,
    )
    s_ref, v_ref = lif_scan(y.reshape(t, b, h, w, cout), p)

    np.testing.assert_allclose(np.asarray(s_new), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref), atol=1e-5)


def test_bf16_gradients_tolerance():
    """ADVICE r2: the v_pre residual is stored in the activation dtype, so
    on the bf16 path the backward recomputes the surrogate from a rounded
    v_pre. With the default SOFT reset the backward is a smooth function of
    v_pre (no recomputed spike indicator), so bf16 rounding perturbs
    gradients by O(bf16 eps), never O(1) — this test documents and bounds
    the accepted mismatch vs the fp32-exact XLA backward."""
    p = PARAMS[0]  # soft reset (the production default)
    assert p.reset == "soft"
    shape = (4, 2, 16, 4, 32)
    x, a, b, v0 = _inputs(shape, jnp.bfloat16, seed=3)
    # fp32-exact reference: same bf16 inputs, XLA path (fp32 internal).
    def loss_ref(x, a, b, v0):
        s, v = affine_lif_xla(x, a, b, v0, p)
        return jnp.sum(s.astype(jnp.float32) * 0.7) + jnp.sum(v * 1.3)

    def loss_k(x, a, b, v0):
        s, v = affine_lif_pallas(x, a, b, v0, p, True)
        return jnp.sum(s.astype(jnp.float32) * 0.7) + jnp.sum(v * 1.3)

    g_ref = jax.grad(loss_ref, argnums=(1, 2, 3))(x, a, b, v0)
    g_k = jax.grad(loss_k, argnums=(1, 2, 3))(x, a, b, v0)
    for name, gr, gk in zip(("da", "db", "dv0"), g_ref, g_k):
        gr, gk = np.asarray(gr, np.float32), np.asarray(gk, np.float32)
        denom = max(np.abs(gr).max(), 1e-6)
        assert np.abs(gk - gr).max() / denom < 0.05, name


def test_budget_overflow_routes_to_xla():
    """ADVICE r2: when no legal block fits the VMEM budget (huge T*H for
    fp32), pick_tiles returns None and supported() must say False so
    run_affine_lif takes the XLA path instead of dying in Mosaic."""
    # T=512 fp32: smallest block 8*128 elems * 512 steps * 4 B = 2 MB > 1 MB.
    assert pick_tiles(8, 128, 512, itemsize=4) is None
    assert not supported((512, 1, 8, 1, 128), jnp.float32)
    # Same geometry in bf16 with small T fits fine.
    assert pick_tiles(8, 128, 4, itemsize=2) is not None
    assert supported((4, 1, 8, 1, 128), jnp.bfloat16)
    # The dispatcher actually runs (XLA fallback) on the unsupported shape.
    from snn_object_detectionddp_tpu.models.lif import run_affine_lif

    t, b, h, w, c = 512, 1, 8, 1, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(t, b, h, w, c), jnp.float32)
    a = jnp.ones((t, b, c), jnp.float32)
    bb = jnp.zeros((t, b, c), jnp.float32)
    s, v = run_affine_lif(x, a, bb, PARAMS[0])
    assert s.shape == x.shape and np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("p", PARAMS)
@pytest.mark.parametrize("shape", SHAPES)
def test_unrolled_matches_xla(p, shape):
    """The layout-preserving unrolled path (models/lif.affine_lif_unrolled,
    the TPU default since round 3) computes the identical recurrence."""
    from snn_object_detectionddp_tpu.models.lif import affine_lif_unrolled

    x, a, b, v0 = _inputs(shape, jnp.bfloat16)
    s_ref, v_ref = affine_lif_xla(x, a, b, v0, p)
    s_u, v_u = affine_lif_unrolled(x, a, b, p, v0)
    assert s_u.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(s_u), np.asarray(s_ref))
    np.testing.assert_allclose(np.asarray(v_u), np.asarray(v_ref), atol=1e-5)


def test_unrolled_backward_matches_xla():
    from snn_object_detectionddp_tpu.models.lif import affine_lif_unrolled

    p = PARAMS[0]
    shape = (3, 2, 10, 4, 32)
    x, a, b, v0 = _inputs(shape, jnp.float32, seed=2)

    def loss(f):
        def L(x, a, b, v0):
            s, v = f(x, a, b, v0)
            return jnp.sum(s * 0.7) + jnp.sum(v * 1.3)

        return jax.grad(L, argnums=(0, 1, 2, 3))(x, a, b, v0)

    g_ref = loss(lambda x, a, b, v0: affine_lif_xla(x, a, b, v0, p))
    g_u = loss(lambda x, a, b, v0: affine_lif_unrolled(x, a, b, p, v0))
    for name, gr, gu in zip(("dx", "da", "db", "dv0"), g_ref, g_u):
        np.testing.assert_allclose(
            np.asarray(gu), np.asarray(gr), atol=2e-5, err_msg=name
        )


@pytest.mark.parametrize("with_readouts", [False, True])
@pytest.mark.parametrize("shape", SHAPES)
def test_manual_vjp_matches_unrolled(shape, with_readouts):
    """The hand-written VJP path (models/lif.affine_lif_manual_tb, the
    round-5 backward lever) is primal-bit-exact vs the unrolled autodiff
    path and gradient-equivalent up to the bf16 rounding of its saved
    surrogate residual (MANUAL_SUR_DTYPE)."""
    from snn_object_detectionddp_tpu.models import lif as lif_mod
    from snn_object_detectionddp_tpu.models.lif import (
        affine_lif_manual_tb,
        affine_lif_unrolled_tb,
    )

    p = PARAMS[0]  # soft reset (manual path's contract)
    x, a, b, v0 = _inputs(shape, jnp.bfloat16, seed=4)
    t, bsz = shape[:2]
    x4 = x.reshape((t * bsz,) + shape[2:])

    out_ref = affine_lif_unrolled_tb(x4, a, b, p, v0, with_readouts)
    out_man = affine_lif_manual_tb(x4, a, b, p, v0, with_readouts)
    for name, r, m in zip(("spikes", "v_final", "reads"), out_ref, out_man):
        np.testing.assert_array_equal(
            np.asarray(m, np.float32), np.asarray(r, np.float32), err_msg=name
        )

    def make_loss(f):
        def L(x4, a, b, v0):
            out = f(x4, a, b, v0, p, with_readouts)
            tot = (
                jnp.sum(out[0].astype(jnp.float32) * 0.7)
                + jnp.sum(out[1] * 1.3)
            )
            if with_readouts:
                tot = tot + jnp.sum(out[2].astype(jnp.float32) * 0.4)
            return tot

        return jax.grad(L, argnums=(0, 1, 2, 3))(x4, a, b, v0)

    def wrap(fn):
        return lambda x4, a, b, v0, p, wr: fn(x4, a, b, p, v0, wr)

    g_ref = make_loss(wrap(affine_lif_unrolled_tb))
    # fp32 surrogate residual: gradients must match the autodiff path tightly.
    old = lif_mod.MANUAL_SUR_DTYPE
    try:
        lif_mod.MANUAL_SUR_DTYPE = jnp.float32
        g_man32 = make_loss(wrap(affine_lif_manual_tb))
    finally:
        lif_mod.MANUAL_SUR_DTYPE = old
    for name, gr, gm in zip(("dx", "da", "db", "dv0"), g_ref, g_man32):
        np.testing.assert_allclose(
            np.asarray(gm, np.float32),
            np.asarray(gr, np.float32),
            atol=2e-5,
            rtol=2e-5,
            err_msg=f"fp32-sur {name}",
        )
    # Default bf16 surrogate residual: O(bf16 eps) relative perturbation.
    g_man = make_loss(wrap(affine_lif_manual_tb))
    for name, gr, gm in zip(("dx", "da", "db", "dv0"), g_ref, g_man):
        gr = np.asarray(gr, np.float32)
        gm = np.asarray(gm, np.float32)
        denom = max(np.abs(gr).max(), 1e-6)
        assert np.abs(gm - gr).max() / denom < 0.02, name


@pytest.mark.parametrize("with_readouts", [False, True])
def test_fused_gn_lif_matches_split_block(with_readouts):
    """The fused GN+LIF custom VJP (models/lif.gn_lif_fused_tb, round-5
    lever #2) is primal-bit-exact vs the split stats+affine path at the
    block level, and its hand-written joint backward matches autodiff
    through the whole conv->GN->LIF stage (fp32-sur: tight; the bf16
    surrogate residual perturbs by O(bf16 eps))."""
    import jax

    from snn_object_detectionddp_tpu.models import lif as lif_mod
    from snn_object_detectionddp_tpu.models.layers import SpikingConvBlock
    from snn_object_detectionddp_tpu.models.lif import set_lif_impl

    p = PARAMS[0]
    t, b, h, w, cin, cout = 3, 2, 8, 8, 8, 32
    rng = np.random.RandomState(6)
    x_t = jnp.asarray(rng.randn(t, b, h, w, cin), jnp.float32)
    gs = jnp.asarray(rng.randn(t, b, h, w, cout), jnp.float32)
    gv = jnp.asarray(rng.randn(b, h, w, cout), jnp.float32)
    gr = jnp.asarray(rng.randn(t * b, h, w, cout), jnp.float32)

    blk = SpikingConvBlock(cout, p, dtype=jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x_t)["params"]

    def loss(params, x_t):
        out = blk.apply(
            {"params": params}, x_t, with_readouts=with_readouts
        )
        tot = jnp.sum(out[0] * gs) + jnp.sum(out[1] * gv)
        if with_readouts:
            tot = tot + jnp.sum(out[2] * gr)
        return tot

    def run():
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x_t)
        return float(v), g

    set_lif_impl("xla")
    try:
        v_ref, g_ref = run()
        set_lif_impl("fused")
        old = lif_mod.MANUAL_SUR_DTYPE
        lif_mod.MANUAL_SUR_DTYPE = jnp.float32
        try:
            v_f, g_f = run()
        finally:
            lif_mod.MANUAL_SUR_DTYPE = old
        v_f16, g_f16 = run()  # default bf16 surrogate residual
    finally:
        set_lif_impl("auto")

    # Primal: near-exact (same fp32 math; XLA may fuse/fma the readout
    # chain differently — observed 7e-8 relative on the readouts path).
    np.testing.assert_allclose(v_f, v_ref, rtol=1e-6)
    for (pa, a), bb in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree.leaves(g_f),
    ):
        name = jax.tree_util.keystr(pa)
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-4, rtol=2e-5,
            err_msg=f"fp32-sur {name}",
        )
    for a, bb in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f16)):
        a, bb = np.asarray(a), np.asarray(bb)
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(bb - a).max() / denom < 0.02


def test_manual_vjp_hard_reset_falls_back():
    """Hard reset has no hand-derived backward; the entry must delegate to
    the autodiff path (same values, gradients defined)."""
    from snn_object_detectionddp_tpu.models.lif import (
        affine_lif_manual_tb,
        affine_lif_unrolled_tb,
    )

    p = PARAMS[1]
    assert p.reset == "hard"
    shape = (3, 2, 8, 4, 16)
    x, a, b, v0 = _inputs(shape, jnp.float32, seed=5)
    t, bsz = shape[:2]
    x4 = x.reshape((t * bsz,) + shape[2:])
    s_ref, v_ref = affine_lif_unrolled_tb(x4, a, b, p, v0)
    s_m, v_m = affine_lif_manual_tb(x4, a, b, p, v0)
    np.testing.assert_array_equal(np.asarray(s_m), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(v_m), np.asarray(v_ref))


@pytest.mark.parametrize("shape", SHAPES)
def test_unrolled_tb_matches_5d(shape):
    """The 4D layout-preserving variant equals the 5D unrolled path."""
    from snn_object_detectionddp_tpu.models.lif import (
        affine_lif_unrolled,
        affine_lif_unrolled_tb,
    )

    p = PARAMS[0]
    x, a, b, v0 = _inputs(shape, jnp.bfloat16, seed=3)
    t, bsz = shape[:2]
    s5, v5 = affine_lif_unrolled(x, a, b, p, v0)
    s4, v4 = affine_lif_unrolled_tb(
        x.reshape((t * bsz,) + shape[2:]), a, b, p, v0
    )
    np.testing.assert_array_equal(
        np.asarray(s4), np.asarray(s5.reshape(s4.shape))
    )
    np.testing.assert_allclose(np.asarray(v4), np.asarray(v5), atol=1e-6)
