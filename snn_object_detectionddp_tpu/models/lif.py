"""Leaky integrate-and-fire (LIF) neurons with surrogate-gradient BPTT.

This is the SNN realization of the reference's temporal recurrence (a
ConvLSTM hidden state carried across a frame window, reference:
model.py:50-71, train.py:64-66), per the rebuild north star: membrane
potential is the carried state, the spike nonlinearity is a Heaviside step
whose backward pass uses the SuperSpike fast-sigmoid surrogate
(Zenke & Ganguli; see PAPERS.md "Surrogate Gradient Learning in Spiking
Neural Networks"), wired in with ``jax.custom_vjp`` so ``lax.scan``'s native
reverse-mode gives BPTT through time for free.

Dynamics (per timestep, soft reset):
    v' = decay * v + x
    s  = H(v' - threshold)
    v  = v' - s * threshold

All functions are shape-polymorphic and jit/vmap/scan friendly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LIFParams(NamedTuple):
    """Static LIF neuron constants (config: model.spike).

    Defaults match ``config.SpikeConfig`` — the single source of truth.
    decay=0.05 is the validated default (commit cbc5ba3 A/B: val loss
    104.6 -> 51.8 vs decay=0.5); constructing ``LIFParams()`` directly must
    never silently reintroduce the known-bad hyperparameter.
    """

    threshold: float = 1.0
    decay: float = 0.05
    surrogate_slope: float = 4.0
    reset: str = "soft"  # "soft" | "hard"


# ---------------------------------------------------------------------------
# Spike nonlinearity with surrogate derivative
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def spike(v_shifted: jnp.ndarray, slope: float = 4.0) -> jnp.ndarray:
    """Heaviside step H(v - theta) with a SuperSpike surrogate gradient.

    Forward: 1.0 where ``v_shifted >= 0`` else 0.0.
    Backward: dS/dv = 1 / (slope * |v| + 1)^2.
    """
    return (v_shifted >= 0).astype(v_shifted.dtype)


def _spike_fwd(v_shifted, slope):
    return spike(v_shifted, slope), v_shifted


def _spike_bwd(slope, v_shifted, g):
    surrogate = 1.0 / jnp.square(slope * jnp.abs(v_shifted) + 1.0)
    return (g * surrogate,)


spike.defvjp(_spike_fwd, _spike_bwd)


def surrogate_grad(v_shifted: jnp.ndarray, slope: float) -> jnp.ndarray:
    """The surrogate derivative itself (used by the Pallas backward kernel)."""
    return 1.0 / jnp.square(slope * jnp.abs(v_shifted) + 1.0)


# ---------------------------------------------------------------------------
# LIF dynamics
# ---------------------------------------------------------------------------


def lif_step(
    v: jnp.ndarray, x: jnp.ndarray, p: LIFParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One membrane update. Returns (spikes, v_next). ``x`` is the synaptic
    current (e.g. a conv output) with the same shape as ``v``.

    Mixed precision: ``x`` may be bf16 while ``v`` stays fp32 — membrane
    arithmetic always runs in v's dtype; spikes come back in x's dtype.
    """
    v_pre = p.decay * v + x.astype(v.dtype)
    s = spike(v_pre - p.threshold, p.surrogate_slope)
    if p.reset == "soft":
        v_next = v_pre - s * p.threshold
    else:  # hard reset to zero
        v_next = v_pre * (1.0 - s)
    return s.astype(x.dtype), v_next


def lif_scan(
    x_t: jnp.ndarray,
    p: LIFParams,
    v0: jnp.ndarray | None = None,
    unroll: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run LIF dynamics over a leading time axis via ``lax.scan``.

    This is the XLA reference path for the fused Pallas kernel
    (kernels/lif_pallas.py); the two are tested for equivalence.

    Args:
      x_t: (T, ...) pre-activation currents for every timestep.
      v0:  (...) initial membrane, zeros when None (matching the reference's
           zero-init hidden state, reference: model.py:60-62).

    Returns:
      spikes (T, ...) and the final membrane (...,).
    """
    if v0 is None:
        v0 = jnp.zeros(x_t.shape[1:], dtype=jnp.float32)

    def body(v, x):
        s, v_next = lif_step(v, x, p)
        return v_next, s

    v_final, spikes = jax.lax.scan(body, v0, x_t, unroll=unroll)
    return spikes, v_final


# ---------------------------------------------------------------------------
# Implementation dispatch: XLA scan vs fused Pallas kernel
# ---------------------------------------------------------------------------

_LIF_IMPL = "auto"  # "auto" | "pallas" | "xla" | "unrolled"


def set_lif_impl(impl: str) -> None:
    """Select the LIF execution path (config: runtime.lif_kernel).

    "auto" uses the layout-preserving unrolled XLA path on TPU and the XLA
    scan elsewhere. "pallas" forces the fused Pallas kernel (round-2 path;
    kept selectable — it loses to "unrolled" because XLA custom calls force
    default operand layouts, inserting 3-4 full-activation layout copies
    per spiking layer around the conv's batch-minor layouts; measured
    ~14 ms/step of pure copy ops in the profiler). "xla" is the lax.scan
    reference path.
    """
    global _LIF_IMPL
    if impl not in ("auto", "pallas", "xla", "unrolled", "manual", "fused"):
        raise ValueError(f"unknown LIF impl '{impl}'")
    _LIF_IMPL = impl


def _step_readout(s: jnp.ndarray, v_next: jnp.ndarray, p: LIFParams) -> jnp.ndarray:
    """Per-step continuous readout: ``v_next + s*threshold`` — the same
    formula :func:`models.layers.membrane_readout` applies at the final
    step (pre-reset membrane under soft reset), evaluated at every step.
    Per-step readouts are what lets the U-Net decoder run on ALL timesteps
    of a chunk (all-steps streaming) with math identical to T chained
    single-step calls."""
    return v_next + s.astype(v_next.dtype) * p.threshold


def affine_lif_unrolled(
    x_t: jnp.ndarray,  # (T, B, H, W, C) raw conv outputs
    a: jnp.ndarray,  # (T, B, C) scale
    b: jnp.ndarray,  # (T, B, C) shift
    p: LIFParams,
    v0: jnp.ndarray | None = None,
    with_readouts: bool = False,
):
    """Normalize+LIF as straight-line unrolled elementwise ops.

    TPU-layout rationale: XLA lays out conv activations batch-minor on the
    lanes; any ``pallas_call``/custom-call boundary forces a conversion to
    default layout and back (full-HBM copies). Unrolling the short time
    loop (T<=8 after remat chunking) into pure elementwise ops lets XLA
    fuse the GroupNorm affine and the whole membrane recurrence into
    layout-agnostic loop fusions: the normalized current never
    materializes, no while-loop carry constraints, zero copies.

    ``with_readouts=True`` additionally returns the per-step continuous
    readouts (T, B, H, W, C) in x's dtype (see :func:`_step_readout`).
    """
    if v0 is None:
        v0 = jnp.zeros(x_t.shape[1:], dtype=jnp.float32)
    v = v0
    spikes = []
    reads = []
    for t in range(x_t.shape[0]):
        cur = (
            x_t[t].astype(jnp.float32) * a[t, :, None, None, :]
            + b[t, :, None, None, :]
        )
        s, v = lif_step(v, cur, p)
        spikes.append(s.astype(x_t.dtype))
        if with_readouts:
            reads.append(_step_readout(s, v, p).astype(x_t.dtype))
    if with_readouts:
        return jnp.stack(spikes), v, jnp.stack(reads)
    return jnp.stack(spikes), v


def affine_lif_unrolled_tb(
    x4: jnp.ndarray,  # (T*B, H, W, C) raw conv outputs, time-major
    a: jnp.ndarray,  # (T, B, C) scale
    b: jnp.ndarray,  # (T, B, C) shift
    p: LIFParams,
    v0: jnp.ndarray | None = None,  # (B, H, W, C)
    with_readouts: bool = False,
):
    """4D variant of :func:`affine_lif_unrolled` that never leaves the
    conv's (T*B, H, W, C) shape.

    The 5D (T, B, ...) round-trip between each conv and its LIF stage is
    not free on TPU: the conv output's batch-minor layout does not survive
    the dim-split reshape, so XLA inserts full-activation relayout copies
    (measured ~5 ms/step at the stem geometries). Slicing batch slabs out
    of the 4D tensor and concatenating the spike slabs back keeps one
    layout end-to-end — the slices and the concat fuse into the
    elementwise LIF fusions.

    ``with_readouts=True`` additionally returns per-step continuous
    readouts as a (T*B, H, W, C) tensor in x's dtype (kept 4D for the same
    layout reason).
    """
    t_steps, bsz = a.shape[0], a.shape[1]
    if v0 is None:
        v0 = jnp.zeros((bsz,) + x4.shape[1:], dtype=jnp.float32)
    v = v0
    spikes = []
    reads = []
    for t in range(t_steps):
        xt = jax.lax.slice_in_dim(x4, t * bsz, (t + 1) * bsz, axis=0)
        cur = (
            xt.astype(jnp.float32) * a[t, :, None, None, :]
            + b[t, :, None, None, :]
        )
        s, v = lif_step(v, cur, p)
        spikes.append(s.astype(x4.dtype))
        if with_readouts:
            reads.append(_step_readout(s, v, p).astype(x4.dtype))
    if with_readouts:
        return (
            jnp.concatenate(spikes, axis=0),
            v,
            jnp.concatenate(reads, axis=0),
        )
    return jnp.concatenate(spikes, axis=0), v


# ---------------------------------------------------------------------------
# Hand-written VJP for the fused affine+LIF stage (round-5 backward lever)
# ---------------------------------------------------------------------------

# Storage dtype for the surrogate residual saved by the manual-VJP path.
# bf16 halves the residual HBM traffic vs the fp32 v_shifted autodiff saves;
# the induced gradient perturbation is O(bf16 eps) on a smooth factor
# (bounded in tests/test_affine_lif.py). fp32 available for A/B.
MANUAL_SUR_DTYPE = jnp.bfloat16


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _affine_lif_manual(p, with_readouts, x4, a, b, v0):
    """affine_lif_unrolled_tb with a hand-written backward.

    Same primal math as :func:`affine_lif_unrolled_tb` (delegated when not
    differentiated). Under differentiation the forward additionally computes
    the SuperSpike surrogate factor and saves it (MANUAL_SUR_DTYPE) instead
    of letting autodiff save the fp32 pre-threshold membrane: the backward
    then runs a leaner chain — no abs/square/divide in the hot reverse
    fusions, half the residual bytes — measured against the ~32%-MFU
    backbone backward (BASELINE.md round-4 breakdown; reference hot loop:
    train.py:76-80). Soft reset only; the dispatcher falls back to the
    autodiff path for hard reset.
    """
    return affine_lif_unrolled_tb(x4, a, b, p, v0, with_readouts)


def _affine_lif_manual_fwd(p, with_readouts, x4, a, b, v0):
    t_steps, bsz = a.shape[0], a.shape[1]
    v = v0
    spikes = []
    reads = []
    surs = []
    for t in range(t_steps):
        xt = jax.lax.slice_in_dim(x4, t * bsz, (t + 1) * bsz, axis=0)
        cur = (
            xt.astype(jnp.float32) * a[t, :, None, None, :]
            + b[t, :, None, None, :]
        )
        v_pre = p.decay * v + cur
        sh = v_pre - p.threshold
        s = (sh >= 0).astype(jnp.float32)
        surs.append(
            (1.0 / jnp.square(p.surrogate_slope * jnp.abs(sh) + 1.0)).astype(
                MANUAL_SUR_DTYPE
            )
        )
        v = v_pre - s * p.threshold
        spikes.append(s.astype(x4.dtype))
        if with_readouts:
            # Bit-identical to _step_readout: v_next + s*theta in fp32.
            reads.append((v + s * p.threshold).astype(x4.dtype))
    spikes4 = jnp.concatenate(spikes, axis=0)
    res = (x4, a, jnp.concatenate(surs, axis=0))
    if with_readouts:
        return (spikes4, v, jnp.concatenate(reads, axis=0)), res
    return (spikes4, v), res


def _affine_lif_manual_bwd(p, with_readouts, res, cot):
    x4, a, sur4 = res
    if with_readouts:
        g_s4, g_vfin, g_r4 = cot
    else:
        g_s4, g_vfin = cot
        g_r4 = None
    t_steps, bsz = a.shape[0], a.shape[1]
    g_v = g_vfin.astype(jnp.float32)
    g_x = [None] * t_steps
    g_a = [None] * t_steps
    g_b = [None] * t_steps
    for t in reversed(range(t_steps)):
        sl = partial(
            jax.lax.slice_in_dim, start_index=t * bsz,
            limit_index=(t + 1) * bsz, axis=0,
        )
        g_out = sl(g_s4).astype(jnp.float32)
        sur = sl(sur4).astype(jnp.float32)
        # v_next = v_pre - s*theta; s = H(v_pre - theta) with dS/dv = sur:
        # g_vpre = g_v + sur*(g_out - theta*g_v) [+ g_read: reads == v_pre].
        g_vpre = g_v + sur * (g_out - p.threshold * g_v)
        if g_r4 is not None:
            g_vpre = g_vpre + sl(g_r4).astype(jnp.float32)
        xt = sl(x4).astype(jnp.float32)
        g_a[t] = jnp.sum(g_vpre * xt, axis=(1, 2))
        g_b[t] = jnp.sum(g_vpre, axis=(1, 2))
        g_x[t] = (g_vpre * a[t, :, None, None, :]).astype(x4.dtype)
        g_v = p.decay * g_vpre
    return (
        jnp.concatenate(g_x, axis=0),
        jnp.stack(g_a),
        jnp.stack(g_b),
        g_v,
    )


_affine_lif_manual.defvjp(_affine_lif_manual_fwd, _affine_lif_manual_bwd)


def affine_lif_manual_tb(
    x4: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    p: LIFParams,
    v0: jnp.ndarray | None = None,
    with_readouts: bool = False,
):
    """Manual-VJP entry with the affine_lif_unrolled_tb signature."""
    if p.reset != "soft":  # hard-reset backward not hand-derived; autodiff
        return affine_lif_unrolled_tb(x4, a, b, p, v0, with_readouts)
    if v0 is None:
        v0 = jnp.zeros((a.shape[1],) + x4.shape[1:], dtype=jnp.float32)
    return _affine_lif_manual(p, with_readouts, x4, a, b, v0)


# ---------------------------------------------------------------------------
# Fused GroupNorm+LIF VJP: hand-written backward for the WHOLE
# conv-output -> spikes stage (round-5 lever #2)
# ---------------------------------------------------------------------------

_GN_EPS = 1e-6  # must match models/layers.py split-GN epsilon


def _gn_stats2ab(s1, s2, gamma, beta, n, cg, t, b):
    """(tiny) group sums -> per-(t,b,channel) affine. Bit-identical ops to
    models/layers.SpikingConvBlock's split-GN block."""
    c = gamma.shape[0]
    mean = s1 / n
    mean2 = s2 / n
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + _GN_EPS)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(t, b, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(t, b, c)
    a = rstd_c * gamma
    bias = beta - mean_c * rstd_c * gamma
    return a, bias


def _gn_sums(x4, groups, cg, tb):
    """Group sums over the folded conv output — same op order as the block
    (spatial reduction first, channels on the lanes; group fold on the
    tiny result)."""
    xf = x4.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2)).reshape(tb, groups, cg).sum(axis=2)
    s2 = (
        jnp.sum(jnp.square(xf), axis=(1, 2))
        .reshape(tb, groups, cg)
        .sum(axis=2)
    )
    return s1, s2


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _gn_lif_fused(p, with_readouts, groups, tb, x4, gamma, beta, v0):
    """GroupNorm(stats+affine)+LIF over (T*B, H, W, C) with a hand-written
    joint backward.

    Extends :func:`_affine_lif_manual` to subsume the GN statistics chain
    (the round-5 attribution's next cost center: ~11 ms of the flagship
    backbone grad was the autodiff stats backward — repeat/segment-sum
    plumbing and extra full-tensor passes). The backward here is two lean
    passes per timestep (reduce, then emit), with the tiny stats->affine
    sub-chain differentiated by ``jax.vjp`` inside the backward — zero
    hand-derivation risk for the fiddly mean/var/rstd algebra, hand
    control where the bytes are. Reference hot loop: train.py:76-80.
    """
    t_steps, bsz = tb
    c = gamma.shape[0]
    cg = c // groups
    n = x4.shape[1] * x4.shape[2] * cg
    s1, s2 = _gn_sums(x4, groups, cg, t_steps * bsz)
    a, bias = _gn_stats2ab(s1, s2, gamma, beta, n, cg, t_steps, bsz)
    return affine_lif_unrolled_tb(x4, a, bias, p, v0, with_readouts)


def _gn_lif_fused_fwd(p, with_readouts, groups, tb, x4, gamma, beta, v0):
    t_steps, bsz = tb
    c = gamma.shape[0]
    cg = c // groups
    n = x4.shape[1] * x4.shape[2] * cg
    s1, s2 = _gn_sums(x4, groups, cg, t_steps * bsz)
    a, bias = _gn_stats2ab(s1, s2, gamma, beta, n, cg, t_steps, bsz)
    out, (_, _, sur4) = _affine_lif_manual_fwd(
        p, with_readouts, x4, a, bias, v0
    )
    return out, (x4, gamma, beta, s1, s2, a, sur4)


def _gn_lif_fused_bwd(p, with_readouts, groups, tb, res, cot):
    x4, gamma, beta, s1, s2, a, sur4 = res
    if with_readouts:
        g_s4, g_vfin, g_r4 = cot
    else:
        g_s4, g_vfin = cot
        g_r4 = None
    t_steps, bsz = tb
    c = gamma.shape[0]
    cg = c // groups
    n = x4.shape[1] * x4.shape[2] * cg

    def sl(arr, t):
        return jax.lax.slice_in_dim(arr, t * bsz, (t + 1) * bsz, axis=0)

    def g_cur_of(t, g_v):
        """G = dL/d cur at step t given the carried cotangent g_v."""
        g = g_v + sl(sur4, t).astype(jnp.float32) * (
            sl(g_s4, t).astype(jnp.float32) - p.threshold * g_v
        )
        if g_r4 is not None:
            g = g + sl(g_r4, t).astype(jnp.float32)
        return g

    # Pass 1 (reverse scan): per-step reductions SA = sum_HW G*x and
    # SB = sum_HW G — the cotangents of (a, bias).
    g_v = g_vfin.astype(jnp.float32)
    SA = [None] * t_steps
    SB = [None] * t_steps
    for t in reversed(range(t_steps)):
        G = g_cur_of(t, g_v)
        xt = sl(x4, t).astype(jnp.float32)
        SA[t] = jnp.sum(G * xt, axis=(1, 2))
        SB[t] = jnp.sum(G, axis=(1, 2))
        g_v = p.decay * G
    g_v0 = g_v
    g_a = jnp.stack(SA)  # (T, B, C) f32
    g_bias = jnp.stack(SB)

    # Tiny stats chain: exact autodiff of group-sums -> affine.
    _, pull = jax.vjp(
        lambda s1, s2, gamma, beta: _gn_stats2ab(
            s1, s2, gamma, beta, n, cg, t_steps, bsz
        ),
        s1, s2, gamma, beta,
    )
    g_s1, g_s2, g_gamma, g_beta = pull((g_a, g_bias))
    g_s1c = jnp.repeat(g_s1, cg, axis=1).reshape(t_steps, bsz, 1, 1, c)
    g_s2c = jnp.repeat(g_s2, cg, axis=1).reshape(t_steps, bsz, 1, 1, c)

    # Pass 2 (reverse scan, recomputing the same G chain): emit
    # g_x = a*G + ds1 + 2*x*ds2 in the conv's dtype and 4D layout.
    g_v = g_vfin.astype(jnp.float32)
    g_x = [None] * t_steps
    for t in reversed(range(t_steps)):
        G = g_cur_of(t, g_v)
        xt = sl(x4, t).astype(jnp.float32)
        g_x[t] = (
            G * a[t, :, None, None, :]
            + g_s1c[t]
            + 2.0 * xt * g_s2c[t]
        ).astype(x4.dtype)
        g_v = p.decay * G
    return jnp.concatenate(g_x, axis=0), g_gamma, g_beta, g_v0


_gn_lif_fused.defvjp(_gn_lif_fused_fwd, _gn_lif_fused_bwd)


def gn_lif_fused_tb(
    x4: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    p: LIFParams,
    v0: jnp.ndarray | None,
    groups: int,
    tb: tuple[int, int],
    with_readouts: bool = False,
):
    """Fused GN+LIF entry (models/layers.py dispatches here when the LIF
    impl resolves to "fused"). Soft reset only — callers fall back to the
    split path otherwise."""
    if v0 is None:
        v0 = jnp.zeros((tb[1],) + x4.shape[1:], dtype=jnp.float32)
    return _gn_lif_fused(p, with_readouts, groups, tb, x4, gamma, beta, v0)


def resolve_impl() -> str:
    """Effective LIF impl after 'auto' resolution (used by layer code)."""
    impl = _LIF_IMPL
    if impl == "auto":
        impl = "manual" if jax.default_backend() == "tpu" else "xla"
    return impl


def run_lif(
    x_t: jnp.ndarray, p: LIFParams, v0: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry used by the model layers."""
    impl = _LIF_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from ..kernels.lif_pallas import lif_scan_pallas  # lazy: avoid cycle

        if v0 is None:
            v0 = jnp.zeros(x_t.shape[1:], dtype=jnp.float32)
        return lif_scan_pallas(x_t, v0, p, False)
    return lif_scan(x_t, p, v0)


def run_affine_lif_tb(
    x4: jnp.ndarray,  # (T*B, H, W, C) raw conv outputs, time-major
    a: jnp.ndarray,  # (T, B, C) scale
    b: jnp.ndarray,  # (T, B, C) shift
    p: LIFParams,
    v0: jnp.ndarray | None = None,
    with_readouts: bool = False,
):
    """Layout-preserving dispatch on the conv's native 4D activation.

    Returns (spikes (T*B, H, W, C), v_final (B, H, W, C)) — plus, with
    ``with_readouts=True``, the per-step readouts (T*B, H, W, C). On the
    unrolled TPU path the 5D (T, B, ...) view never exists, so the conv's
    batch-minor layout flows straight through the LIF fusions (see
    affine_lif_unrolled_tb). Other impls reshape to the 5D contract.
    """
    impl = _LIF_IMPL
    if impl == "auto":
        # "manual" won the round-5 whole-model A/B on the v5e (grad
        # 182.4 -> 174.2 ms, step 187.9 -> 179.7 ms at flagship geometry;
        # BASELINE.md round-5 backward table). Identical primal math,
        # hand-written backward. CPU keeps the scan path (fast traces).
        impl = "manual" if jax.default_backend() == "tpu" else "xla"
    if impl in ("manual", "fused"):
        # "fused" subsumes the GN stats into the custom VJP at the layer
        # level (gn_lif_fused_tb); a caller reaching THIS entry with an
        # affine already in hand gets the affine-level manual path.
        return affine_lif_manual_tb(x4, a, b, p, v0, with_readouts)
    if impl == "unrolled":
        return affine_lif_unrolled_tb(x4, a, b, p, v0, with_readouts)
    t_steps, bsz = a.shape[0], a.shape[1]
    # Fold/unfold reshapes under a GSPMD spatial mesh carry explicit
    # sharding pins (no-ops otherwise) — see parallel.mesh.fold_sharding.
    from ..parallel.mesh import constrain_folded, constrain_tb

    x5 = constrain_tb(x4.reshape((t_steps, bsz) + x4.shape[1:]))
    out = run_affine_lif(x5, a, b, p, v0, with_readouts)
    if with_readouts:
        spikes, v_fin, reads = out
        return (
            constrain_folded(spikes.reshape(x4.shape)),
            v_fin,
            constrain_folded(reads.reshape(x4.shape)),
        )
    spikes, v_fin = out
    return constrain_folded(spikes.reshape(x4.shape)), v_fin


def run_affine_lif(
    x_t: jnp.ndarray,  # (T, B, H, W, C) raw conv outputs
    a: jnp.ndarray,  # (T, B, C) scale
    b: jnp.ndarray,  # (T, B, C) shift
    p: LIFParams,
    v0: jnp.ndarray | None = None,
    with_readouts: bool = False,
):
    """Dispatching entry for the fused normalize+LIF stage: on TPU (and
    lane-compatible shapes) the GroupNorm normalize pass runs inside the
    LIF kernel's time loop (kernels/affine_lif_pallas.py) — the normalized
    tensor never touches HBM. Elsewhere, the equivalent XLA broadcast+scan.

    ``with_readouts=True`` (all-steps decoding) is served by the unrolled /
    scan paths; the Pallas kernel does not emit per-step readouts and is
    rejected for that mode."""
    from ..kernels.affine_lif_pallas import (
        affine_lif_pallas,
        affine_lif_xla,
        supported,
    )

    if v0 is None:
        v0 = jnp.zeros(x_t.shape[1:], dtype=jnp.float32)
    impl = _LIF_IMPL
    if impl == "auto":
        impl = "unrolled" if jax.default_backend() == "tpu" else "xla"
    if with_readouts:
        if impl == "pallas":
            raise ValueError(
                "per-step readouts (all-steps decoding) require a non-Pallas "
                "LIF (runtime.lif_kernel auto|unrolled|xla)"
            )
        if impl == "unrolled":
            return affine_lif_unrolled(x_t, a, b, p, v0, with_readouts=True)
        cur = (
            x_t.astype(jnp.float32) * a[:, :, None, None, :]
            + b[:, :, None, None, :]
        )

        def body(v, c):
            s, v_next = lif_step(v, c, p)
            return v_next, (s, _step_readout(s, v_next, p))

        v_fin, (spikes, reads) = jax.lax.scan(body, v0, cur)
        return spikes.astype(x_t.dtype), v_fin, reads.astype(x_t.dtype)
    if impl == "unrolled":
        return affine_lif_unrolled(x_t, a, b, p, v0)
    if impl == "pallas" and supported(x_t.shape, x_t.dtype):
        return affine_lif_pallas(x_t, a, b, v0, p, False)
    return affine_lif_xla(x_t, a, b, v0, p)
