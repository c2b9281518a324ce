"""Fused LIF temporal scan as a Pallas TPU kernel.

The north-star kernel (BASELINE.json): Conv2d outputs for ALL timesteps are
produced by one big MXU-batched conv (models/layers.py); this kernel then
runs the *entire* T-step membrane update/threshold/reset with the membrane
potential resident in VMEM across timesteps — one HBM read of the currents,
one HBM write of the spikes, zero per-timestep membrane round-trips (the
XLA ``lax.scan`` path re-materializes the carry in HBM every step).

Backward is a second Pallas kernel implementing surrogate-gradient BPTT in
reverse time (SuperSpike derivative, matching models/lif.py), wired through
``jax.custom_vjp``. Residuals are the pre-reset membranes (same footprint
as what scan's reverse-mode would keep).

Dtype policy: currents/spikes/residuals stream through HBM in the input
dtype (bf16 in the standard mixed-precision config — half the memory
traffic of an fp32 pipeline); all membrane arithmetic inside the kernel is
fp32, and the carried state v is fp32, so recurrent precision never
degrades across timesteps.

Layout: any (T, ...) input is flattened to (T, R, 128) lanes, padded to
tile multiples, and tiled over rows; the time loop is a static Python
unroll inside the kernel (T is small: 2-16).

Validated against models/lif.lif_scan in tests/test_pallas.py (both
interpret mode and compiled), per SURVEY §4.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.lif import LIFParams

LANE = 128
# Rows per grid step (multiple of 16 for bf16 sublane tiling);
# VMEM use ~ 3 * T * TILE_R * 128 * 4 bytes.
TILE_R = 256


def _pad_rows(total: int) -> int:
    per_tile = TILE_R * LANE
    return -(-total // per_tile) * per_tile


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, v0_ref, s_ref, vfin_ref, *, t_steps, p):
    """Primal (inference) kernel: one HBM read (x), one write (spikes),
    membrane lives entirely in VMEM."""
    v = v0_ref[:]  # fp32
    for t in range(t_steps):
        v_pre = p.decay * v + x_ref[t].astype(jnp.float32)
        s = (v_pre >= p.threshold).astype(jnp.float32)
        s_ref[t] = s.astype(s_ref.dtype)
        if p.reset == "soft":
            v = v_pre - s * p.threshold
        else:
            v = v_pre * (1.0 - s)
    vfin_ref[:] = v


def _fwd_res_kernel(x_ref, v0_ref, s_ref, vpre_ref, vfin_ref, *, t_steps, p):
    """VJP-forward: additionally stores pre-reset membranes (input dtype)."""
    v = v0_ref[:]
    for t in range(t_steps):
        v_pre = p.decay * v + x_ref[t].astype(jnp.float32)
        s = (v_pre >= p.threshold).astype(jnp.float32)
        s_ref[t] = s.astype(s_ref.dtype)
        vpre_ref[t] = v_pre.astype(vpre_ref.dtype)
        if p.reset == "soft":
            v = v_pre - s * p.threshold
        else:
            v = v_pre * (1.0 - s)
    vfin_ref[:] = v


def _blocks(t_steps):
    time_block = pl.BlockSpec(
        (t_steps, TILE_R, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    state_block = pl.BlockSpec(
        (TILE_R, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return time_block, state_block


def _run_fwd(x3, v3, p: LIFParams, interpret: bool, with_residuals: bool):
    t_steps, rows, _ = x3.shape
    grid = (rows // TILE_R,)
    time_block, state_block = _blocks(t_steps)
    if with_residuals:
        out_shape = (
            jax.ShapeDtypeStruct(x3.shape, x3.dtype),  # spikes
            jax.ShapeDtypeStruct(x3.shape, x3.dtype),  # v_pre residuals
            jax.ShapeDtypeStruct(v3.shape, jnp.float32),  # v_final
        )
        return pl.pallas_call(
            partial(_fwd_res_kernel, t_steps=t_steps, p=p),
            grid=grid,
            in_specs=[time_block, state_block],
            out_specs=(time_block, time_block, state_block),
            out_shape=out_shape,
            interpret=interpret,
        )(x3, v3)
    out_shape = (
        jax.ShapeDtypeStruct(x3.shape, x3.dtype),  # spikes
        jax.ShapeDtypeStruct(v3.shape, jnp.float32),  # v_final
    )
    spikes, vfin = pl.pallas_call(
        partial(_fwd_kernel, t_steps=t_steps, p=p),
        grid=grid,
        in_specs=[time_block, state_block],
        out_specs=(time_block, state_block),
        out_shape=out_shape,
        interpret=interpret,
    )(x3, v3)
    return spikes, None, vfin


# ---------------------------------------------------------------------------
# Backward (reverse-time surrogate BPTT)
# ---------------------------------------------------------------------------


def _bwd_kernel(vpre_ref, gs_ref, gvfin_ref, gx_ref, gv0_ref, *, t_steps, p):
    gv = gvfin_ref[:].astype(jnp.float32)  # d loss / d v_post[t]
    for t in range(t_steps - 1, -1, -1):
        v_pre = vpre_ref[t].astype(jnp.float32)
        shifted = v_pre - p.threshold
        sur = 1.0 / jnp.square(p.surrogate_slope * jnp.abs(shifted) + 1.0)
        if p.reset == "soft":
            dpost_dpre = 1.0 - p.threshold * sur
        else:
            s = (shifted >= 0).astype(jnp.float32)
            dpost_dpre = (1.0 - s) - v_pre * sur
        g_vpre = gv * dpost_dpre + gs_ref[t].astype(jnp.float32) * sur
        gx_ref[t] = g_vpre.astype(gx_ref.dtype)
        gv = p.decay * g_vpre
    gv0_ref[:] = gv


def _run_bwd(vpre3, gs3, gvfin3, p: LIFParams, interpret: bool):
    t_steps, rows, _ = vpre3.shape
    grid = (rows // TILE_R,)
    time_block, state_block = _blocks(t_steps)
    out_shape = (
        jax.ShapeDtypeStruct(vpre3.shape, vpre3.dtype),  # g_x (input dtype)
        jax.ShapeDtypeStruct(gvfin3.shape, jnp.float32),  # g_v0
    )
    return pl.pallas_call(
        partial(_bwd_kernel, t_steps=t_steps, p=p),
        grid=grid,
        in_specs=[time_block, time_block, state_block],
        out_specs=(time_block, state_block),
        out_shape=out_shape,
        interpret=interpret,
    )(vpre3, gs3, gvfin3)


# ---------------------------------------------------------------------------
# custom_vjp wrapper on arbitrary (T, ...) shapes
# ---------------------------------------------------------------------------


def _to_lanes(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(T, ...) -> (T, R, 128) zero-padded; returns (arr, true_flat_size)."""
    t = x.shape[0]
    flat = x.reshape(t, -1)
    total = flat.shape[1]
    padded = _pad_rows(total)
    if padded != total:
        flat = jnp.pad(flat, ((0, 0), (0, padded - total)))
    return flat.reshape(t, padded // LANE, LANE), total


def _from_lanes(x3: jnp.ndarray, total: int, shape) -> jnp.ndarray:
    t = x3.shape[0]
    return x3.reshape(t, -1)[:, :total].reshape(shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lif_scan_pallas(
    x_t: jnp.ndarray,
    v0: jnp.ndarray,
    p: LIFParams,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused equivalent of :func:`models.lif.lif_scan`.

    Args: x_t (T, ...) currents in fp32 or bf16; v0 (...) fp32 membrane.
    Returns: (spikes (T, ...) in x's dtype, v_final (...) fp32).
    """
    spikes, _, v_fin = _fwd_core(x_t, v0, p, interpret, with_residuals=False)
    return spikes, v_fin


def _fwd_core(x_t, v0, p, interpret, with_residuals):
    x3, total = _to_lanes(x_t)
    v3, _ = _to_lanes(v0.astype(jnp.float32)[None])
    s3, vpre3, vfin3 = _run_fwd(x3, v3[0], p, interpret, with_residuals)
    spikes = _from_lanes(s3, total, x_t.shape)
    v_fin = _from_lanes(vfin3[None], total, (1,) + v0.shape)[0]
    return spikes, vpre3, v_fin


def _vjp_fwd(x_t, v0, p, interpret):
    spikes, vpre3, v_fin = _fwd_core(x_t, v0, p, interpret, with_residuals=True)
    return (spikes, v_fin), (vpre3, x_t.shape, v0.shape)


def _vjp_bwd(p, interpret, residuals, cotangents):
    vpre3, x_shape, v0_shape = residuals
    g_spikes, g_vfin = cotangents
    gs3, total = _to_lanes(g_spikes)
    gvfin3, _ = _to_lanes(g_vfin.astype(jnp.float32)[None])
    gx3, gv03 = _run_bwd(vpre3, gs3, gvfin3[0], p, interpret)
    g_x = _from_lanes(gx3, total, x_shape)
    g_v0 = _from_lanes(gv03[None], total, (1,) + v0_shape)[0].astype(
        g_vfin.dtype
    )
    return g_x, g_v0


lif_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
