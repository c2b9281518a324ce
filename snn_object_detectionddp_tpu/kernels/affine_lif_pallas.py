"""Fused per-sample affine (GroupNorm normalize) + LIF temporal scan kernel.

Second step toward the north-star Conv+LIF fusion (BASELINE.json): the
spiking block's chain conv -> GroupNorm -> LIF previously materialized the
normalized tensor to HBM (one full write + one full read of a
(T*B, H, W, C) tensor) between the GN normalize pass and the LIF kernel.
Here GroupNorm is split:

- *statistics* (mean/rstd per (t, b, group) — a cheap reduction) stay in
  XLA, composed into per-channel scale/shift  a = rstd*gamma,
  b = beta - mean*rstd*gamma  of shape (T, B, C);
- the *normalize pass is fused into the LIF time loop*: this kernel reads
  the raw conv output once, applies  y = x*a + b  in VMEM, and runs the
  full T-step membrane update with the membrane resident in VMEM — the
  normalized tensor never exists in HBM.

Autodiff: the kernel's custom VJP returns (dx, da, db, dv0); a and b are
ordinary XLA-traced functions of (x, gamma, beta), so the GroupNorm
statistics' gradient path composes automatically via the chain rule — no
hand-written GN backward.

Layout: (T, B, H, W, C) is viewed as (T, B, H, W*C) with W*C as the lane
axis (must be a multiple of 128 — true for every backbone shape; the
wrapper falls back to the XLA path otherwise). This view is a contiguous
reshape — no copy — and the H axis is tiled by an exact divisor
(pick_tiles), never padded: a jnp.pad + unpad-slice of the multi-hundred-MB
activation costs more than the fusion saves (measured). The scale/shift
rows are pre-tiled W times to (T, B, 1, W*C) (the singleton keeps the
block's last-two-dims Mosaic-legal at any batch size) so the kernel's
elementwise multiply is lane-aligned. Grid is (B, lane-chunks, row-tiles)
— row-tiles innermost so the da/db accumulator blocks stay resident across
row steps.

Equivalence with the XLA path is tested in tests/test_affine_lif.py.
Reference counterpart of the fused chain: model.py:9-18 (ConvBlock) driven
frame-by-frame by train.py:64-66.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.lif import LIFParams

LANE = 128
# VMEM budget per (x, s, vpre, gs, gx) time-block. Up to 4 such blocks are
# live at once (bwd: vpre, x, gs in + gx out), each double-buffered by the
# pipeline, plus fp32 membrane/accumulator blocks — 1 MB/block keeps the
# total comfortably under the 16 MB VMEM limit (2 MB overflowed it).
_CHUNK_BUDGET_BYTES = 1024 * 1024


def pick_tiles(
    h: int, wc: int, t_steps: int, itemsize: int = 2
) -> tuple[int, int] | None:
    """(tile_h, chunk) for the (T, B, H, WC) block grid, chosen so the whole
    H axis divides exactly — padding H would force a full pad copy + output
    slice of a multi-hundred-MB tensor, which costs more than the kernel
    saves. Mosaic accepts block dim -2 values that are multiples of 8 OR
    equal to the array dim, so odd H (60, 30, 15) runs with tile_h == H.

    ``itemsize`` is x's element size: the budget is in bytes, so fp32
    inputs get half the elements of bf16. Returns None when even the
    smallest legal block busts the budget (very large T*H*itemsize) —
    callers must then take the XLA path instead of failing in Mosaic with
    a scoped-vmem error at compile time."""
    budget_elems = max(LANE, _CHUNK_BUDGET_BYTES // (t_steps * itemsize))
    tiles_h = [d for d in range(8, h + 1, 8) if h % d == 0] or [h]
    best = None
    best_sz = 0
    d = wc // LANE
    for th in tiles_h:
        for k in range(1, d + 1):
            if d % k:
                continue
            chunk = LANE * k
            sz = th * chunk
            if sz <= budget_elems and sz > best_sz:
                best, best_sz = (th, chunk), sz
    return best


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, a_ref, b_ref, v0_ref, s_ref, vfin_ref, *, t_steps, p):
    v = v0_ref[0]  # (TILE_H, CHUNK) fp32
    for t in range(t_steps):
        cur = x_ref[t, 0].astype(jnp.float32) * a_ref[t, 0] + b_ref[t, 0]
        v_pre = p.decay * v + cur
        s = (v_pre >= p.threshold).astype(jnp.float32)
        s_ref[t, 0] = s.astype(s_ref.dtype)
        if p.reset == "soft":
            v = v_pre - s * p.threshold
        else:
            v = v_pre * (1.0 - s)
    vfin_ref[0] = v


def _fwd_res_kernel(
    x_ref, a_ref, b_ref, v0_ref, s_ref, vpre_ref, vfin_ref, *, t_steps, p
):
    v = v0_ref[0]
    for t in range(t_steps):
        cur = x_ref[t, 0].astype(jnp.float32) * a_ref[t, 0] + b_ref[t, 0]
        v_pre = p.decay * v + cur
        s = (v_pre >= p.threshold).astype(jnp.float32)
        s_ref[t, 0] = s.astype(s_ref.dtype)
        # The residual is stored in the activation dtype (bf16 on the real
        # path): an fp32 residual would double the HBM write volume of the
        # fused forward. With the default soft reset the backward is a
        # smooth function of v_pre, so the rounding perturbs gradients by
        # O(bf16 eps) — bounded in test_bf16_gradients_tolerance.
        vpre_ref[t, 0] = v_pre.astype(vpre_ref.dtype)
        if p.reset == "soft":
            v = v_pre - s * p.threshold
        else:
            v = v_pre * (1.0 - s)
    vfin_ref[0] = v


def _specs(t_steps, tile_h, chunk):
    # Grid (B, lane-chunk j, row-tile i); i innermost.
    x_blk = pl.BlockSpec(
        (t_steps, 1, tile_h, chunk),
        lambda b, j, i: (0, b, i, j),
        memory_space=pltpu.VMEM,
    )
    # a/b ride as (T, B, 1, WC): the singleton axis makes the block's last
    # two dims (1, chunk) satisfy Mosaic's layout rule (dim -2 equals the
    # array's, dim -1 a 128-multiple) for any batch size.
    ab_blk = pl.BlockSpec(
        (t_steps, 1, 1, chunk),
        lambda b, j, i: (0, b, 0, j),
        memory_space=pltpu.VMEM,
    )
    v_blk = pl.BlockSpec(
        (1, tile_h, chunk), lambda b, j, i: (b, i, j), memory_space=pltpu.VMEM
    )
    return x_blk, ab_blk, v_blk


def _tiles_or_raise(h, wc, t_steps, itemsize):
    tiles = pick_tiles(h, wc, t_steps, itemsize)
    if tiles is None:
        raise ValueError(
            f"affine_lif_pallas: no block fits the VMEM budget for "
            f"H={h}, WC={wc}, T={t_steps}, itemsize={itemsize} — gate on "
            f"supported(shape, dtype) and use affine_lif_xla instead"
        )
    return tiles


def _run_fwd(x4, a3, b3, v03, p: LIFParams, interpret, with_residuals):
    t_steps, bsz, h, wc = x4.shape
    tile_h, chunk = _tiles_or_raise(h, wc, t_steps, x4.dtype.itemsize)
    grid = (bsz, wc // chunk, h // tile_h)
    x_blk, ab_blk, v_blk = _specs(t_steps, tile_h, chunk)
    if with_residuals:
        return pl.pallas_call(
            partial(_fwd_res_kernel, t_steps=t_steps, p=p),
            grid=grid,
            in_specs=[x_blk, ab_blk, ab_blk, v_blk],
            out_specs=(x_blk, x_blk, v_blk),
            out_shape=(
                jax.ShapeDtypeStruct(x4.shape, x4.dtype),  # spikes
                jax.ShapeDtypeStruct(x4.shape, x4.dtype),  # v_pre residual
                jax.ShapeDtypeStruct(v03.shape, jnp.float32),
            ),
            interpret=interpret,
        )(x4, a3, b3, v03)
    s, vfin = pl.pallas_call(
        partial(_fwd_kernel, t_steps=t_steps, p=p),
        grid=grid,
        in_specs=[x_blk, ab_blk, ab_blk, v_blk],
        out_specs=(x_blk, v_blk),
        out_shape=(
            jax.ShapeDtypeStruct(x4.shape, x4.dtype),
            jax.ShapeDtypeStruct(v03.shape, jnp.float32),
        ),
        interpret=interpret,
    )(x4, a3, b3, v03)
    return s, None, vfin


# ---------------------------------------------------------------------------
# Backward: surrogate BPTT in reverse time + affine gradients
# ---------------------------------------------------------------------------


def _bwd_kernel(
    vpre_ref,
    x_ref,
    a_ref,
    gs_ref,
    gvfin_ref,
    gx_ref,
    gv0_ref,
    da_ref,
    db_ref,
    *,
    t_steps,
    p,
):
    i = pl.program_id(2)  # row-tile index (innermost)

    @pl.when(i == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    gv = gvfin_ref[0]  # fp32 (TILE_H, CHUNK)
    for t in range(t_steps - 1, -1, -1):
        v_pre = vpre_ref[t, 0].astype(jnp.float32)
        shifted = v_pre - p.threshold
        sur = 1.0 / jnp.square(p.surrogate_slope * jnp.abs(shifted) + 1.0)
        if p.reset == "soft":
            dpost_dpre = 1.0 - p.threshold * sur
        else:
            s = (shifted >= 0).astype(jnp.float32)
            dpost_dpre = (1.0 - s) - v_pre * sur
        g_cur = gv * dpost_dpre + gs_ref[t, 0].astype(jnp.float32) * sur
        gx_ref[t, 0] = (g_cur * a_ref[t, 0]).astype(gx_ref.dtype)
        da_ref[t, 0] += jnp.sum(
            g_cur * x_ref[t, 0].astype(jnp.float32), axis=0, keepdims=True
        )
        db_ref[t, 0] += jnp.sum(g_cur, axis=0, keepdims=True)
        gv = p.decay * g_cur
    gv0_ref[0] = gv


def _run_bwd(vpre4, x4, a3, gs4, gvfin3, p: LIFParams, interpret):
    t_steps, bsz, h, wc = x4.shape
    tile_h, chunk = _tiles_or_raise(h, wc, t_steps, x4.dtype.itemsize)
    grid = (bsz, wc // chunk, h // tile_h)
    x_blk, ab_blk, v_blk = _specs(t_steps, tile_h, chunk)
    return pl.pallas_call(
        partial(_bwd_kernel, t_steps=t_steps, p=p),
        grid=grid,
        in_specs=[x_blk, x_blk, ab_blk, x_blk, v_blk],
        out_specs=(x_blk, v_blk, ab_blk, ab_blk),
        out_shape=(
            jax.ShapeDtypeStruct(x4.shape, x4.dtype),  # g_x
            jax.ShapeDtypeStruct(gvfin3.shape, jnp.float32),  # g_v0
            jax.ShapeDtypeStruct(a3.shape, jnp.float32),  # da (row-summed)
            jax.ShapeDtypeStruct(a3.shape, jnp.float32),  # db
        ),
        interpret=interpret,
    )(vpre4, x4, a3, gs4, gvfin3)


# ---------------------------------------------------------------------------
# custom_vjp wrapper on (T, B, H, W, C)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def affine_lif_pallas(
    x_t: jnp.ndarray,  # (T, B, H, W, C) raw conv outputs
    a: jnp.ndarray,  # (T, B, C) fp32 scale
    b: jnp.ndarray,  # (T, B, C) fp32 shift
    v0: jnp.ndarray,  # (B, H, W, C) fp32 membrane
    p: LIFParams,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """spikes, v_final = LIF(scan over t of x*a+b). Requires W*C % 128 == 0
    (use :func:`supported` to pre-check; callers fall back to the XLA path)."""
    s, _, vfin = _fwd_core(x_t, a, b, v0, p, interpret, False)
    return s, vfin


def supported(shape: tuple[int, ...], dtype=jnp.bfloat16) -> bool:
    """Lane rule AND a VMEM-budget fit for this dtype/T: when no legal
    block fits the budget the kernel would fail at Mosaic compile time
    ("scoped vmem limit exceeded"), so callers route to the XLA path."""
    t, bsz, h, w, c = shape
    if (w * c) % LANE != 0:
        return False
    return pick_tiles(h, w * c, t, jnp.dtype(dtype).itemsize) is not None


def _prep(x_t, a, b, v0):
    t, bsz, h, w, c = x_t.shape
    x4 = x_t.reshape(t, bsz, h, w * c)  # contiguous view — no copy
    v03 = v0.astype(jnp.float32).reshape(bsz, h, w * c)
    a3 = jnp.tile(a.astype(jnp.float32), (1, 1, w))[:, :, None]
    b3 = jnp.tile(b.astype(jnp.float32), (1, 1, w))[:, :, None]
    return x4, a3, b3, v03


def _fwd_core(x_t, a, b, v0, p, interpret, with_residuals):
    x4, a3, b3, v03 = _prep(x_t, a, b, v0)
    s4, vpre4, vfin3 = _run_fwd(x4, a3, b3, v03, p, interpret, with_residuals)
    return s4.reshape(x_t.shape), vpre4, vfin3.reshape(v0.shape)


def _vjp_fwd(x_t, a, b, v0, p, interpret):
    s, vpre4, vfin = _fwd_core(x_t, a, b, v0, p, interpret, True)
    return (s, vfin), (vpre4, x_t, a, v0.shape)


def _vjp_bwd(p, interpret, residuals, cotangents):
    vpre4, x_t, a, v0_shape = residuals
    g_s, g_vfin = cotangents
    t, bsz, h, w, c = x_t.shape
    x4 = x_t.reshape(t, bsz, h, w * c)
    a3 = jnp.tile(a.astype(jnp.float32), (1, 1, w))[:, :, None]
    gs4 = g_s.reshape(t, bsz, h, w * c)
    gvfin3 = g_vfin.astype(jnp.float32).reshape(bsz, h, w * c)

    gx4, gv03, da3, db3 = _run_bwd(vpre4, x4, a3, gs4, gvfin3, p, interpret)
    g_x = gx4.reshape(x_t.shape)
    g_v0 = gv03.reshape(v0_shape).astype(g_vfin.dtype)
    # Row-summed (over H) lane gradients -> fold the W tiling back to C.
    g_a = da3.reshape(t, bsz, w, c).sum(axis=2).astype(a.dtype)
    g_b = db3.reshape(t, bsz, w, c).sum(axis=2).astype(a.dtype)
    return g_x, g_a, g_b, g_v0


affine_lif_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# XLA reference path (CPU fallback + equivalence oracle)
# ---------------------------------------------------------------------------


def affine_lif_xla(x_t, a, b, v0, p: LIFParams):
    """Same math via broadcast + lax.scan (models/lif.lif_scan). Matches the
    kernel's precision semantics: the normalized current feeds the membrane
    in fp32 (never rounded to bf16); only the spike outputs carry x's dtype."""
    from ..models.lif import lif_scan

    cur = x_t.astype(jnp.float32) * a[:, :, None, None, :] + b[:, :, None, None, :]
    spikes, v_fin = lif_scan(cur, p, v0)
    return spikes.astype(x_t.dtype), v_fin
