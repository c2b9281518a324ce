"""Building-block layers for the spiking temporal detector.

TPU-first design notes
----------------------
- Layout is NHWC throughout; time-major tensors are (T, B, H, W, C).
- Spiking blocks run *layer-major time-batched*: each conv is applied to all
  T timesteps at once as one (T*B, H, W, C) batch (big MXU matmuls), and only
  the cheap elementwise LIF membrane update is sequential in time
  (``lif_scan``, later fused into a Pallas kernel). This is mathematically
  identical to the reference's frame-by-frame Python loop
  (reference: train.py:64-66) because convolutions carry no temporal state.
- Convs compute in bfloat16 (params fp32); normalization and membrane
  dynamics run in fp32 for stability.
- Normalization is GroupNorm, not the reference's BatchNorm
  (reference: model.py:14): BN statistics leak across the time-batched axis
  and across data-parallel shards. Documented behavioral delta (SURVEY §7).

Reference counterparts: ConvBlock model.py:9-18, DownBlock :20-30,
UpBlock :32-48.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..parallel.mesh import constrain_folded, constrain_tb, constrain_tbc
from .lif import LIFParams, run_affine_lif_tb


def _num_groups(channels: int) -> int:
    """Largest group count <= 32 that divides ``channels``."""
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


def membrane_readout(
    spikes_t: jnp.ndarray, v_final: jnp.ndarray, p: LIFParams
) -> jnp.ndarray:
    """Continuous readout of a spiking block: last-step pre-reset membrane.

    With soft reset, v_pre = v_post + s * threshold exactly. The decoder and
    skip connections consume this instead of binary spikes so detection
    regression sees a continuous, history-integrating signal (the SNN
    analogue of the reference's ConvLSTM hidden state feeding the decoder,
    reference: model.py:131-146).
    """
    return v_final + spikes_t[-1] * p.threshold


class SpikingConvBlock(nn.Module):
    """Conv -> GroupNorm -> LIF over a (T, B, H, W, C) time-major tensor.

    Returns (spikes (T,B,H,W,Cout) in compute dtype, v_final (B,H,W,Cout)
    fp32 membrane). Pass ``v0`` to continue a streaming sequence.
    """

    features: int
    lif: LIFParams
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,
        v0: jnp.ndarray | None = None,
        with_readouts: bool = False,
    ):
        t, b = x_t.shape[:2]
        # constrain_folded: under a GSPMD data x spatial mesh this reshape
        # MUST carry an explicit sharding — the partitioner otherwise
        # double-counts the conv kernel gradient (see
        # parallel.mesh.fold_sharding). No-op everywhere else.
        x = constrain_folded(
            x_t.reshape((t * b,) + x_t.shape[2:]).astype(self.dtype)
        )
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        # Selective-remat anchor (training.remat_policy="save_conv"): under
        # chunked long-T remat the policy saves these MXU-expensive conv
        # outputs and recomputes only the cheap GN/LIF elementwise chain.
        # Free outside jax.checkpoint (the name op lowers away).
        x = checkpoint_name(x, "conv_out")
        # GroupNorm split for fusion (kernels/affine_lif_pallas.py): only the
        # cheap group statistics run here in XLA — one-pass moments
        # (E[x^2]-E[x]^2, flax convention), a single read of the conv
        # output. The normalize pass itself is folded into the LIF kernel
        # as a per-(t,b,channel) affine, so the normalized tensor never
        # round-trips HBM (the previous conv -> nn.GroupNorm -> run_lif
        # chain cost two extra full passes: normalize-read + write).
        # Same math as nn.GroupNorm(eps=1e-6) -> run_lif (equivalence-
        # tested in tests/test_affine_lif.py). Measured on the v5e chip:
        # train step 117.7 -> 110.4 ms, inference 39.6 -> 39.0 ms/batch.
        c = self.features
        groups = _num_groups(c)
        cg = c // groups
        gamma = self.param("gn_scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("gn_bias", nn.initializers.zeros, (c,), jnp.float32)
        from .lif import gn_lif_fused_tb, resolve_impl

        if resolve_impl() == "fused" and self.lif.reset == "soft":
            # Fused GN+LIF custom VJP (round-5 lever #2): the GroupNorm
            # statistics chain joins the hand-written backward; identical
            # math to the split path below (tests/test_affine_lif.py).
            out = gn_lif_fused_tb(
                x, gamma, beta, self.lif, v0, groups, (t, b),
                with_readouts=with_readouts,
            )
            if with_readouts:
                spikes4, v_final, reads4 = out
            else:
                (spikes4, v_final), reads4 = out, None
            spikes = constrain_tb(
                spikes4.reshape((t, b) + spikes4.shape[1:])
            )
            self.sow(
                "intermediates",
                "spike_rate",
                jnp.mean(spikes.astype(jnp.float32)),
            )
            if with_readouts:
                return spikes, v_final, reads4
            return spikes, v_final
        # Reduce over (H, W) FIRST, keeping channels on the minor (lane)
        # axis — reshaping the activation to (.., G, C/G) before the big
        # reduction puts an 8-wide dim on the lanes and ran at ~85-200 GB/s
        # on the v5e (profiler: ~15 ms/step of convert_reduce fusions).
        # The group fold then happens on the tiny (T*B, C) sums.
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(1, 2)).reshape(t * b, groups, cg).sum(axis=2)
        s2 = (
            jnp.sum(jnp.square(xf), axis=(1, 2))
            .reshape(t * b, groups, cg)
            .sum(axis=2)
        )
        n = x.shape[1] * x.shape[2] * cg
        mean = s1 / n  # (t*b, G)
        mean2 = s2 / n
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + 1e-6)
        mean_c = constrain_tbc(jnp.repeat(mean, cg, axis=1).reshape(t, b, c))
        rstd_c = constrain_tbc(jnp.repeat(rstd, cg, axis=1).reshape(t, b, c))
        a = rstd_c * gamma
        bias = beta - mean_c * rstd_c * gamma
        # Stay in the conv's 4D (T*B, H, W, C) shape through the LIF stage:
        # the 5D round-trip broke the conv's batch-minor layout and cost a
        # relayout copy on each side at stem geometries (run_affine_lif_tb).
        reads4 = None
        if with_readouts:
            # All-steps decoding: per-step continuous readouts, kept in the
            # conv's 4D (T*B, H, W, C) shape so the decoder consumes them
            # without a layout-breaking (T, B) dim split.
            spikes4, v_final, reads4 = run_affine_lif_tb(
                x, a, bias, self.lif, v0, with_readouts=True
            )
        else:
            spikes4, v_final = run_affine_lif_tb(x, a, bias, self.lif, v0)
        spikes = constrain_tb(spikes4.reshape((t, b) + spikes4.shape[1:]))
        # SNN observability: mean firing rate, materialized only when the
        # caller requests the 'intermediates' collection (XLA drops it
        # otherwise). See Detector.spike_rates.
        self.sow(
            "intermediates",
            "spike_rate",
            jnp.mean(spikes.astype(jnp.float32)),
        )
        if with_readouts:
            return spikes, v_final, reads4
        return spikes, v_final


class SpikingDownBlock(nn.Module):
    """Stride-2 spiking block + stride-1 spiking block (2x downsample).

    Reference counterpart: DownBlock, model.py:20-30.
    State is a dict {'conv1': v, 'conv2': v}.
    """

    features: int
    lif: LIFParams
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, state: dict | None = None):
        state = state or {}
        s1, v1 = SpikingConvBlock(
            self.features, self.lif, stride=2, dtype=self.dtype, name="conv1"
        )(x_t, state.get("conv1"))
        s2, v2 = SpikingConvBlock(
            self.features, self.lif, stride=1, dtype=self.dtype, name="conv2"
        )(s1, state.get("conv2"))
        return s2, {"conv1": v1, "conv2": v2}


class ConvBlock(nn.Module):
    """Non-spiking Conv -> GroupNorm -> SiLU on a (B, H, W, C) tensor.

    Used in the decoder / head stem, which run once on the final timestep
    (the reference computes its loss on the last frame only,
    reference: train.py:64-75). Reference counterpart: ConvBlock,
    model.py:9-18 (BatchNorm -> GroupNorm delta documented above).
    """

    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_normal(),
        )(x.astype(self.dtype))
        x = checkpoint_name(x, "conv_out")
        x = nn.GroupNorm(
            num_groups=_num_groups(self.features),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        return nn.silu(x).astype(self.dtype)


class UpBlock(nn.Module):
    """2x transposed-conv upsample, concat skip, two ConvBlocks.

    Mirrors the reference UpBlock (model.py:32-48) including the bilinear
    resize of the skip when spatial shapes mismatch (odd sizes after
    repeated stride-2 downsampling of 480-px inputs).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        up_ch = x.shape[-1] // 2
        x = nn.ConvTranspose(
            up_ch,
            (2, 2),
            strides=(2, 2),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x.astype(self.dtype))
        if x.shape[1:3] != skip.shape[1:3]:
            skip = jax.image.resize(
                skip,
                skip.shape[:1] + x.shape[1:3] + skip.shape[3:],
                method="bilinear",
            )
        x = jnp.concatenate([skip.astype(self.dtype), x], axis=-1)
        x = ConvBlock(self.features, dtype=self.dtype, name="conv1")(x)
        x = ConvBlock(self.features, dtype=self.dtype, name="conv2")(x)
        return x
