"""2D convolutional LSTM — behavioral twin of the reference's temporal core.

Kept alongside the LIF bottleneck for A/B comparison, selected via the
reference's ``model.use_conv_lstm`` flag (reference: config.yaml:32). Cell
math matches reference model.py:50-71: a single conv over [x; h] producing
4*hidden gates (i, f, g, o), zero-initialized state on the first step.

Unlike the feedforward spiking blocks this layer has a true conv inside the
recurrence. The gate conv is linear in [x; h], so it is SPLIT: the input
half conv(x, W[:in]) is time-batched over all T steps in one MXU call, and
only the hidden half conv(h, W[in:]) runs sequentially under ``lax.scan``
— same parameter tensor and math as the reference's single concat-conv.
The gate kernel is declared as an explicit parameter and applied with
``lax.conv_general_dilated`` so the scan body stays a pure function (no
flax module calls inside the scan).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import constrain_folded, constrain_tb

# lax.scan unroll factor for the recurrent gate conv (1 = rolled loop).
# Same math at any value; unrolling exposes the T per-step hidden-half
# convs and their weight-gradient accumulations to XLA's scheduler in one
# block instead of a sequential loop with a carried 4*hidden*k*k fp32
# accumulator. Probed on the v5e by scripts/probe_backward.py; see
# BASELINE.md for the measured verdict at the flagship geometry.
SCAN_UNROLL = 1


class ConvLSTM2d(nn.Module):
    """Scan a ConvLSTM over a (T, B, H, W, C) time-major input.

    Returns (h_t (T,B,H,W,hidden), (h_final, c_final)). Gate math runs in
    fp32: the recurrent state compounds across timesteps and low-precision
    drift would accumulate.
    """

    hidden: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16  # conv compute dtype; state stays fp32

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, state: tuple | None = None):
        in_ch = x_t.shape[-1]
        b, h, w = x_t.shape[1], x_t.shape[2], x_t.shape[3]
        if state is None:
            shape = (b, h, w, self.hidden)
            state = (
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
            )

        kernel = self.param(
            "gates_kernel",
            nn.initializers.xavier_uniform(),
            (self.kernel, self.kernel, in_ch + self.hidden, 4 * self.hidden),
            jnp.float32,
        )
        # Forget-gate bias = 1 (reference init recipe,
        # weight_initialization.py:49-56): gate order is (i, f, g, o).
        def _bias_init(key, shape, dtype):
            bias = jnp.zeros(shape, dtype)
            return bias.at[self.hidden : 2 * self.hidden].set(1.0)

        bias = self.param("gates_bias", _bias_init, (4 * self.hidden,), jnp.float32)

        pad = self.kernel // 2
        compute_dtype = self.dtype

        def _conv(inp, kern):
            dn = jax.lax.conv_dimension_numbers(
                inp.shape, kern.shape, ("NHWC", "HWIO", "NHWC")
            )
            return jax.lax.conv_general_dilated(
                inp,
                kern,
                window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=dn,
            )

        # conv([x; h], W) == conv(x, W[:in]) + conv(h, W[in:]) — split so the
        # input half of the gates is computed for ALL timesteps in one
        # MXU-batched conv (this is >half the gate FLOPs and the ConvLSTM
        # bottleneck carries more FLOPs than the whole backbone at the
        # flagship geometry); only the hidden half stays sequential in the
        # scan. Same parameter tensor, same math up to one extra bf16
        # rounding at the gate sum.
        t = x_t.shape[0]
        # constrain_folded: sharding pin required for correct kernel grads
        # under a GSPMD spatial mesh (parallel.mesh.fold_sharding).
        xb = constrain_folded(
            x_t.reshape((t * b, h, w, in_ch)).astype(compute_dtype)
        )
        x_gates = _conv(xb, kernel[:, :, :in_ch].astype(compute_dtype))
        # Selective-remat anchor: the time-batched input-half gate conv is
        # the ConvLSTM's big MXU call — remat_policy="save_conv" keeps it
        # instead of recomputing it per chunk (models/layers.py rationale).
        from jax.ad_checkpoint import checkpoint_name

        x_gates = checkpoint_name(x_gates, "conv_out")
        x_gates = constrain_tb(
            x_gates.reshape((t, b, h, w, 4 * self.hidden))
        )
        k_h = kernel[:, :, in_ch:].astype(compute_dtype)

        def step(carry, xg):
            h_state, c_state = carry
            # Conv runs uniformly in the compute dtype (mixed dtypes break
            # the conv transpose rule under grad); MXU still accumulates in
            # fp32 for bf16 inputs. Gate math upcasts to fp32 after.
            h_gates = _conv(h_state.astype(compute_dtype), k_h)
            gates = (
                xg.astype(jnp.float32) + h_gates.astype(jnp.float32) + bias
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_next = jax.nn.sigmoid(f) * c_state + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
            return (h_next, c_next), h_next

        (h_final, c_final), h_seq = jax.lax.scan(
            step, state, x_gates, unroll=SCAN_UNROLL
        )
        return h_seq, (h_final, c_final)
