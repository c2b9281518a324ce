"""Temporal U-Net: spiking encoder over time, recurrent bottleneck,
single-pass decoder on the final timestep.

Structural counterpart of the reference's TemporalUNet
(reference: model.py:100-146): encoder fuses P4/P5 by concatenation at
matching scales, the bottleneck carries recurrent state across the frame
window, the decoder upsamples with skip connections and 1x1-projects back to
the input feature channel counts.

TPU-first departures (SURVEY §7):
- Encoder blocks are spiking (Conv+GN+LIF), time-batched over T so every
  conv is one big MXU batch; only LIF membrane updates are sequential.
- Because supervision is last-frame-only (reference: train.py:64-75), the
  decoder + output projections run ONCE on the final timestep instead of
  T times — skip connections and the decoder input read the continuous
  membrane readout of each spiking block rather than binary spikes.
- Bottleneck is either a ConvLSTM (behavioral twin of model.py:50-71,
  selected by ``use_conv_lstm``/``bottleneck: convlstm``) or a spiking LIF
  block whose membrane is the recurrence.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import constrain_folded
from .convlstm import ConvLSTM2d
from .layers import (
    ConvBlock,
    SpikingConvBlock,
    SpikingDownBlock,
    UpBlock,
    membrane_readout,
)
from .lif import LIFParams


class TemporalUNet(nn.Module):
    """(p3, p4, p5) spike trains (each (T, B, h, w, c)) -> refined
    (p3', p4', p5') single-timestep maps (B, h, w, c) + recurrent state.

    ``all_steps=True`` (chunked streaming): the decoder runs on EVERY
    timestep's per-step membrane readouts, folded to one (T*B, h, w, c)
    batch — returns per-step maps with leading dim T*B (time-major), same
    parameters, math identical to T chained single-step calls."""

    lif: LIFParams
    base: int = 128  # reference encoder widths 128/256/512/1024 (model.py:108-115)
    bottleneck: str = "convlstm"  # "convlstm" | "lif"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, feats: tuple, state: dict | None = None, all_steps: bool = False
    ):
        p3, p4, p5 = feats
        ch_p3, ch_p4, ch_p5 = p3.shape[-1], p4.shape[-1], p5.shape[-1]
        c1, c2, c3, c4 = self.base, self.base * 2, self.base * 4, self.base * 8
        state = state or {}
        new_state: dict = {}
        t, b = p3.shape[:2]

        # --- Encoder with P4/P5 fusion (reference: model.py:125-128) ---
        # With all_steps the encoder blocks also emit per-step continuous
        # readouts (T*B, h, w, c) — the decoder then runs ONCE on the
        # folded (T*B) batch instead of once on the last step, producing
        # detection maps for EVERY frame of the chunk with math identical
        # to T chained single-step calls (tests/test_streaming.py).
        x1, new_state["enc1"], *r1 = SpikingConvBlock(
            c1, self.lif, dtype=self.dtype, name="enc1"
        )(p3, state.get("enc1"), with_readouts=all_steps)
        d1, new_state["down1"] = SpikingDownBlock(
            c2, self.lif, dtype=self.dtype, name="down1"
        )(x1, state.get("down1"))
        x2, new_state["enc2"], *r2 = SpikingConvBlock(
            c2, self.lif, dtype=self.dtype, name="enc2"
        )(jnp.concatenate([d1, p4], axis=-1), state.get("enc2"),
          with_readouts=all_steps)
        d2, new_state["down2"] = SpikingDownBlock(
            c3, self.lif, dtype=self.dtype, name="down2"
        )(x2, state.get("down2"))
        x3, new_state["enc3"], *r3 = SpikingConvBlock(
            c3, self.lif, dtype=self.dtype, name="enc3"
        )(jnp.concatenate([d2, p5], axis=-1), state.get("enc3"),
          with_readouts=all_steps)
        d3, new_state["down3"] = SpikingDownBlock(
            c4, self.lif, dtype=self.dtype, name="down3"
        )(x3, state.get("down3"))

        # --- Recurrent bottleneck ---
        if self.bottleneck == "convlstm":
            h_seq, new_state["bottleneck"] = ConvLSTM2d(
                c4, dtype=self.dtype, name="bottleneck"
            )(d3, state.get("bottleneck"))
            bott_seq = h_seq
        elif self.bottleneck == "lstm":
            # Reference's use_conv_lstm=False variant: 2-layer LSTM over
            # flattened spatial tokens (reference: model.py:113-114,131-137).
            from .token_lstm import TokenLSTM

            h_seq, new_state["bottleneck"] = TokenLSTM(
                c4, dtype=self.dtype, name="bottleneck"
            )(d3, state.get("bottleneck"))
            bott_seq = h_seq
        else:  # "lif": membrane potential is the recurrence
            spikes, v_final, *rb = SpikingConvBlock(
                c4, self.lif, dtype=self.dtype, name="bottleneck"
            )(d3, state.get("bottleneck"), with_readouts=all_steps)
            new_state["bottleneck"] = v_final
            bott_seq = None if all_steps else membrane_readout(
                spikes, v_final, self.lif
            )

        if all_steps:
            # Fold T into the batch axis: the decoder convs run one big
            # (T*B) MXU batch — per-step maps at batched efficiency.
            if self.bottleneck in ("convlstm", "lstm"):
                bott = constrain_folded(
                    bott_seq.reshape((t * b,) + bott_seq.shape[2:])
                )
            else:
                bott = rb[0]  # already (T*B, h, w, c4)
            skip3, skip2, skip1 = (
                r3[0].astype(self.dtype),
                r2[0].astype(self.dtype),
                r1[0].astype(self.dtype),
            )
        else:
            bott = bott_seq if bott_seq.ndim == 4 else bott_seq[-1]
            # Decoder on the final timestep only; skip connections read
            # continuous membrane readouts (see module doc).
            skip3 = self._readout(x3, new_state["enc3"])
            skip2 = self._readout(x2, new_state["enc2"])
            skip1 = self._readout(x1, new_state["enc1"])

        bott = ConvBlock(c4, dtype=self.dtype, name="bottleneck_conv")(
            bott.astype(self.dtype)
        )

        u1 = UpBlock(c3, dtype=self.dtype, name="up1")(bott, skip3)
        u2 = UpBlock(c2, dtype=self.dtype, name="up2")(u1, skip2)
        u3 = UpBlock(c1, dtype=self.dtype, name="up3")(u2, skip1)

        out_p3 = nn.Conv(
            ch_p3, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="out_p3"
        )(u3)
        out_p4 = nn.Conv(
            ch_p4, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="out_p4"
        )(u2)
        out_p5 = nn.Conv(
            ch_p5, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="out_p5"
        )(u1)

        return (out_p3, out_p4, out_p5), new_state

    def _readout(self, spikes_t, v_final):
        return membrane_readout(
            spikes_t.astype(jnp.float32), v_final, self.lif
        ).astype(self.dtype)
