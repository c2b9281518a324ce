"""Trainable spiking convolutional backbone producing P3/P4/P5 features.

Replaces the reference's *frozen pretrained* YOLO11m feature extractor
(reference: model.py:74-98), which is not portable to this from-scratch TPU
build (SURVEY §7 "Hard parts" #6). The backbone is a straightforward
stride-4 stem + three stages emitting spike trains at strides 8/16/32 — the
same scale contract the reference's extractor feeds into its temporal U-Net
(reference: model.py:121-128, strides documented at model.py:188-194).

Width presets are keyed by the reference's ``model.yolo_model_name`` config
value (config.yaml:31) so the config schema stays drop-in compatible.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import SpikingConvBlock, SpikingDownBlock
from .lif import LIFParams

# (stem, p3, p4, p5) channel widths and per-stage extra block count.
PRESETS = {
    "yolo11n.pt": ((32, 64, 128, 256), 0),
    "yolo11s.pt": ((32, 96, 192, 384), 0),
    "yolo11m.pt": ((48, 128, 256, 512), 1),
    # l/x: full ultralytics family coverage (the reference only ever sets
    # yolo11m, config.yaml:31, but the key accepts any family member).
    "yolo11l.pt": ((64, 160, 320, 640), 2),
    "yolo11x.pt": ((80, 192, 384, 768), 2),
}
DEFAULT_PRESET = "yolo11m.pt"


def preset_channels(name: str, width_mult: float = 1.0) -> tuple[tuple[int, ...], int]:
    chans, depth = PRESETS.get(name, PRESETS[DEFAULT_PRESET])
    scaled = tuple(max(16, int(round(c * width_mult / 16)) * 16) for c in chans)
    return scaled, depth


def space_to_depth(x_t: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/b, W/b, C*b*b). Pure layout shuffle."""
    *lead, h, w, c = x_t.shape
    x = x_t.reshape(*lead, h // block, block, w // block, block, c)
    nd = len(lead)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return x.transpose(perm).reshape(*lead, h // block, w // block, c * block * block)


class SpikingBackbone(nn.Module):
    """(T, B, H, W, 3) image/spike sequence -> P3/P4/P5 spike trains.

    Returns ((p3, p4, p5) each (T, B, H/s, W/s, C)) plus the membrane-state
    dict for streaming continuation.

    Stem variants: "s2d" (default) rearranges 2x2 pixel blocks into channels
    before each stem conv (YOLO-Focus style) — a free layout shuffle that
    turns the MXU-hostile 3-input-channel stride-2 convs into dense
    12-/4*c-channel stride-1 convs; "conv" is the plain stride-2 pair.
    """

    lif: LIFParams
    channels: tuple[int, ...] = (48, 128, 256, 512)
    depth: int = 1
    stem: str = "s2d"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, state: dict | None = None):
        state = state or {}
        c_stem, c_p3, c_p4, c_p5 = self.channels
        new_state: dict = {}

        # Stem: stride 4 total.
        if self.stem == "s2d4":
            # One-shot: 4x4 pixel blocks -> 48 input channels at stride 4.
            # Skips the 240x320 feature level entirely: fewest FLOPs, dense
            # MXU K-dim, and no giant stem activations for BPTT.
            x = space_to_depth(x_t, 4)
            x, new_state["stem1"] = SpikingConvBlock(
                c_stem, self.lif, stride=1, dtype=self.dtype, name="stem1"
            )(x, state.get("stem1"))
            x, new_state["stem2"] = SpikingConvBlock(
                c_stem * 2, self.lif, stride=1, dtype=self.dtype, name="stem2"
            )(x, state.get("stem2"))
        elif self.stem == "s2d":
            x, new_state["stem1"] = SpikingConvBlock(
                c_stem, self.lif, stride=1, dtype=self.dtype, name="stem1"
            )(space_to_depth(x_t), state.get("stem1"))
            x, new_state["stem2"] = SpikingConvBlock(
                c_stem * 2, self.lif, stride=1, dtype=self.dtype, name="stem2"
            )(space_to_depth(x), state.get("stem2"))
        else:
            x, new_state["stem1"] = SpikingConvBlock(
                c_stem, self.lif, stride=2, dtype=self.dtype, name="stem1"
            )(x_t, state.get("stem1"))
            x, new_state["stem2"] = SpikingConvBlock(
                c_stem * 2, self.lif, stride=2, dtype=self.dtype, name="stem2"
            )(x, state.get("stem2"))

        feats = []
        for i, c in enumerate((c_p3, c_p4, c_p5)):
            key = f"stage{i + 1}"
            x, new_state[key] = SpikingDownBlock(
                c, self.lif, dtype=self.dtype, name=key
            )(x, state.get(key))
            for d in range(self.depth):
                bkey = f"{key}_block{d}"
                x, new_state[bkey] = SpikingConvBlock(
                    c, self.lif, dtype=self.dtype, name=bkey
                )(x, state.get(bkey))
            feats.append(x)

        return tuple(feats), new_state
