"""Top-level spiking temporal detector.

Composes SpikingBackbone -> TemporalUNet -> DetectHead, the TPU-native
counterpart of the reference's YOLOTemporalUNet (frozen YOLO extractor ->
ConvLSTM U-Net -> ultralytics Detect; reference: model.py:148-211).

API shape
---------
The reference processes one frame at a time with the caller owning the
temporal loop (``model(frame, hidden) -> (dets, hidden)``,
reference: model.py:197-211, train.py:64-66). Here the *window* is the unit:

    raw_maps, state = model.apply(params, frames_t, state)

with ``frames_t`` time-major (T, B, H, W, 3). Streaming per-frame inference
is the T=1 special case carrying ``state`` — tested equivalent to one
T-length call (scan-vs-loop equivalence, SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .backbone import SpikingBackbone, preset_channels
from .detect import DetectHead, decode_predictions
from .lif import LIFParams
from .unet import TemporalUNet


class SNNTemporalDetector(nn.Module):
    """(T, B, H, W, 3) frames -> 3 raw detection maps (last timestep) + state.

    ``all_steps=True``: raw maps carry a (T*B) leading dim (time-major) —
    one set of detection maps per frame of the chunk, produced by a single
    decoder/head pass over the folded batch (chunked streaming; see
    TemporalUNet.all_steps)."""

    num_classes: int
    reg_max: int = 16
    lif: LIFParams = LIFParams()
    backbone_channels: tuple[int, ...] = (48, 128, 256, 512)
    backbone_depth: int = 1
    stem: str = "s2d"
    unet_base: int = 128
    bottleneck: str = "convlstm"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        frames_t: jnp.ndarray,
        state: dict | None = None,
        all_steps: bool = False,
    ):
        state = state or {}
        feats, bstate = SpikingBackbone(
            lif=self.lif,
            channels=self.backbone_channels,
            depth=self.backbone_depth,
            stem=self.stem,
            dtype=self.dtype,
            name="backbone",
        )(frames_t, state.get("backbone"))
        refined, ustate = TemporalUNet(
            lif=self.lif,
            base=self.unet_base,
            bottleneck=self.bottleneck,
            dtype=self.dtype,
            name="unet",
        )(feats, state.get("unet"), all_steps=all_steps)
        raw_maps = DetectHead(
            num_classes=self.num_classes,
            reg_max=self.reg_max,
            dtype=self.dtype,
            name="head",
        )(list(refined))
        return raw_maps, {"backbone": bstate, "unet": ustate}


@dataclass
class Detector:
    """Config-bound convenience wrapper around the linen module."""

    module: SNNTemporalDetector
    cfg: Config

    @classmethod
    def from_config(cls, cfg: Config) -> "Detector":
        chans, depth = preset_channels(
            cfg.model.yolo_model_name, cfg.model.width_mult
        )
        lif = LIFParams(
            threshold=cfg.model.spike.threshold,
            decay=cfg.model.spike.decay,
            surrogate_slope=cfg.model.spike.surrogate_slope,
            reset=cfg.model.spike.reset,
        )
        bottleneck = (
            cfg.model.bottleneck
            if cfg.model.bottleneck in ("convlstm", "lif", "lstm")
            else ("convlstm" if cfg.model.use_conv_lstm else "lif")
        )
        from .lif import set_lif_impl

        set_lif_impl(cfg.runtime.lif_kernel)
        dtype = jnp.bfloat16 if cfg.runtime.precision == "bf16" else jnp.float32
        module = SNNTemporalDetector(
            num_classes=cfg.model.num_classes,
            reg_max=cfg.model.hyp.reg_max,
            lif=lif,
            backbone_channels=chans,
            backbone_depth=depth,
            stem=cfg.model.stem,
            unet_base=int(cfg.model.width_mult * 128),
            bottleneck=bottleneck,
            dtype=dtype,
        )
        return cls(module=module, cfg=cfg)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, sample_frames: jnp.ndarray | None = None):
        """Initialize parameters from a (T, B, H, W, 3) sample (tiny dummy
        by default; conv params are shape-independent of H/W)."""
        if sample_frames is None:
            h, w = self.cfg.model.image_size
            # Init with a small spatial size: parameter shapes don't depend
            # on H/W, and this keeps init fast on host.
            h, w = min(h, 128), min(w, 128)
            sample_frames = jnp.zeros((1, 1, h, w, 3), jnp.float32)
        return self.module.init(rng, sample_frames)["params"]

    def apply(
        self,
        params,
        frames_t: jnp.ndarray,
        state: dict | None = None,
        all_steps: bool = False,
    ):
        return self.module.apply(
            {"params": params}, frames_t, state, all_steps=all_steps
        )

    def detect_image(
        self,
        params,
        image_u8: jnp.ndarray,
        encoding: str = "direct",
        rng: jax.Array | None = None,
        conf: float = 0.3,
        iou: float = 0.45,
        max_det: int = 300,
    ) -> dict:
        """Single-image SNN detection at T = cfg.model.timesteps.

        The static image is spike-encoded over T timesteps ("direct" repeats
        the frame as constant current; "rate" draws Bernoulli spike trains —
        data/encoding.py) and run through the temporal detector; detections
        come from the final timestep (BASELINE config #1).

        Args: image_u8 (B, H, W, 3) uint8. Returns the fixed-shape NMS dict.
        """
        from ..data.encoding import encode_direct, encode_rate
        from ..ops.nms import batched_nms

        t = self.cfg.model.timesteps
        if encoding == "direct":
            frames = encode_direct(image_u8, t, dtype=self.module.dtype)
        elif encoding == "rate":
            if rng is None:
                rng = jax.random.PRNGKey(0)
            frames = encode_rate(image_u8, rng, t, dtype=self.module.dtype)
        else:
            raise ValueError(f"unknown encoding '{encoding}'")
        raw_maps, _ = self.apply(params, frames)
        boxes, scores = self.decode(raw_maps, image_hw=image_u8.shape[1:3])
        return batched_nms(
            boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det
        )

    def spike_rates(self, params, frames_t: jnp.ndarray) -> dict[str, float]:
        """Mean firing rate of every spiking block for one batch — the SNN
        activity/sparsity diagnostic (flat dict: 'backbone/stem1' -> rate).

        The mutable-intermediates forward is jitted (cached on the
        Detector): unjitted flax ``apply`` dispatches op-by-op, which costs
        minutes per call through a remote-device tunnel."""
        fn = getattr(self, "_spike_rates_fn", None)
        if fn is None:

            @jax.jit
            def fn(params, frames_t):
                _, variables = self.module.apply(
                    {"params": params}, frames_t, mutable=["intermediates"]
                )
                return variables["intermediates"]

            self._spike_rates_fn = fn
        # One bulk readback (per-scalar device_get would round-trip the
        # tunnel once per layer).
        host = jax.device_get(fn(params, frames_t))

        flat = {}

        def walk(tree, prefix):
            for k, v in tree.items():
                if k == "spike_rate":
                    flat[prefix.rstrip("/")] = float(v[0])
                elif isinstance(v, dict):
                    walk(v, prefix + k + "/")

        walk(host, "")
        return flat

    def decode(self, raw_maps, image_hw: tuple[int, int] | None = None):
        """Raw maps -> (boxes_xyxy pixels, class scores) for NMS. Pass the
        true ``image_hw`` for image-space boxes (see decode_predictions)."""
        return decode_predictions(
            raw_maps,
            self.cfg.model.hyp.reg_max,
            self.cfg.model.num_classes,
            image_hw=image_hw,
        )
