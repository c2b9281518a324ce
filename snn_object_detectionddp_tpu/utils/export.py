"""Model export for deployment: serialized StableHLO via ``jax.export``.

The serving-side counterpart the reference lacks entirely: the full
inference program (preprocess -> temporal SNN forward -> decode -> NMS) is
staged out as one portable StableHLO artifact with the weights baked in,
loadable by any JAX runtime (or an IFRT/PJRT serving stack) without this
package's Python code.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export


def build_serving_fn(detector, params, conf: float = 0.25, iou: float = 0.45,
                     max_det: int = 300):
    """(B, T, H, W, 3) uint8 -> fixed-shape NMS dict, params baked in."""
    from ..data.encoding import preprocess_video
    from ..ops.nms import batched_nms

    reg_max = detector.cfg.model.hyp.reg_max
    nc = detector.cfg.model.num_classes

    def serve(images_u8):
        frames = preprocess_video(images_u8)
        raw, _ = detector.module.apply({"params": params}, frames)
        from ..models.detect import decode_predictions

        boxes, scores = decode_predictions(
            raw, reg_max, nc, image_hw=images_u8.shape[2:4]
        )
        return batched_nms(
            boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det
        )

    return jax.jit(serve)


def export_serving(
    detector,
    params,
    path: str | Path,
    batch: int = 1,
    timesteps: int | None = None,
    image_hw: tuple[int, int] | None = None,
    **nms_kwargs,
) -> str:
    """Serialize the serving program to ``path`` (StableHLO bytes)."""
    t = timesteps or detector.cfg.model.timesteps
    h, w = image_hw or detector.cfg.model.image_size
    serve = build_serving_fn(detector, params, **nms_kwargs)
    spec = jax.ShapeDtypeStruct((batch, t, h, w, 3), jnp.uint8)
    blob = jax_export.export(serve)(spec).serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return str(path)


def load_serving(path: str | Path):
    """Deserialize an exported program; returns an object with ``.call``."""
    return jax_export.deserialize(Path(path).read_bytes())
