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
        frames = preprocess_video(images_u8, dtype=detector.module.dtype)
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


def build_streaming_fns(detector, params, conf: float = 0.25,
                        iou: float = 0.45, max_det: int = 100):
    """Per-frame streaming pair with carried recurrent state, params baked:

    - ``init``: (B, H, W, 3) uint8 -> (nms_dict, state)   [first frame]
    - ``step``: ((B, H, W, 3) uint8, state) -> (nms_dict, state)

    Exporting both signatures mirrors serve.DetectionService.warmup: the
    first-frame and steady-state traces are different programs.
    """
    from ..data.encoding import preprocess_video
    from ..models.detect import decode_predictions
    from ..ops.nms import batched_nms

    reg_max = detector.cfg.model.hyp.reg_max
    nc = detector.cfg.model.num_classes

    def _run(image_u8, rec_state):
        frames = preprocess_video(
            image_u8[:, None], dtype=detector.module.dtype
        )  # (1, B, H, W, 3)
        raw, new_state = detector.module.apply(
            {"params": params}, frames, rec_state
        )
        boxes, scores = decode_predictions(
            raw, reg_max, nc, image_hw=image_u8.shape[1:3]
        )
        out = batched_nms(
            boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det
        )
        return out, new_state

    return jax.jit(lambda img: _run(img, None)), jax.jit(_run)


def export_streaming(
    detector,
    params,
    init_path: str | Path,
    step_path: str | Path,
    batch: int = 1,
    image_hw: tuple[int, int] | None = None,
    **nms_kwargs,
) -> tuple[str, str]:
    """Serialize the streaming (init, step) pair to StableHLO files."""
    h, w = image_hw or detector.cfg.model.image_size
    init_fn, step_fn = build_streaming_fns(detector, params, **nms_kwargs)
    img_spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    # The state pytree structure comes from an abstract init evaluation.
    _, state_spec = jax.eval_shape(init_fn, img_spec)
    init_blob = jax_export.export(init_fn)(img_spec).serialize()
    step_blob = jax_export.export(step_fn)(img_spec, state_spec).serialize()
    init_path, step_path = Path(init_path), Path(step_path)
    for p, blob in ((init_path, init_blob), (step_path, step_blob)):
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(blob)
    return str(init_path), str(step_path)
