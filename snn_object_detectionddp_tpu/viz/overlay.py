"""Detection-overlay rendering on the test split.

Counterpart of reference ``visualize.py``: per test window (batch size 1 in
the reference; batched here), run the recurrent forward, NMS with conf=0.3 /
iou=0.45 / multi_label (reference: visualize.py:73-78), rescale boxes from
model-input to original image size (reference: visualize.py:94-98 via
ultralytics scale_boxes), draw rectangles, and save a PNG named after the
window's last frame into ``<save_dir>/visualizations``
(reference: visualize.py:104-107).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import jax
import numpy as np

from ..data.dsec import DSECIndex, apply_test_debug
from ..data.pipeline import BatchLoader
from ..ops.boxes import scale_boxes
from .palette import class_color

VIZ_CONF = 0.3
VIZ_IOU = 0.45


def draw_bboxes(
    image_bgr: np.ndarray,
    boxes_xyxy: np.ndarray,
    scores: np.ndarray | None = None,
    classes: np.ndarray | None = None,
    class_names: list[str] | None = None,
) -> np.ndarray:
    """Draw detection rectangles (reference: visualize.py:28-46; the
    reference draws plain green boxes with the label text commented out —
    we color by class and label with class/conf)."""
    out = image_bgr.copy()
    for i, box in enumerate(boxes_xyxy):
        x1, y1, x2, y2 = (int(round(float(v))) for v in box)
        cls = int(classes[i]) if classes is not None else 0
        color = class_color(cls)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        if scores is not None:
            name = (
                class_names[cls]
                if class_names and cls < len(class_names)
                else str(cls)
            )
            label = f"{name} {float(scores[i]):.2f}"
            # Text anchored above the box (reference's y-15 convention).
            cv2.putText(
                out,
                label,
                (x1, max(y1 - 15, 10)),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.5,
                color,
                1,
                cv2.LINE_AA,
            )
    return out


def run_visualization(
    cfg,
    detector,
    params,
    output_dir: str | Path,
    batch_size: int = 8,
    class_names: list[str] | None = None,
) -> list[str]:
    """Render overlays for the test split; returns saved paths."""
    from ..evals.validator import make_predict_fn

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    index = DSECIndex(cfg, "test")
    indices = apply_test_debug(list(range(len(index))), cfg.debug_test)
    loader = BatchLoader(
        index,
        indices,
        batch_size=batch_size,
        shuffle=False,
        num_threads=cfg.training.num_workers,
    )
    predict = make_predict_fn(
        detector, conf=VIZ_CONF, iou=VIZ_IOU, multi_label=True
    )

    saved = []
    from tqdm import tqdm

    for batch in tqdm(loader, desc="Visualizing", total=len(loader)):
        out = jax.device_get(predict(params, batch["images"]))
        model_hw = batch["images"].shape[2:4]
        for i, path in enumerate(batch["paths"]):
            orig = cv2.imread(path)
            if orig is None:
                print(f"Warning: could not read {path}, skipping.")
                continue
            valid = out["valid"][i]
            boxes = out["boxes"][i][valid]
            boxes = np.asarray(
                scale_boxes(boxes, model_hw, orig.shape[:2])
            ) if boxes.size else boxes
            img = draw_bboxes(
                orig,
                boxes,
                out["scores"][i][valid],
                out["classes"][i][valid],
                class_names,
            )
            dst = output_dir / Path(path).name
            cv2.imwrite(str(dst), img)
            saved.append(str(dst))
    return saved
