"""Optical-flow box propagation (host-side, OpenCV).

Counterpart of the reference's legacy tracking utilities: Farneback flow
(reference: utils.py:377-383), downsampled flow computation with rescale
(reference: utils.py:314-374), and mean-flow box shifting
(reference: utils.py:416-516, NaN-safe via nan_to_num). The learned-flow
(ptlflow) path of the reference is optional/broken there (import commented
out, utils.py:13-15); here the dispatch point exists but only classical
flow ships — documented departure.
"""

from __future__ import annotations

import cv2
import numpy as np


def farneback_flow(
    prev_gray: np.ndarray, cur_gray: np.ndarray, downsample: float = 1.0
) -> np.ndarray:
    """Dense flow (H, W, 2). ``downsample`` < 1 computes flow at reduced
    resolution and rescales (reference: utils.py:314-374 semantics)."""
    if downsample != 1.0:
        small_prev = cv2.resize(prev_gray, None, fx=downsample, fy=downsample)
        small_cur = cv2.resize(cur_gray, None, fx=downsample, fy=downsample)
    else:
        small_prev, small_cur = prev_gray, cur_gray
    flow = cv2.calcOpticalFlowFarneback(
        small_prev, small_cur, None, 0.5, 3, 15, 3, 5, 1.2, 0
    )
    if downsample != 1.0:
        flow = cv2.resize(flow, (prev_gray.shape[1], prev_gray.shape[0]))
        flow /= downsample
    return flow


def get_optical_flow(
    prev_frame: np.ndarray,
    cur_frame: np.ndarray,
    method: str = "farneback",
    downsample: float = 1.0,
) -> np.ndarray | None:
    """Dispatch (reference: utils.py:314-383). method 'no' returns None."""
    if method == "no":
        return None
    if method != "farneback":
        raise ValueError(
            f"flow method '{method}' not available in this build "
            "(reference's lucas_kanade/ptlflow paths were broken/disabled)"
        )
    to_gray = lambda f: (
        cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) if f.ndim == 3 else f
    )
    return farneback_flow(to_gray(prev_frame), to_gray(cur_frame), downsample)


def update_bounding_boxes(
    boxes_xyxy: np.ndarray, flow: np.ndarray | None
) -> np.ndarray:
    """Shift each box by the mean flow inside it (reference:
    utils.py:416-516): integer displacement, NaN-safe, clipped to image."""
    if flow is None or boxes_xyxy.size == 0:
        return boxes_xyxy
    h, w = flow.shape[:2]
    out = boxes_xyxy.copy().astype(np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes_xyxy[:, :4]):
        xi1, yi1 = int(max(0, x1)), int(max(0, y1))
        xi2, yi2 = int(min(w, x2)), int(min(h, y2))
        if xi2 <= xi1 or yi2 <= yi1:
            continue
        region = flow[yi1:yi2, xi1:xi2]
        dx = float(np.nan_to_num(np.mean(region[..., 0])))
        dy = float(np.nan_to_num(np.mean(region[..., 1])))
        dx, dy = int(round(dx)), int(round(dy))
        out[i, 0] = np.clip(x1 + dx, 0, w)
        out[i, 1] = np.clip(y1 + dy, 0, h)
        out[i, 2] = np.clip(x2 + dx, 0, w)
        out[i, 3] = np.clip(y2 + dy, 0, h)
    return out
