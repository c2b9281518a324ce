"""Legacy tracker benchmark: detector-every-N-frames + optical-flow
propagation, with FPS / FLOPs instrumentation.

Working counterpart of the reference's ``eval.py`` + metric utilities
(reference: eval.py:33-191, utils.py:594-637), replacing its pretrained
YOLO with this repo's spiking detector in streaming mode:

- method "entire_model": detect every frame (reference "entire_yolo",
  eval.py:92-96);
- method "cropped_model": detect every frame inside a fixed-size crop
  window centered on the current track boxes, full-frame when no tracks
  (working form of the reference's "cropped_yolo", whose
  detect_objects_with_cropping is called but never defined — eval.py:104);
- method "optical_flow": detect every ``stride`` frames, Farneback-shift
  boxes in between (reference: eval.py:108-133);
- per-sequence FPS including and excluding image retrieval
  (reference: eval.py:153-157, 175-183);
- blended FLOPs/frame = (flow_flops + n_det * model_flops) / n_frames
  (reference: eval.py:159-165), with model FLOPs from XLA cost analysis
  instead of torch.profiler;
- quality: average best-IoU per detection + precision@IoU (reference
  ``get_eval_metric_dsec``, utils.py:594-637).
"""

from __future__ import annotations

import time
from pathlib import Path

import cv2
import jax
import numpy as np

from ..data.dsec import DSECIndex
from ..data.encoding import preprocess_video
from ..models.detect import decode_predictions
from ..ops.nms import batched_nms
from .flow import (
    flow_flops_per_frame,
    get_optical_flow,
    update_bounding_boxes,
)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from .map import _iou_matrix as f

    return f(a, b)


def eval_metric_dsec(
    detections: list[np.ndarray], gts: list[np.ndarray], iou_thresh: float = 0.5
) -> dict:
    """Avg best-IoU per detection + precision@iou (reference:
    utils.py:594-637): every detection is scored by its best-overlapping gt
    of the frame; precision is the fraction above the threshold."""
    ious: list[float] = []
    for det, gt in zip(detections, gts):
        if det.size == 0:
            continue
        if gt.size == 0:
            ious.extend([0.0] * len(det))
            continue
        m = _iou_matrix(det[:, :4], gt[:, :4])
        ious.extend(m.max(axis=1).tolist())
    if not ious:
        return {"avg_iou": 0.0, "precision": 0.0, "num_detections": 0}
    arr = np.asarray(ious)
    return {
        "avg_iou": float(arr.mean()),
        "precision": float((arr >= iou_thresh).mean()),
        "num_detections": int(arr.size),
    }


def model_flops(predict_fn, example_args) -> float:
    """Static FLOPs of one jitted call via XLA cost analysis (the jax
    equivalent of the reference's torch.profiler/model.info probes,
    utils.py:391-405, eval.py:159)."""
    try:
        lowered = predict_fn.lower(*example_args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


# Flow FLOPs for the blended report come from evals/flow.py:
# flow_flops_per_frame — XLA cost analysis for the learned model
# (method "model"), an operation-count derivation for Farneback
# (farneback_flops_per_pixel; the reference measured its learned-flow
# FLOPs with torch.profiler instead, utils.py:391-405).


def _crop_hw(h_img: int, w_img: int) -> tuple[int, int]:
    """Fixed crop-window size for the cropped_model method: half the frame,
    rounded up to 32-alignment, clamped to the frame. One definition shared
    by the detection loop and the FLOPs probe so the probed program is
    always the executed geometry."""
    ch = min(h_img, -(-(h_img // 2) // 32) * 32)
    cw = min(w_img, -(-(w_img // 2) // 32) * 32)
    return ch, cw


def default_adaptive_stride(
    prev_iou: float,
    curr_iou: float,
    stride: int,
    lo: float = 0.4,
    hi: float = 0.7,
    max_stride: int = 10,
) -> int:
    """Default adaptive-stride policy for ``compute_stride`` hooks (the
    reference leaves the hook user-supplied with an identity default,
    eval.py:39-50; this is a working policy for its "_dynamic" mode):
    tracking holding up (curr IoU >= hi) -> lengthen the detector interval;
    tracking degrading (curr IoU < lo) -> halve it; otherwise keep."""
    if curr_iou >= hi:
        return min(stride + 1, max_stride)
    if curr_iou < lo:
        return max(stride // 2, 1)
    return stride


def process_sequence(
    detector,
    params,
    frame_paths: list[str],
    method: str = "optical_flow",
    stride: int = 5,
    conf: float = 0.3,
    iou: float = 0.45,
    flow_method: str = "farneback",
    flow_downsample: float = 0.5,
    annotate_dir: str | None = None,
    compute_stride=None,
    gt_boxes: list[np.ndarray] | None = None,
) -> dict:
    """Run one sequence; returns detections + timing/FLOPs stats.

    ``gt_boxes``: optional per-frame (N, 4) xyxy-pixel ground truth,
    aligned with ``frame_paths``. When given, the report includes the
    reference's quality metrics (avg best-IoU per detection +
    precision@0.5, utils.py:594-637) and the mean GT box speed
    (utils.py:285-311) alongside FPS/FLOPs.

    ``compute_stride``: optional adaptive-stride hook
    ``(prev_iou, curr_iou, current_stride) -> new_stride`` (reference:
    eval.py:39-50,108-133). After every detector frame, the IoU between the
    flow-propagated boxes and the fresh detections is fed to the hook and
    the returned stride schedules the next detector frame; the visited
    strides are reported as ``stride_list``. ``None`` keeps the fixed
    ``stride`` (the reference's default hook is likewise identity)."""
    reg_max = detector.cfg.model.hyp.reg_max
    nc = detector.cfg.model.num_classes

    @jax.jit
    def predict(params, image_u8, rec_state):
        frames = preprocess_video(
            image_u8[:, None], dtype=detector.module.dtype
        )  # (1, B=1, H, W, 3)
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        boxes, scores = decode_predictions(
            raw, reg_max, nc, image_hw=image_u8.shape[1:3]
        )
        out = batched_nms(boxes, scores, conf_thres=conf, iou_thres=iou, max_det=100)
        return out, new_state

    @jax.jit
    def predict_crop(params, crop_u8):
        # Cropped re-detection is stateless (the recurrent state is tied to
        # full-frame geometry); matches the reference's stateless YOLO.
        frames = preprocess_video(crop_u8[:, None], dtype=detector.module.dtype)
        raw, _ = detector.module.apply({"params": params}, frames, None)
        boxes, scores = decode_predictions(
            raw, reg_max, nc, image_hw=crop_u8.shape[1:3]
        )
        return batched_nms(
            boxes, scores, conf_thres=conf, iou_thres=iou, max_det=100
        )

    detections: list[np.ndarray] = []
    retrieval_time = 0.0
    compute_time = 0.0
    det_count = 0
    crop_det_count = 0  # subset of det_count that ran the cropped program
    flow_count = 0
    rec_state = None
    prev_frame = None
    boxes = np.zeros((0, 4), np.float32)
    adaptive = compute_stride is not None
    cur_stride = max(1, int(stride))
    stride_list = [cur_stride]
    next_det_idx = 0
    prev_iou = 1.0  # tracking starts "fine" (reference eval.py:66)

    t_total0 = time.perf_counter()
    for f_idx, path in enumerate(frame_paths):
        t0 = time.perf_counter()
        frame = cv2.imread(path)
        retrieval_time += time.perf_counter() - t0

        t0 = time.perf_counter()
        cropped_now = method == "cropped_model" and boxes.size > 0
        detect_now = not cropped_now and (
            method in ("entire_model", "cropped_model")
            or (f_idx >= next_det_idx if adaptive else f_idx % stride == 0)
        )
        if cropped_now:
            # Working delivery of the reference's "cropped_yolo" intent —
            # its detect_objects_with_cropping is never defined anywhere
            # (eval.py:104 would NameError; SURVEY §2.7-class defect).
            # TPU-first shape discipline: the crop window is a FIXED size
            # (half the frame, 32-aligned) centered on the union of the
            # current track boxes, so the cropped program compiles once.
            h_img, w_img = frame.shape[:2]
            ch, cw = _crop_hw(h_img, w_img)
            ux = (boxes[:, 0].min() + boxes[:, 2].max()) / 2
            uy = (boxes[:, 1].min() + boxes[:, 3].max()) / 2
            cx = int(np.clip(ux - cw / 2, 0, w_img - cw))
            cy = int(np.clip(uy - ch / 2, 0, h_img - ch))
            crop = frame[cy : cy + ch, cx : cx + cw]
            out = jax.device_get(
                predict_crop(params, np.asarray(crop[None, :, :, ::-1]))
            )
            valid = out["valid"][0]
            boxes = out["boxes"][0][valid] + np.array(
                [cx, cy, cx, cy], np.float32
            )
            det_count += 1
            crop_det_count += 1
        elif detect_now:
            prev_boxes = boxes  # flow-propagated boxes before refresh
            out, rec_state = predict(
                params, np.asarray(frame[None, :, :, ::-1]), rec_state
            )
            out = jax.device_get(out)
            valid = out["valid"][0]
            boxes = out["boxes"][0][valid]
            det_count += 1
            if adaptive and method != "entire_model":
                # IoU semantics for the hook: compute_iou_list returns 0.0
                # when either box set is empty, which would read as
                # "tracking degrading" and halve the stride — wrong on
                # object-free stretches (both empty: nothing to track,
                # tracking is trivially fine) and meaningless on the very
                # first detection (no tracking has happened yet).
                if f_idx == 0 or (prev_boxes.size == 0 and boxes.size == 0):
                    curr_iou = prev_iou
                else:
                    curr_iou = compute_iou_list(prev_boxes, boxes)
                cur_stride = max(
                    1, int(compute_stride(prev_iou, curr_iou, cur_stride))
                )
                stride_list.append(cur_stride)
                prev_iou = curr_iou
                next_det_idx = f_idx + cur_stride
        else:
            flow = get_optical_flow(
                prev_frame, frame, flow_method, flow_downsample
            )
            boxes = update_bounding_boxes(boxes, flow)
            flow_count += 1
        compute_time += time.perf_counter() - t0

        detections.append(boxes.copy())
        prev_frame = frame
        if annotate_dir:
            img = frame.copy()
            for x1, y1, x2, y2 in boxes[:, :4]:
                cv2.rectangle(
                    img, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 2
                )
            Path(annotate_dir).mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(Path(annotate_dir) / Path(path).name), img)

    total_time = time.perf_counter() - t_total0
    n = len(frame_paths)

    # FLOPs probes reuse the last decoded frame's geometry (all frames of a
    # sequence share dims) — no extra cv2.imread. The cropped method's
    # blended figure charges each cropped call the *cropped* program's
    # FLOPs (the whole point of cropping is fewer FLOPs/frame); only the
    # full-frame detections are charged the full-frame probe.
    m_flops = 0.0
    m_flops_crop = 0.0
    if n:
        h_img, w_img = prev_frame.shape[:2]
        m_flops = model_flops(
            predict,
            (params, np.zeros((1, h_img, w_img, 3), np.uint8), rec_state),
        )
        if crop_det_count:
            ch, cw = _crop_hw(h_img, w_img)
            m_flops_crop = model_flops(
                predict_crop, (params, np.zeros((1, ch, cw, 3), np.uint8))
            )
    # All frames of a sequence share one geometry, so one per-frame figure
    # (measured via cost analysis for "model", derived for farneback)
    # times the flow-frame count is exact.
    flow_flops = (
        flow_count
        * flow_flops_per_frame(
            flow_method, prev_frame.shape[0], prev_frame.shape[1],
            flow_downsample,
        )
        if flow_count
        else 0.0
    )
    det_flops = (
        (det_count - crop_det_count) * m_flops + crop_det_count * m_flops_crop
    )
    blended = (
        (flow_flops + det_flops) / max(det_count + flow_count, 1) if n else 0.0
    )

    stats = {
        "detections": detections,
        "num_frames": n,
        "fps_incl_retrieval": n / max(total_time, 1e-9),
        "fps_excl_retrieval": n / max(compute_time, 1e-9),
        "retrieval_time_s": retrieval_time,
        "compute_time_s": compute_time,
        "model_flops": m_flops,
        "flow_flops": flow_flops,
        "blended_flops_per_frame": blended,
        "det_count": det_count,
        "crop_det_count": crop_det_count,
        "flow_count": flow_count,
        "stride_list": stride_list,
    }
    if gt_boxes is not None:
        stats.update(eval_metric_dsec(detections, gt_boxes))
        vel = gt_velocity(gt_boxes)
        stats["gt_velocity_px_s"] = float(np.mean(vel)) if vel else 0.0
    return stats


def process_dataset(
    cfg,
    detector,
    params,
    method: str = "optical_flow",
    stride: int = 5,
    max_frames_per_seq: int | None = None,
    annotate: bool = False,
    compute_stride=None,
) -> dict:
    """Benchmark all test sequences; returns per-sequence and aggregate
    stats in the reference's report shape (eval.py:153-191)."""
    index = DSECIndex(cfg, "test")
    # All frames of each sequence, in order (samples of one sequence share
    # the same filename tuple).
    seq_frames: dict[str, list[str]] = {}
    for s in index.samples:
        if s.image_dir not in seq_frames:
            seq_frames[s.image_dir] = [
                str(Path(s.image_dir) / n) for n in s.filenames
            ]

    results = {}
    for seq_dir, paths in seq_frames.items():
        if max_frames_per_seq:
            paths = paths[:max_frames_per_seq]
        # <seq>/images/left/distorted -> sequence name is 4 levels up.
        seq_name = Path(seq_dir).parents[2].name
        annotate_dir = (
            str(Path(cfg.training.save_dir) / "annotated" / seq_name)
            if annotate
            else None
        )
        # Per-frame xyxy-pixel GT when the test split ships tracks.npy
        # (DSECIndex loads it opportunistically in test mode), enabling the
        # reference's avg-IoU / precision@0.5 report (utils.py:594-637).
        gt_boxes = None
        per_frame = index.labels.get(seq_dir)
        if per_frame is not None:
            gt_boxes = [_gt_frame_xyxy(per_frame, i) for i in range(len(paths))]
        stats = process_sequence(
            detector, params, paths, method=method, stride=stride,
            annotate_dir=annotate_dir, compute_stride=compute_stride,
            gt_boxes=gt_boxes,
        )
        results[seq_dir] = stats
        line = (
            f"[{Path(seq_dir).parts[-4]}] frames={stats['num_frames']} "
            f"fps_incl={stats['fps_incl_retrieval']:.2f} "
            f"fps_excl={stats['fps_excl_retrieval']:.2f} "
            f"blended_gflops/frame={stats['blended_flops_per_frame'] / 1e9:.3f}"
        )
        if "avg_iou" in stats:
            line += (
                f" avg_iou={stats['avg_iou']:.3f} "
                f"precision@0.5={stats['precision']:.3f} "
                f"gt_vel={stats['gt_velocity_px_s']:.1f}px/s"
            )
        print(line)

    agg = {
        "fps_incl_retrieval": float(
            np.mean([r["fps_incl_retrieval"] for r in results.values()])
        )
        if results
        else 0.0,
        "fps_excl_retrieval": float(
            np.mean([r["fps_excl_retrieval"] for r in results.values()])
        )
        if results
        else 0.0,
        "blended_flops_per_frame": float(
            np.mean([r["blended_flops_per_frame"] for r in results.values()])
        )
        if results
        else 0.0,
    }
    scored = [r for r in results.values() if "avg_iou" in r]
    if scored:
        agg["avg_iou"] = float(np.mean([r["avg_iou"] for r in scored]))
        agg["precision"] = float(np.mean([r["precision"] for r in scored]))
        agg["num_detections"] = int(
            np.sum([r["num_detections"] for r in scored])
        )
    return {"per_sequence": results, "aggregate": agg}


def _gt_frame_xyxy(per_frame: dict[int, np.ndarray], i: int) -> np.ndarray:
    """One frame's indexed (N, 5) [class, cx, cy, w, h] pixel labels ->
    (N, 4) xyxy for the quality metrics; empty (0, 4) when unlabeled."""
    raw = per_frame.get(i)
    if raw is None or raw.shape[0] == 0:
        return np.zeros((0, 4), np.float32)
    cx, cy, w, h = raw[:, 1], raw[:, 2], raw[:, 3], raw[:, 4]
    return np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    ).astype(np.float32)


def compute_iou_list(
    detections: np.ndarray, gts: np.ndarray, top_n: int | None = None
) -> float:
    """Mean of the top-N best-IoU matches between one frame's detections
    and ground truth (reference: utils.py:261-282)."""
    if detections.size == 0 or gts.size == 0:
        return 0.0
    m = _iou_matrix(detections[:, :4], gts[:, :4])
    best = np.sort(m.max(axis=1))[::-1]
    if top_n is not None:
        best = best[:top_n]
    return float(best.mean()) if best.size else 0.0


def gt_velocity(
    frame_boxes: list[np.ndarray], frame_dt_s: float = 0.05
) -> list[float]:
    """Mean ground-truth box-center speed (px/s) between consecutive
    frames (reference: utils.py:285-311, get_vel). Frames with no boxes on
    either side contribute 0."""
    out = []
    for prev, cur in zip(frame_boxes[:-1], frame_boxes[1:]):
        if prev.size == 0 or cur.size == 0:
            out.append(0.0)
            continue
        pc = np.stack(
            [(prev[:, 0] + prev[:, 2]) / 2, (prev[:, 1] + prev[:, 3]) / 2], 1
        )
        cc = np.stack(
            [(cur[:, 0] + cur[:, 2]) / 2, (cur[:, 1] + cur[:, 3]) / 2], 1
        )
        # Nearest-center matching (tracks are unordered between frames).
        d = np.linalg.norm(pc[:, None] - cc[None], axis=-1)
        out.append(float(d.min(axis=1).mean() / frame_dt_s))
    return out
