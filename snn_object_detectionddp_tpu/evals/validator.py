"""Model mAP evaluation on the seeded validation split.

Working equivalent of the reference's ``eval_2.py`` (its *intent* — the
file as committed crashes on a split-arity and checkpoint-key bug,
SURVEY §2.7): rebuild the identical seeded val split
(reference: eval_2.py:46-58), run the recurrent forward over each window,
NMS with conf=0.001 / iou=0.6 / max_det=300 (reference: eval_2.py:71-72,
108-112), feed predictions + targets to the in-repo DetMetrics and print
its results_dict (reference: eval_2.py:125-130).

Decode + NMS run jitted on device; only the metric accumulation is host
numpy.
"""

from __future__ import annotations

import jax
import numpy as np

from ..data.dsec import DSECIndex, train_val_split
from ..data.encoding import preprocess_video
from ..data.pipeline import BatchLoader
from ..models.detect import decode_predictions
from ..ops.boxes import cxcywh_to_xyxy
from ..ops.nms import batched_nms
from .map import DetMetrics

EVAL_CONF = 0.001
EVAL_IOU = 0.6
EVAL_MAX_DET = 300
# Pre-NMS candidate pool at eval thresholds: ultralytics keeps up to 30k
# boxes before NMS (non_max_suppression max_nms); matching it keeps the
# low-confidence tail that mAP at conf=0.001 depends on.
EVAL_PRE_NMS_TOPK = 30000


def make_predict_fn(detector, conf=EVAL_CONF, iou=EVAL_IOU, max_det=EVAL_MAX_DET,
                    multi_label=False, pre_nms_topk=EVAL_PRE_NMS_TOPK,
                    mesh=None):
    """(params, images_u8 (B,T,H,W,3)) -> fixed-shape NMS dict, all jitted.

    ``mesh``: optional device mesh. When given, the whole predict program
    is sharding-annotated over it — batch over ``data`` and, on a 2-D
    ``data x spatial`` mesh, image height over ``spatial`` (GSPMD inserts
    the conv halo exchanges; params replicated). Same constraint as the
    training GSPMD path: the SPMD partitioner cannot split an opaque
    Pallas custom call, so a mesh requires the pure-XLA LIF path
    (``runtime.lif_kernel`` auto/unrolled/xla)."""
    reg_max = detector.cfg.model.hyp.reg_max
    nc = detector.cfg.model.num_classes

    def predict(params, images_u8):
        frames = preprocess_video(images_u8, dtype=detector.module.dtype)
        raw_maps, _ = detector.module.apply({"params": params}, frames)
        boxes, scores = decode_predictions(
            raw_maps, reg_max, nc, image_hw=images_u8.shape[2:4]
        )
        return batched_nms(
            boxes,
            scores,
            conf_thres=conf,
            iou_thres=iou,
            max_det=max_det,
            multi_label=multi_label,
            pre_nms_topk=pre_nms_topk,
        )

    if mesh is None:
        return jax.jit(predict)
    if detector.cfg.runtime.lif_kernel == "pallas":
        raise ValueError(
            "mesh-sharded eval requires a partitionable LIF "
            "(runtime.lif_kernel auto|unrolled|xla, not pallas)"
        )
    from ..parallel.mesh import (
        SPATIAL_AXIS,
        TENSOR_AXIS,
        batch_specs,
        fold_sharding,
        replicate_sharding,
        tp_param_shardings,
    )

    rep = replicate_sharding(mesh)
    img_sh = batch_specs(mesh)["images"]
    # Tensor axis: params shard their output-channel dims over it
    # (inference-only channel parallelism — parallel/mesh.py::
    # tp_param_shardings); otherwise params replicate.
    params_sh = rep
    if TENSOR_AXIS in mesh.axis_names:
        params_sh = tp_param_shardings(
            mesh, jax.eval_shape(detector.init_params, jax.random.PRNGKey(0))
        )
    # fold_sharding pins only matter (and only help) when a model axis
    # (spatial or tensor) splits activations; on a plain 1-D data mesh
    # they would force a t-interleaved re-partitioning of every fold for
    # nothing.
    fold_mesh = (
        mesh
        if (SPATIAL_AXIS in mesh.axis_names or TENSOR_AXIS in mesh.axis_names)
        else None
    )

    def predict_spmd(params, images_u8):
        # fold_sharding: pin the (T,B)->(T*B) fold shardings at trace time
        # (forward-only here, but keeps the partitioning well-defined and
        # matches the train-path programs — parallel.mesh.fold_sharding).
        with fold_sharding(fold_mesh):
            return predict(params, images_u8)

    return jax.jit(
        predict_spmd, in_shardings=(params_sh, img_sh), out_shardings=rep
    )


def evaluate_model(
    cfg, detector, params, batch_size: int | None = None, mesh=None
) -> dict:
    """Run the full val-split evaluation; returns the results_dict.

    ``mesh``: optional device mesh (single-host) — eval batches shard over
    its ``data`` axis (and image height over ``spatial`` on a 2-D mesh),
    with params replicated; see :func:`make_predict_fn`. The batch size is
    rounded up to tile the data axis (the loader pads + the paths loop
    skips pad rows, so padding never reaches the metrics)."""
    index = DSECIndex(cfg, "train")
    _, val_idx = train_val_split(index, seed=cfg.training.seed)

    bs = batch_size or cfg.training.batch_size
    if mesh is not None:
        from ..parallel.mesh import (
            TENSOR_AXIS,
            data_axis_size,
            pad_batch_to_devices,
            replicate_sharding,
            tp_param_shardings,
        )

        bs = pad_batch_to_devices(bs, data_axis_size(mesh))
        # Place once up front: checkpoint-restored params are host
        # numpy, and an uncommitted array would otherwise re-upload per
        # call; a default-device-committed one would error under
        # in_shardings. Tensor meshes place each leaf channel-sharded
        # (matching make_predict_fn's in_shardings).
        if TENSOR_AXIS in mesh.axis_names:
            params = jax.device_put(params, tp_param_shardings(mesh, params))
        else:
            params = jax.device_put(params, replicate_sharding(mesh))
    loader = BatchLoader(
        index,
        val_idx,
        batch_size=bs,
        max_boxes=cfg.model.max_boxes,
        shuffle=False,
        num_threads=cfg.training.num_workers,
    )
    predict = make_predict_fn(detector, mesh=mesh)
    metrics = DetMetrics(cfg.model.num_classes)

    from tqdm import tqdm

    def accumulate(out_dev, batch):
        out = jax.device_get(out_dev)
        h, w = batch["images"].shape[2:4]
        scale = np.array([w, h, w, h], np.float32)
        for i in range(len(batch["paths"])):  # real samples only
            valid = out["valid"][i]
            lab_mask = batch["label_mask"][i]
            gt = batch["labels"][i][lab_mask]
            gt_boxes = np.asarray(
                cxcywh_to_xyxy(gt[:, 1:] * scale) if gt.size else np.zeros((0, 4))
            )
            metrics.update(
                pred_boxes=out["boxes"][i][valid],
                pred_conf=out["scores"][i][valid],
                pred_cls=out["classes"][i][valid],
                gt_boxes=gt_boxes,
                gt_cls=gt[:, 0] if gt.size else np.zeros(0),
            )

    # One-batch-delayed fetch (utils/pipelining.py, as in train/loop.py):
    # batch k's host-side metric accumulation + batch k+1's upload overlap
    # the device computing batch k+1 instead of serializing on device_get.
    from ..utils.pipelining import DelayedFetch

    fetch = DelayedFetch(accumulate)
    for batch in tqdm(loader, desc="Evaluating", total=len(loader)):
        fetch.push(predict(params, batch["images"]), batch)
    fetch.flush()

    results = metrics.results_dict()
    print("\n--- Evaluation Results ---")
    for k, v in results.items():
        print(f"{k}: {v:.5f}")
    return results
