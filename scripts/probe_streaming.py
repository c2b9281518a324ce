"""Decompose the streaming (T=1, B=1) per-frame step: forward vs decode vs NMS.

Each variant is timed device-paced: N dispatches chained by the carried
recurrent state (a real data dependency), one drain at the end — the only
trustworthy timing through this host's tunnel (block_until_ready returns
before the dispatch queue drains here).
"""
from __future__ import annotations

import time

import jax
import numpy as np

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from snn_object_detectionddp_tpu.config import Config
from snn_object_detectionddp_tpu.data.encoding import preprocess_video
from snn_object_detectionddp_tpu.models.detect import decode_predictions
from snn_object_detectionddp_tpu.models.detector import Detector
from snn_object_detectionddp_tpu.ops.nms import batched_nms

IMG_H, IMG_W = 480, 640
N = 200


def main() -> None:
    cfg = Config()
    cfg.model.num_classes = 8
    detector = Detector.from_config(cfg)
    params = detector.init_params(jax.random.PRNGKey(0))
    reg_max, nc = cfg.model.hyp.reg_max, cfg.model.num_classes

    @jax.jit
    def fwd_only(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        # Tiny readback surrogate so XLA can't drop the head outputs.
        probe = sum(r.sum() for r in raw)
        return probe, new_state

    @jax.jit
    def fwd_decode(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        boxes, scores = decode_predictions(raw, reg_max, nc, image_hw=(IMG_H, IMG_W))
        return boxes.sum() + scores.sum(), new_state

    @jax.jit
    def full(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        boxes, scores = decode_predictions(raw, reg_max, nc, image_hw=(IMG_H, IMG_W))
        out = batched_nms(boxes, scores, conf_thres=0.3, iou_thres=0.45, max_det=100)
        return out, new_state

    rng = np.random.RandomState(0)
    frames_host = rng.randint(0, 255, size=(8, 1, IMG_H, IMG_W, 3), dtype=np.uint8)
    frames = [jax.device_put(f) for f in frames_host]

    def bench(fn, name):
        # Warm BOTH signatures: state=None and the steady-state pytree
        # (missing the second puts a recompile inside the timed loop).
        rec = None
        out, rec = fn(params, frames[0], rec)
        out, rec = fn(params, frames[1], rec)
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
        t0 = time.perf_counter()
        for i in range(N):
            out, rec = fn(params, frames[i % 8], rec)
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:12s} {dt * 1e3:7.3f} ms/frame   {1 / dt:7.1f} f/s")
        return dt

    mod = detector.module
    from snn_object_detectionddp_tpu.models.backbone import SpikingBackbone
    from snn_object_detectionddp_tpu.models.unet import TemporalUNet

    bb = SpikingBackbone(
        lif=mod.lif,
        channels=mod.backbone_channels,
        depth=mod.backbone_depth,
        stem=mod.stem,
        dtype=mod.dtype,
    )
    un = TemporalUNet(
        lif=mod.lif, base=mod.unet_base, bottleneck=mod.bottleneck, dtype=mod.dtype
    )

    @jax.jit
    def backbone_only(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        feats, bstate = bb.apply(
            {"params": params["backbone"]},
            frames,
            None if rec_state is None else rec_state["backbone"],
        )
        return sum(f.sum() for f in feats), {"backbone": bstate}

    @jax.jit
    def backbone_unet(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        st = rec_state or {}
        feats, bstate = bb.apply(
            {"params": params["backbone"]}, frames, st.get("backbone")
        )
        refined, ustate = un.apply({"params": params["unet"]}, feats, st.get("unet"))
        return (
            sum(r.sum() for r in refined),
            {"backbone": bstate, "unet": ustate},
        )

    @jax.jit
    def full_pool128(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        boxes, scores = decode_predictions(raw, reg_max, nc, image_hw=(IMG_H, IMG_W))
        out = batched_nms(
            boxes,
            scores,
            conf_thres=0.3,
            iou_thres=0.45,
            max_det=100,
            pre_nms_topk=128,
        )
        return out, new_state

    @jax.jit
    def fwd_t2(params, image2_u8, rec_state):
        # Two frames in one dispatch: (2, H, W, 3) -> window (1, 2, H, W, 3).
        frames = preprocess_video(image2_u8[None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        return sum(r.sum() for r in raw), new_state

    def _fwd_only_impl(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        return sum(r.sum() for r in raw), new_state

    fwd_donate = jax.jit(_fwd_only_impl, donate_argnums=2)

    def _full_impl(params, image_u8, rec_state):
        frames = preprocess_video(image_u8[:, None])
        raw, new_state = detector.module.apply({"params": params}, frames, rec_state)
        boxes, scores = decode_predictions(raw, reg_max, nc, image_hw=(IMG_H, IMG_W))
        out = batched_nms(
            boxes, scores, conf_thres=0.3, iou_thres=0.45, max_det=100,
            pre_nms_topk=128,
        )
        return out, new_state

    full_donate = jax.jit(_full_impl, donate_argnums=2)

    bench(backbone_only, "backbone")
    bench(backbone_unet, "bb+unet")
    bench(fwd_only, "forward")
    bench(fwd_donate, "fwd(donate)")
    bench(fwd_decode, "fwd+decode")
    bench(full, "full(+nms)")
    bench(full_pool128, "full(p128)")
    bench(full_donate, "full(p128+d)")

    frames2 = [
        jax.device_put(np.concatenate([frames_host[i], frames_host[i + 1]]))
        for i in range(0, 8, 2)
    ]

    def bench_t2(name):
        rec = None
        out, rec = fwd_t2(params, frames2[0], rec)
        out, rec = fwd_t2(params, frames2[1], rec)
        jax.device_get(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(N):
            out, rec = fwd_t2(params, frames2[i % 4], rec)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / N
        print(
            f"{name:12s} {dt * 1e3:7.3f} ms/call    {2 / dt:7.1f} frames/s"
        )

    bench_t2("fwd T=2")


if __name__ == "__main__":
    main()
