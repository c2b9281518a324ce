"""Per-stage FLOPs/rate audit of the flagship forward: which stage is
furthest from its conv speed-of-light (~90 TF/s at big-C shapes, ~67 at
the stem)? Uses XLA cost analysis per stage + chain timing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_stages.py [--batch 32]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, args, iters=20, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def flops_of(fn, *args):
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=4)
    args = ap.parse_args()

    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.encoding import preprocess_video
    from snn_object_detectionddp_tpu.models.detector import Detector

    B, T, H, W = args.batch, args.t, 480, 640
    cfg = Config()
    cfg.model.num_classes = 8
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 255, size=(B, T, H, W, 3), dtype=np.uint8)
    )
    frames = jax.jit(preprocess_video)(images)
    frames.block_until_ready()

    # Full forward
    full = jax.jit(lambda p, f: det.module.apply({"params": p}, f))
    p_dev = jax.device_put(params)
    ms = timeit(full, (p_dev, frames))
    gf = flops_of(lambda p, f: det.module.apply({"params": p}, f), params, frames)
    print(f"full     {ms:8.2f} ms  {gf / 1e9:8.1f} GF  {gf / 1e9 / ms:6.1f} TF/s",
          flush=True)

    # Stages: backbone / unet / head, isolated with their real inputs.
    from snn_object_detectionddp_tpu.models.backbone import SpikingBackbone
    from snn_object_detectionddp_tpu.models.detect import DetectHead
    from snn_object_detectionddp_tpu.models.unet import TemporalUNet

    bb = SpikingBackbone(lif=det.module.lif, channels=det.module.backbone_channels,
                         depth=det.module.backbone_depth, stem=det.module.stem,
                         dtype=det.module.dtype)
    bb_params = params["backbone"]
    bb_fn = jax.jit(lambda p, f: bb.apply({"params": p}, f))
    ms = timeit(bb_fn, (jax.device_put(bb_params), frames))
    gf = flops_of(lambda p, f: bb.apply({"params": p}, f), bb_params, frames)
    print(f"backbone {ms:8.2f} ms  {gf / 1e9:8.1f} GF  {gf / 1e9 / ms:6.1f} TF/s",
          flush=True)

    feats, _ = bb_fn(jax.device_put(bb_params), frames)
    feats = jax.block_until_ready(feats)

    un = TemporalUNet(lif=det.module.lif, base=det.module.unet_base,
                      bottleneck=det.module.bottleneck, dtype=det.module.dtype)
    un_params = params["unet"]
    un_fn = jax.jit(lambda p, f: un.apply({"params": p}, f))
    ms = timeit(un_fn, (jax.device_put(un_params), feats))
    gf = flops_of(lambda p, f: un.apply({"params": p}, f), un_params, feats)
    print(f"unet     {ms:8.2f} ms  {gf / 1e9:8.1f} GF  {gf / 1e9 / ms:6.1f} TF/s",
          flush=True)

    refined, _ = un_fn(jax.device_put(un_params), feats)
    refined = jax.block_until_ready(refined)

    hd = DetectHead(num_classes=cfg.model.num_classes,
                    reg_max=cfg.model.hyp.reg_max, dtype=det.module.dtype)
    hd_params = params["head"]
    hd_fn = jax.jit(lambda p, f: hd.apply({"params": p}, list(f)))
    ms = timeit(hd_fn, (jax.device_put(hd_params), refined))
    gf = flops_of(lambda p, f: hd.apply({"params": p}, list(f)), hd_params,
                  refined)
    print(f"head     {ms:8.2f} ms  {gf / 1e9:8.1f} GF  {gf / 1e9 / ms:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
