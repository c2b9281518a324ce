"""Stage-level ablation profiler: where do the forward milliseconds go?

Times each piece of the flagship forward in isolation on the current
backend (designed for the real TPU chip): preprocess, backbone (and each
stem/stage conv shape), temporal U-Net, detect head, decode+NMS — plus
per-shape conv micro-benches (conv alone vs +GN vs +GN+LIF) so kernel
fusion work (VERDICT round-1 #2) is guided by measurements, not guesses.

Usage: python scripts/ablate.py [--batch 16] [--t 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t", type=int, default=4)
    args = ap.parse_args()

    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.encoding import preprocess_video
    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
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

    print(f"backend={jax.default_backend()} B={B} T={T} {H}x{W}")

    # --- end-to-end pieces ------------------------------------------------
    pre_ms = timeit(jax.jit(preprocess_video), images)
    print(f"preprocess_video            {pre_ms:8.2f} ms")

    full = jax.jit(lambda p, f: det.module.apply({"params": p}, f)[0])
    full_ms = timeit(full, params, frames)
    print(f"full forward                {full_ms:8.2f} ms")

    # Backbone only.
    from snn_object_detectionddp_tpu.models.backbone import (
        SpikingBackbone,
        preset_channels,
    )
    from snn_object_detectionddp_tpu.models.lif import LIFParams

    chans, depth = preset_channels(cfg.model.yolo_model_name, cfg.model.width_mult)
    lif = LIFParams(
        threshold=cfg.model.spike.threshold,
        decay=cfg.model.spike.decay,
        surrogate_slope=cfg.model.spike.surrogate_slope,
        reset=cfg.model.spike.reset,
    )
    bb = SpikingBackbone(lif=lif, channels=chans, depth=depth, stem=cfg.model.stem)
    bb_params = {"params": params["backbone"]}
    bb_fn = jax.jit(lambda p, f: bb.apply(p, f)[0])
    bb_ms = timeit(bb_fn, bb_params, frames)
    print(f"backbone                    {bb_ms:8.2f} ms")

    feats = bb_fn(bb_params, frames)

    # UNet only (on captured feats).
    from snn_object_detectionddp_tpu.models.unet import TemporalUNet

    un = TemporalUNet(lif=lif, base=int(cfg.model.width_mult * 128),
                      bottleneck="convlstm")
    un_params = {"params": params["unet"]}
    un_fn = jax.jit(lambda p, f: un.apply(p, f)[0])
    un_ms = timeit(un_fn, un_params, feats)
    print(f"temporal unet               {un_ms:8.2f} ms")

    refined = un_fn(un_params, feats)

    # Head only.
    from snn_object_detectionddp_tpu.models.detect import DetectHead

    hd = DetectHead(num_classes=cfg.model.num_classes, reg_max=cfg.model.hyp.reg_max)
    hd_params = {"params": params["head"]}
    hd_fn = jax.jit(lambda p, f: hd.apply(p, list(f)))
    hd_ms = timeit(hd_fn, hd_params, refined)
    print(f"detect head                 {hd_ms:8.2f} ms")
    print(
        f"unaccounted (fusion deltas) {full_ms - bb_ms - un_ms - hd_ms:8.2f} ms"
    )

    # --- per-shape conv micro-benches ------------------------------------
    from flax import linen as nn

    from snn_object_detectionddp_tpu.kernels.lif_pallas import lif_scan_pallas
    from snn_object_detectionddp_tpu.models.layers import _num_groups

    c_stem = chans[0]
    shapes = [
        ("stem1", 120, 160, 48, c_stem, 1),
        ("stem2", 120, 160, c_stem, c_stem * 2, 1),
        ("stage1c1", 120, 160, c_stem * 2, chans[1], 2),
        ("stage1c2", 60, 80, chans[1], chans[1], 1),
        ("stage2c1", 60, 80, chans[1], chans[2], 2),
        ("stage2c2", 30, 40, chans[2], chans[2], 1),
        ("stage3c1", 30, 40, chans[2], chans[3], 2),
        ("stage3c2", 15, 20, chans[3], chans[3], 1),
    ]
    print("\nper-conv micro-bench (T*B batched):")
    print(f"{'layer':10} {'shape':>22} {'conv':>8} {'+GN':>8} {'+LIF':>8} "
          f"{'GFLOP':>7} {'conv TF/s':>9}")
    key = jax.random.PRNGKey(0)
    for name, h, w, cin, cout, stride in shapes:
        x = jax.device_put(
            jnp.asarray(rng.randn(T * B, h, w, cin), jnp.bfloat16)
        )
        conv = nn.Conv(cout, (3, 3), strides=(stride, stride), padding="SAME",
                       use_bias=False, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32)
        cp = conv.init(key, x)
        conv_fn = jax.jit(lambda p, x: conv.apply(p, x))
        conv_ms = timeit(conv_fn, cp, x)

        gn = nn.GroupNorm(num_groups=_num_groups(cout), dtype=jnp.float32)
        gp = gn.init(key, conv_fn(cp, x))

        def conv_gn(cp, gp, x):
            return gn.apply(gp, conv.apply(cp, x)).astype(jnp.bfloat16)

        cg_fn = jax.jit(conv_gn)
        cg_ms = timeit(cg_fn, cp, gp, x)

        def conv_gn_lif(cp, gp, x):
            y = cg_fn(cp, gp, x)
            y = y.reshape((T, B) + y.shape[1:])
            v0 = jnp.zeros(y.shape[1:], jnp.float32)
            s, v = lif_scan_pallas(y, v0, lif, False)
            return s

        cgl_fn = jax.jit(conv_gn_lif)
        cgl_ms = timeit(cgl_fn, cp, gp, x)

        gflop = T * B * (h // stride) * (w // stride) * 9 * cin * cout * 2 / 1e9
        print(f"{name:10} {f'{h}x{w}x{cin}->{cout}/{stride}':>22} "
              f"{conv_ms:8.2f} {cg_ms:8.2f} {cgl_ms:8.2f} {gflop:7.1f} "
              f"{gflop / conv_ms:9.2f}")


if __name__ == "__main__":
    main()
