"""Round-5 backward attack probe: manual-VJP A/B + backbone attribution.

VERDICT r4 next #1: the backbone backward (~55 ms, ~32% MFU — BASELINE.md
round-4 breakdown) is the named train-step hotspot. This probe measures, on
the real chip at flagship geometry (batch 32, T=4, 480x640, bf16):

1. Whole-model grad + train step, LIF impl in {unrolled (round-4 default),
   manual (hand-written VJP, bf16 surrogate residual), manual-fp32sur}.
   The manual path (models/lif.py::affine_lif_manual_tb) saves the
   precomputed SuperSpike factor instead of the fp32 pre-threshold
   membrane: backward drops the abs/square/divide chain and halves the
   residual read; applies to every SpikingConvBlock (backbone + U-Net
   encoder), i.e. the whole 55 ms target plus part of the U-Net chain.
2. Backbone-only attribution at the same conv geometry: grad time of
   {full spiking block, SiLU-instead-of-LIF, no-GN-stats} variants.
   full-silu bounds the LIF temporal chain's backward cost; full-nogn
   bounds the GroupNorm statistics chain. Names where the NEXT lever is.

Gradient agreement between impls is cross-checked on-device (relative
L2 over the full tree) so a speed win can't silently be a wrong-math win.

Usage:
    PYTHONPATH=/root/.axon_site:. python scripts/probe_bwd2.py \
        [--batch 32] [--t 4] [--iters 10] [--skip-attrib] [--nano]

Reference hot loop: train.py:76-80 (loss.backward()).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_V5E_BF16_PEAK_FLOPS = 197e12
IMG_H, IMG_W = 480, 640


def main() -> int:
    global IMG_H, IMG_W
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-attrib", action="store_true")
    ap.add_argument("--skip-model", action="store_true")
    ap.add_argument("--nano", action="store_true")
    ap.add_argument(
        "--impls",
        default="unrolled,manual,manual-fp32sur",
        help="comma list for the whole-model A/B "
        "(unrolled|manual|manual-fp32sur|fused)",
    )
    args = ap.parse_args()

    from snn_object_detectionddp_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.encoding import preprocess_video
    from snn_object_detectionddp_tpu.losses.detection import DetectionLoss
    from snn_object_detectionddp_tpu.models import lif as lif_mod
    from snn_object_detectionddp_tpu.models.backbone import space_to_depth
    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.models.layers import _num_groups
    from snn_object_detectionddp_tpu.models.lif import (
        LIFParams,
        run_affine_lif_tb,
        set_lif_impl,
    )
    from snn_object_detectionddp_tpu.train.step import (
        init_state,
        make_optimizer,
        make_step_fns,
    )

    cfg = Config()
    cfg.model.num_classes = 8
    if args.nano:
        cfg.model.yolo_model_name = "yolo11n.pt"
        cfg.model.width_mult = 0.25
        cfg.model.hyp.reg_max = 8
        IMG_H, IMG_W = 64, 64
        args.batch = min(args.batch, 2)
    cfg.model.image_size = (IMG_H, IMG_W)
    print(
        f"backend={jax.default_backend()} jax={jax.__version__} "
        f"batch={args.batch} T={args.t} {IMG_H}x{IMG_W}",
        flush=True,
    )

    rng = np.random.RandomState(0)
    images = rng.randint(
        0, 255, size=(args.batch, args.t, IMG_H, IMG_W, 3), dtype=np.uint8
    )
    labels = np.zeros((args.batch, 16, 5), np.float32)
    labels[:, 0] = [1.0, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((args.batch, 16), bool)
    mask[:, 0] = True
    batch = {
        "images": jax.device_put(images),
        "labels": jax.device_put(labels),
        "label_mask": jax.device_put(mask),
        "sample_mask": jax.device_put(np.ones((args.batch,), bool)),
    }
    frames_n = args.batch * args.t

    def timeit(fn, sync, iters=args.iters, warmup=2):
        for _ in range(warmup):
            sync(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters

    def flops_of(jitted, *a):
        try:
            cost = jitted.lower(*a).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) or None
        except Exception:
            return None

    def report(label, seconds, flops=None):
        mfu = (
            f"{(flops / seconds) / _V5E_BF16_PEAK_FLOPS:6.1%}"
            if flops
            else "     ?"
        )
        print(
            f"{label:40s} {seconds * 1e3:8.2f} ms  "
            f"{frames_n / seconds:7.1f} f/s  mfu={mfu}",
            flush=True,
        )
        return seconds

    # ---------------- whole-model A/B over LIF impls -------------------
    if not args.skip_model:
        detector = Detector.from_config(cfg)
        params = detector.init_params(jax.random.PRNGKey(0))
        loss_fn = DetectionLoss(cfg.model.num_classes, cfg.model.hyp)
        in_dtype = detector.module.dtype

        def objective(params):
            frames = preprocess_video(batch["images"], dtype=in_dtype)
            raw_maps, _ = detector.module.apply({"params": params}, frames)
            lc = loss_fn(
                raw_maps,
                batch["labels"],
                batch["label_mask"],
                sample_mask=batch["sample_mask"],
            )
            return lc.total

        impl_table = {
            "unrolled": ("unrolled", None),
            "manual": ("manual", jnp.bfloat16),
            "manual-fp32sur": ("manual", jnp.float32),
            "fused": ("fused", jnp.bfloat16),
        }
        grads = {}
        for impl in args.impls.split(","):
            real_impl, sur_dtype = impl_table[impl]
            set_lif_impl(real_impl)
            if sur_dtype is not None:
                lif_mod.MANUAL_SUR_DTYPE = sur_dtype
            g = jax.jit(jax.grad(objective))
            t_g = timeit(
                lambda: g(params),
                lambda out: float(
                    jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
                ),
            )
            report(f"[{impl}] grad", t_g, flops_of(g, params))
            grads[impl] = g(params)

            tx, schedule = make_optimizer(1e-4, total_steps=1000)
            fns = make_step_fns(detector, tx, schedule)
            # Copy: train_step donates its state, which would otherwise
            # delete the `params` buffers the next impl's grad needs.
            holder = {"state": init_state(jax.tree.map(jnp.copy, params), tx)}

            def step():
                holder["state"], m = fns.train_step(holder["state"], batch)
                return m

            t_s = timeit(step, lambda m: float(jax.device_get(m["loss"])))
            report(f"[{impl}] train step", t_s)

        # Gradient agreement (device-side reduction, one scalar per pair).
        @jax.jit
        def rel_l2(ga, gb):
            num = sum(
                jnp.sum(jnp.square(a - b))
                for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb))
            )
            den = sum(jnp.sum(jnp.square(a)) for a in jax.tree.leaves(ga))
            return jnp.sqrt(num / den)

        names = list(grads)
        for name in names[1:]:
            d = float(jax.device_get(rel_l2(grads[names[0]], grads[name])))
            print(
                f"grad rel-L2 {names[0]} vs {name}: {d:.3e}", flush=True
            )
        set_lif_impl("auto")
        lif_mod.MANUAL_SUR_DTYPE = jnp.bfloat16

    # ---------------- backbone-only attribution ------------------------
    if args.skip_attrib:
        return 0

    lifp = LIFParams()

    class VBlock(nn.Module):
        """SpikingConvBlock geometry clone with an ablation mode."""

        features: int
        mode: str  # "lif" | "silu" | "nogn"
        stride: int = 1

        @nn.compact
        def __call__(self, x4, t, b):
            x = nn.Conv(
                self.features,
                (3, 3),
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=False,
                dtype=jnp.bfloat16,
                param_dtype=jnp.float32,
            )(x4)
            c = self.features
            if self.mode == "nogn":
                a = jnp.ones((t, b, c), jnp.float32)
                bias = jnp.zeros((t, b, c), jnp.float32)
            else:
                groups = _num_groups(c)
                cg = c // groups
                xf = x.astype(jnp.float32)
                s1 = (
                    jnp.sum(xf, axis=(1, 2))
                    .reshape(t * b, groups, cg)
                    .sum(axis=2)
                )
                s2 = (
                    jnp.sum(jnp.square(xf), axis=(1, 2))
                    .reshape(t * b, groups, cg)
                    .sum(axis=2)
                )
                n = x.shape[1] * x.shape[2] * cg
                mean = s1 / n
                var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
                rstd = jax.lax.rsqrt(var + 1e-6)
                gamma = self.param(
                    "gn_scale", nn.initializers.ones, (c,), jnp.float32
                )
                beta = self.param(
                    "gn_bias", nn.initializers.zeros, (c,), jnp.float32
                )
                mean_c = jnp.repeat(mean, cg, axis=1).reshape(t, b, c)
                rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(t, b, c)
                a = rstd_c * gamma
                bias = beta - mean_c * rstd_c * gamma
            if self.mode == "silu":
                y = (
                    x.astype(jnp.float32)
                    * a.reshape(t * b, 1, 1, c)
                    + bias.reshape(t * b, 1, 1, c)
                )
                return nn.silu(y).astype(jnp.bfloat16)
            s4, _ = run_affine_lif_tb(x, a, bias, lifp)
            return s4

    class VBackbone(nn.Module):
        mode: str
        channels: tuple = (48, 128, 256, 512)
        depth: int = 1

        @nn.compact
        def __call__(self, frames):  # (T, B, H, W, 3)
            t, b = frames.shape[:2]
            x = space_to_depth(frames, 4)
            x4 = x.reshape((t * b,) + x.shape[2:]).astype(jnp.bfloat16)
            c_stem, c_p3, c_p4, c_p5 = self.channels
            x4 = VBlock(c_stem, self.mode, name="stem1")(x4, t, b)
            x4 = VBlock(c_stem * 2, self.mode, name="stem2")(x4, t, b)
            outs = []
            for i, c in enumerate((c_p3, c_p4, c_p5)):
                x4 = VBlock(c, self.mode, stride=2, name=f"s{i}a")(x4, t, b)
                x4 = VBlock(c, self.mode, name=f"s{i}b")(x4, t, b)
                for d in range(self.depth):
                    x4 = VBlock(c, self.mode, name=f"s{i}c{d}")(x4, t, b)
                outs.append(x4)
            return outs

    frames = jnp.asarray(
        rng.rand(args.t, args.batch, IMG_H, IMG_W, 3), jnp.bfloat16
    )
    for mode, impl in (
        ("lif", "unrolled"),
        ("lif", "manual"),
        ("silu", "unrolled"),
        ("nogn", "unrolled"),
        ("nogn", "manual"),
    ):
        set_lif_impl(impl)
        net = VBackbone(mode)
        ps = net.init(jax.random.PRNGKey(0), frames)["params"]

        def obj(ps):
            outs = net.apply({"params": ps}, frames)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        g = jax.jit(jax.grad(obj))
        t_g = timeit(
            lambda: g(ps),
            lambda out: float(
                jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
            ),
        )
        report(f"[bb {mode}/{impl}] grad", t_g, flops_of(g, ps))
    set_lif_impl("auto")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
