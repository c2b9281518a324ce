"""Attribute the flagship train step's backward cost on the current chip.

VERDICT r3 weak #1 / next #2: the 186 ms train step (batch 32, T=4,
480x640, bf16) had no backward breakdown — forward MFU got the 21% -> 44%
treatment, training (the driver's primary workload, BASELINE configs
#3/#5) did not. This probe measures, on the real backend:

1. fwd        — the loss forward alone (preprocess -> model -> TAL loss),
                jitted exactly as inside the train step.
2. grad       — value_and_grad of the same objective (fwd + bwd).
3. step       — the production train step (grad + psum-free AdamW update).
4. Frozen-subsystem grads: grad with {backbone, head, unet, the ConvLSTM
   gates kernels alone} treated as constants. XLA drops the frozen
   leaves' weight-gradient computations (and any activation cotangents
   feeding only them), so `grad_full - grad_frozen(X)` bounds what X's
   backward costs — the ablation-timing counterpart of a per-op profile,
   which the tunneled backend cannot record.
5. The round-3 suspect, attempted: ConvLSTM recurrent-scan unroll
   (models/convlstm.py::SCAN_UNROLL). unroll=T exposes the T hidden-half
   wgrad convs + their 4*hidden*k*k fp32 accumulator chain to the
   scheduler in one block instead of a rolled sequential loop. Same math
   (lax.scan unroll is semantics-preserving); measured win or negative
   goes to BASELINE.md.

FLOPs per program come from XLA's own cost model (compiled cost_analysis,
same method as bench.py), so each row also reports its MFU against the
v5e bf16 peak.

Usage:
    PYTHONPATH=/root/.axon_site:. python scripts/probe_backward.py \
        [--batch 32] [--t 4] [--iters 10] [--unroll-sweep]

Reference hot loop this corresponds to: train.py:62-80 (loss.backward()
on the torch side — where cuDNN autotunes; here the breakdown is ours to
measure).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak bf16 (same basis as bench.py)
IMG_H, IMG_W = 480, 640


def main() -> int:
    global IMG_H, IMG_W
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--unroll-sweep",
        action="store_true",
        help="also time grad+step with ConvLSTM SCAN_UNROLL in {1, T}",
    )
    ap.add_argument(
        "--nano",
        action="store_true",
        help="tiny geometry smoke test (CPU-viable; numbers meaningless)",
    )
    ap.add_argument(
        "--freeze",
        default="backbone,head,unet,gates_kernels",
        help="comma list of frozen-subsystem ablations to run "
        "(subset of backbone,head,unet,gates_kernels; empty to skip)",
    )
    ap.add_argument(
        "--no-step",
        action="store_true",
        help="skip the full train-step timing",
    )
    args = ap.parse_args()

    from snn_object_detectionddp_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import numpy as np

    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.encoding import preprocess_video
    from snn_object_detectionddp_tpu.losses.detection import DetectionLoss
    from snn_object_detectionddp_tpu.models import convlstm
    from snn_object_detectionddp_tpu.models.detector import Detector
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

    def build(detector):
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

        return objective

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

    frames_n = args.batch * args.t

    def report(label, seconds, flops):
        mfu = (
            f"{(flops / seconds) / _V5E_BF16_PEAK_FLOPS:6.1%}"
            if flops
            else "     ?"
        )
        gfpf = f"{flops / frames_n / 1e9:7.1f}" if flops else "      ?"
        print(
            f"{label:34s} {seconds * 1e3:8.2f} ms  {frames_n / seconds:7.1f} f/s"
            f"  mfu={mfu}  GF/frame={gfpf}",
            flush=True,
        )
        return seconds

    results = {}

    def measure_variant(tag: str, ablations: bool = True):
        """Build detector fresh (honors convlstm.SCAN_UNROLL) and measure
        fwd / grad / frozen-grads / full step."""
        detector = Detector.from_config(cfg)
        params = detector.init_params(jax.random.PRNGKey(0))
        objective = build(detector)

        fwd = jax.jit(objective)
        t_fwd = timeit(
            lambda: fwd(params), lambda x: float(jax.device_get(x))
        )
        results[f"{tag}/fwd"] = report(
            f"[{tag}] forward (loss)", t_fwd, flops_of(fwd, params)
        )

        def timed_grad(label, freeze):
            """freeze: predicate on the dotted param path, True = frozen.

            Frozen leaves stay jit ARGUMENTS (argnums-0-only grad) rather
            than closure constants — baking the 122M-param unet in as
            literals produced a ~0.5 GB HLO that the remote-compile relay
            rejects (HTTP 413), and giant literals distort compile/layout
            anyway."""
            paths = jax.tree_util.tree_flatten_with_path(params)
            leaves, treedef = jax.tree_util.tree_flatten(params)
            keys = [
                ".".join(str(getattr(k, "key", k)) for k in p)
                for p, _ in paths[0]
            ]
            frozen_mask = [freeze(k) for k in keys]
            frozen = [l for l, m in zip(leaves, frozen_mask) if m]
            train = [l for l, m in zip(leaves, frozen_mask) if not m]
            n_froz = sum(x.size for x in frozen)

            def obj(train_leaves, frozen_leaves):
                it_t, it_f = iter(train_leaves), iter(frozen_leaves)
                full = [
                    next(it_f) if m else next(it_t) for m in frozen_mask
                ]
                return objective(jax.tree_util.tree_unflatten(treedef, full))

            g = jax.jit(jax.grad(obj, argnums=0))
            t = timeit(
                lambda: g(train, frozen),
                lambda out: float(
                    jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
                ),
            )
            results[f"{tag}/{label}"] = report(
                f"[{tag}] grad, frozen={label} ({n_froz/1e6:.1f}M)",
                t,
                flops_of(g, train, frozen),
            )
            return t

        t_grad = timed_grad("none", lambda k: False)
        freezes = {
            "backbone": lambda k: k.startswith("backbone"),
            "head": lambda k: k.startswith("head"),
            "unet": lambda k: k.startswith("unet"),
            "gates_kernels": lambda k: "gates_kernel" in k,
        }
        for name in [f for f in args.freeze.split(",") if f and ablations]:
            t_f = timed_grad(name, freezes[name])
            print(
                f"    -> {name} backward-cost bound: "
                f"{(t_grad - t_f) * 1e3:+.2f} ms",
                flush=True,
            )

        t_step = None
        if not args.no_step:
            tx, schedule = make_optimizer(1e-4, total_steps=1000)
            fns = make_step_fns(detector, tx, schedule)
            holder = {"state": init_state(params, tx)}

            def step():
                holder["state"], m = fns.train_step(holder["state"], batch)
                return m

            t_step = timeit(step, lambda m: float(jax.device_get(m["loss"])))
            results[f"{tag}/step"] = report(
                f"[{tag}] train step", t_step, None
            )
        return t_grad, t_step

    convlstm.SCAN_UNROLL = 1
    measure_variant("unroll=1")
    if args.unroll_sweep:
        # The unroll question is grad/step time, not the ablation split —
        # skip the frozen variants to save chip compiles.
        convlstm.SCAN_UNROLL = args.t
        measure_variant(f"unroll={args.t}", ablations=False)
        convlstm.SCAN_UNROLL = 1

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
