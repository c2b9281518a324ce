"""Jitted, sharded train/eval steps.

The reference's hot loop (Python frame loop + eager backward + clip + step,
reference: train.py:62-80) becomes a single donated jit: device-side
preprocessing, the full T-step temporal forward, surrogate-gradient BPTT,
global-norm clip (10.0, reference: train.py:77), AdamW
(wd=5e-4, reference: train.py:156-160) with the OneCycle schedule — all one
XLA program. Under a data mesh, batches arrive sharded over the ``data``
axis and XLA all-reduces gradients over ICI (no explicit collectives).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.encoding import preprocess_video
from ..losses.detection import DetectionLoss
from .schedule import onecycle_lr


def make_optimizer(
    peak_lr: float,
    total_steps: int,
    weight_decay: float = 5e-4,
    grad_clip_norm: float = 10.0,
    pct_start: float = 0.3,
    frozen_mask=None,
):
    """AdamW + OneCycle with *dynamic* schedule constants.

    The LR is injected at step time from schedule constants stored in the
    train state (see :func:`init_state`), so changing epochs / dataset size
    / peak LR never recompiles the train step (each recompile costs minutes
    on this host). Returns (tx, schedule) where ``schedule`` is a host-side
    callable (for logging) that also carries ``.consts``.

    ``frozen_mask``: optional bool pytree (or params -> bool-pytree
    callable, True = frozen) for fine-tuning with frozen modules
    (model.freeze_backbone — the reference's frozen-extractor semantics,
    reference: model.py:84-86). Frozen leaves get exactly-zero updates:
    their grads are zeroed before clipping (so the clip norm reflects only
    trainable grads) AND AdamW's decoupled weight decay is masked off them
    (zero grads alone would still decay frozen weights toward 0).
    """
    chain = []
    wd_mask = None
    if frozen_mask is not None:
        chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
        if callable(frozen_mask):
            wd_mask = lambda params: jax.tree.map(  # noqa: E731
                lambda f: not f, frozen_mask(params)
            )
        else:
            wd_mask = jax.tree.map(lambda f: not f, frozen_mask)
    chain.append(optax.clip_by_global_norm(grad_clip_norm))
    # `mask` must be declared static: inject_hyperparams interprets any
    # CALLABLE kwarg as a step-count schedule and would call the mask
    # builder with the optimizer step integer.
    if wd_mask is None:
        adamw = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, weight_decay=weight_decay
        )
    else:
        adamw = optax.inject_hyperparams(optax.adamw, static_args=("mask",))(
            learning_rate=0.0, weight_decay=weight_decay, mask=wd_mask
        )
    chain.append(adamw)
    tx = optax.chain(*chain)

    class _Schedule:
        consts = (float(max(total_steps, 1)), float(peak_lr), float(pct_start))

        def __call__(self, step):
            return onecycle_lr(step, *self.consts)

    return tx, _Schedule()


def module_frozen_mask(subtree: str):
    """``params -> bool pytree`` callable marking one top-level module
    (e.g. ``"backbone"``) frozen, for :func:`make_optimizer`'s
    ``frozen_mask``. Callable form: the mask is built lazily from whatever
    params/updates tree optax hands it, so no concrete params are needed
    at optimizer-construction time."""

    def mask(params):
        return {
            k: jax.tree.map(lambda _: k == subtree, v)
            for k, v in params.items()
        }

    return mask


def init_state(
    params, tx: optax.GradientTransformation, schedule=None
) -> dict:
    consts = getattr(schedule, "consts", (1000.0, 1e-4, 0.3))
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "sched": jnp.asarray(consts, jnp.float32),
    }


def _loss_components_zero():
    from ..losses.detection import LossComponents

    z = jnp.zeros((), jnp.float32)
    return LossComponents(total=z, box=z, cls=z, dfl=z, fg=z)


class TrainStepFns(NamedTuple):
    train_step: Callable  # (state, batch) -> (state, metrics)
    eval_step: Callable  # (params, batch) -> metrics
    forward: Callable  # (params, frames_t, state?) -> (raw_maps, rec_state)


def make_step_fns(
    detector,
    tx: optax.GradientTransformation,
    schedule: optax.Schedule,
    mesh=None,
    remat: bool = False,
    remat_chunk: int | None = None,
    grad_accum: int = 1,
    fsdp: bool = False,
    remat_policy: str | None = None,
) -> TrainStepFns:
    """Build jitted step functions bound to a Detector + optimizer.

    ``mesh``: optional 1-D data mesh; when given, steps are compiled with
    replicated state and batch-sharded inputs (DP over ICI).

    ``fsdp``: ZeRO-style parameter/optimizer sharding over the ``data``
    axis — every param and AdamW-moment leaf lives 1/data per device
    (``parallel/mesh.py::state_shardings``), XLA turns the gradient
    all-reduce into a reduce-scatter and all-gathers weights per layer in
    the forward. Pure sharding-annotation change: the step math is
    untouched and equivalence vs the single-device step is tested
    (tests/test_fsdp.py). Requires a partitionable LIF (not Pallas).

    ``grad_accum``: gradient accumulation — the batch is split into this
    many sequential microbatches inside one jitted step (lax.scan);
    activation memory scales with ONE microbatch, so effective batch
    sizes far beyond HBM fit on a single chip. Each microbatch's loss is
    normalized over that microbatch (its own target_scores_sum, torch
    DDP+accumulation semantics); grads and the batch-scaled loss total
    are summed (the total scales with microbatch size, so the sum carries
    the full-batch scale) — a batch of identical microbatches reproduces
    the unaccumulated step up to f32 reassociation (tested). Composes with ``mesh``
    (accumulation runs inside each shard_map replica) and
    ``remat_chunk``.

    ``remat_chunk``: long-T BPTT memory control — split the T axis into
    chunks of this size; each chunk's forward is a jax.checkpoint region
    whose boundary carry is the (small) recurrent state, so backward-pass
    activation memory scales with ONE chunk instead of the whole window
    (SURVEY §5 long-context row). Exact same math as the unchunked forward:
    streaming==window equivalence of the carried state is a model invariant
    (tests/test_streaming.py), and detection maps come from the last
    timestep only, so XLA dead-code-eliminates the decoder/head for all
    non-final chunks. T must be a multiple of ``remat_chunk``.
    ``remat`` (bool) keeps the legacy whole-forward checkpoint.
    """
    if fsdp and mesh is None:
        raise ValueError(
            "fsdp=True requires a device mesh (mesh.fsdp shards the train "
            "state over the mesh's data axis); pass mesh= or disable fsdp"
        )
    if mesh is not None and "tensor" in mesh.axis_names:
        # Channel/tensor parallelism is a forward-only (predict/eval/
        # serving) axis: the XLA SPMD partitioner's windowed-conv GRADIENT
        # bookkeeping is exactly what we measured miscompiling on 2-D
        # meshes (docs/PARALLELISM.md), and training scale-out is already
        # covered by data x spatial x fsdp. See
        # parallel/mesh.py::tp_param_shardings.
        raise ValueError(
            "mesh.tensor > 1 is inference-only (eval/serving latency); "
            "training supports data/spatial/fsdp parallelism"
        )
    cfg = detector.cfg
    loss_fn = DetectionLoss(cfg.model.num_classes, cfg.model.hyp)
    # Honor runtime.precision end-to-end: the preprocessing stage emits the
    # model's compute dtype, so "f32" never quantizes inputs through bf16.
    in_dtype = detector.module.dtype

    # Selective remat (VERDICT r4 next #5): "save_conv" saves the
    # checkpoint_name("conv_out")-tagged MXU conv outputs inside each
    # chunk and recomputes only the cheap elementwise GN/LIF/gate chain in
    # the backward — trading a little of chunked remat's memory win for
    # most of its recompute cost. "full" (default) recomputes everything.
    if remat_policy in (None, "", "full"):
        _ckpt_policy = None
    elif remat_policy == "save_conv":
        _ckpt_policy = jax.checkpoint_policies.save_only_these_names(
            "conv_out"
        )
    else:
        raise ValueError(
            f"unknown remat_policy '{remat_policy}' (full|save_conv)"
        )

    def _checkpoint(fn):
        if _ckpt_policy is None:
            return jax.checkpoint(fn)
        return jax.checkpoint(fn, policy=_ckpt_policy)

    if remat_chunk:
        # Two separately-checkpointed callables: non-final chunks must drop
        # the detection maps INSIDE the checkpoint — jax.checkpoint wraps
        # its outputs in optimization barriers, so a dead raw_maps output
        # would survive DCE and every middle chunk would compute (and hold)
        # the decoder/head.
        ckpt_state = _checkpoint(
            lambda params, chunk, state: detector.module.apply(
                {"params": params}, chunk, state
            )[1]
        )
        ckpt_apply = _checkpoint(
            lambda params, chunk, state: detector.module.apply(
                {"params": params}, chunk, state
            )
        )

        def loss_of(params, frames):
            t, c = frames.shape[0], remat_chunk
            if t % c:
                raise ValueError(f"T={t} not a multiple of remat_chunk={c}")
            n = t // c
            if n == 1:
                raw_maps, _ = ckpt_apply(params, frames, None)
                return raw_maps
            # First chunk runs with state=None (the module builds its zero
            # state internally) and yields the concrete carry structure.
            state = ckpt_state(params, frames[:c], None)
            if n > 2:
                mid = frames[c : (n - 1) * c].reshape(
                    n - 2, c, *frames.shape[1:]
                )

                def body(carry, chunk):
                    # Middle chunks only advance the recurrent state.
                    return ckpt_state(params, chunk, carry), None

                state, _ = jax.lax.scan(body, state, mid)
            # Final chunk: maps of its last timestep are the window's output.
            last_raw, _ = ckpt_apply(params, frames[(n - 1) * c :], state)
            return last_raw

    else:
        apply_fn = detector.module.apply
        if remat:
            apply_fn = _checkpoint(
                lambda variables, frames: detector.module.apply(
                    variables, frames
                )
            )

        def loss_of(params, frames):
            raw_maps, _ = apply_fn({"params": params}, frames)
            return raw_maps

    def _grads_of(params, batch, axis):
        frames = preprocess_video(batch["images"], dtype=in_dtype)

        def objective(params):
            raw_maps = loss_of(params, frames)
            lc = loss_fn(
                raw_maps,
                batch["labels"],
                batch["label_mask"],
                sample_mask=batch.get("sample_mask"),
                cross_replica_axis=axis,
            )
            return lc.total, lc

        (_, lc), grads = jax.value_and_grad(objective, has_aux=True)(params)
        if axis is not None:
            # Each replica holds d(global loss)/d(params) restricted to its
            # own batch shard; the psum assembles the full gradient (the
            # loss itself is already the global-batch loss — see
            # detection_loss(cross_replica_axis=...)).
            grads = jax.lax.psum(grads, axis)
        return grads, lc

    def _train_step(state, batch, axis=None):
        from ..parallel.mesh import constrain_params_rep

        # 2-D fold meshes + FSDP: the fwd/bwd must consume REPLICATED
        # weights (one all-gather here) — FSDP-sharded weights feeding the
        # spatial halo convs miscompile their kernel gradients (ZeRO-1/2
        # fallback; no-op on 1-D meshes and outside GSPMD traces —
        # parallel/mesh.py::constrain_params_rep). The optimizer update
        # below keeps consuming the SHARDED state["params"].
        params = constrain_params_rep(state["params"])
        if grad_accum > 1:
            k = grad_accum
            b = batch["images"].shape[0]
            if b % k:
                raise ValueError(
                    f"batch {b} not a multiple of grad_accum={k}"
                )
            micro = {
                key: v.reshape((k, b // k) + v.shape[1:])
                for key, v in batch.items()
            }
            # GSPMD meshes: the reshape above SPLITS the data-sharded batch
            # axis; pin each microbatch's sharding explicitly (no-op
            # outside a fold_sharding trace — parallel/mesh.py).
            from ..parallel.mesh import constrain_micro

            micro = constrain_micro(micro)

            def body(carry, mb):
                g_acc, l_acc = carry
                g, lc = _grads_of(params, mb, axis)
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, l_acc, lc),
                ), None

            init = (
                jax.tree.map(jnp.zeros_like, params),
                jax.tree.map(
                    jnp.zeros_like, _loss_components_zero()
                ),
            )
            (grads, lc), _ = jax.lax.scan(body, init, micro)
            # lc.total scales with the (micro)batch size, so SUMMING the
            # microbatch grads/totals reproduces the full-batch scale: a
            # batch of identical microbatches gives the same grads as
            # the unaccumulated step (tested). The per-component logging
            # values (already normalized) are averaged.
            inv = 1.0 / k
            lc = lc._replace(
                box=lc.box * inv, cls=lc.cls * inv, dfl=lc.dfl * inv
            )
        else:
            grads, lc = _grads_of(params, batch, axis)
        # OneCycle LR from dynamic constants carried in the state.
        sched = state["sched"]
        lr = onecycle_lr(state["step"], sched[0], sched[1], sched[2])
        opt_state = state["opt_state"]
        if hasattr(opt_state[-1], "hyperparams"):  # injected AdamW path
            inner = opt_state[-1]
            inner = inner._replace(
                hyperparams={**inner.hyperparams, "learning_rate": lr}
            )
            opt_state = opt_state[:-1] + (inner,)
        updates, opt_state = tx.update(grads, opt_state, state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "sched": sched,
        }
        metrics = {
            "loss": lc.total,
            "box": lc.box,
            "cls": lc.cls,
            "dfl": lc.dfl,
            "fg": lc.fg,
            "lr": lr,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    def _eval_step(params, batch, axis=None):
        frames = preprocess_video(batch["images"], dtype=in_dtype)
        raw_maps = loss_of(params, frames)
        lc = loss_fn(
            raw_maps,
            batch["labels"],
            batch["label_mask"],
            sample_mask=batch.get("sample_mask"),
            cross_replica_axis=axis,
        )
        return {
            "loss": lc.total,
            "box": lc.box,
            "cls": lc.cls,
            "dfl": lc.dfl,
            "fg": lc.fg,
        }

    def _forward(params, frames, rec_state=None):
        return detector.module.apply({"params": params}, frames, rec_state)

    if mesh is not None and ("spatial" in mesh.axis_names or fsdp):
        # GSPMD path (data x spatial mesh): ONE logical program with
        # sharding-annotated inputs — images shard batch over `data` and
        # image-height over `spatial`; the SPMD partitioner propagates the
        # split through every conv (inserting halo exchanges over ICI) and
        # all-reduces gradients where sharded activations meet replicated
        # params. No shard_map, no explicit collectives, and the math IS
        # the single-device math by construction (GSPMD is
        # semantics-preserving up to reduction order) — with one exception
        # that must be handled explicitly: the partitioner double-counts
        # windowed-conv kernel gradients when the conv input comes from a
        # (T, B) -> (T*B) dim-merging reshape on this 2-D mesh, so tracing
        # runs under parallel.mesh.fold_sharding, which makes every model
        # fold pin its sharding (constrain_folded). tests/test_spatial.py
        # asserts loss AND gradient equivalence step-for-step. Requires
        # the pure-XLA LIF path: the partitioner cannot split an opaque
        # tpu_custom_call, so the Pallas kernels are rejected here (the
        # layout-preserving unrolled path is the fastest anyway — see
        # models/lif.py::set_lif_impl).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_specs, fold_sharding, state_shardings

        spatial = (
            mesh.shape["spatial"] if "spatial" in mesh.axis_names else 1
        )
        if cfg.runtime.lif_kernel == "pallas":
            raise ValueError(
                "mesh.spatial > 1 / mesh.fsdp require a partitionable LIF "
                "(runtime.lif_kernel auto|unrolled|xla, not pallas)"
            )
        if spatial > 1 and not remat_chunk:
            # Hard requirement, not a preference: without jax.checkpoint
            # the SPMD partitioner mis-shards the residuals crossing the
            # forward->backward boundary and windowed-conv kernel
            # gradients come back inflated (up to ~2x per conv at the
            # deep, small-H stages; measured on jax 0.9.0 — minimal repro
            # in scripts/repro_gspmd_convgrad.py). Chunked remat
            # recomputes the forward inside the backward, removing those
            # residuals entirely; the resulting gradient is
            # finite-difference-validated against the single-device step
            # (tests/test_spatial.py). Eval/inference (forward-only) is
            # unaffected and carries no such requirement.
            raise ValueError(
                "spatial-parallel TRAINING (mesh.spatial > 1) requires "
                "chunked BPTT remat: set training.remat_chunk >= 1 "
                "(XLA SPMD conv-gradient miscompile without it; see "
                "scripts/repro_gspmd_convgrad.py and docs/PARALLELISM.md)"
            )
        rep = NamedSharding(mesh, P())
        batch_sh = batch_specs(mesh)
        if fsdp:
            # Per-leaf FSDP state shardings (parallel/mesh.py::
            # state_shardings — ZeRO derived purely from shardings: XLA
            # turns the gradient all-reduce into a reduce-scatter and
            # inserts per-layer all-gathers where the forward consumes a
            # sharded weight). The template is abstract (eval_shape: no
            # device work).
            state_template = jax.eval_shape(
                lambda r: init_state(detector.init_params(r), tx, schedule),
                jax.random.PRNGKey(0),
            )
            state_sh = state_shardings(mesh, state_template, fsdp=True)
            params_sh = state_sh["params"]
        else:
            # Replicated state: a single sharding works as a pytree prefix.
            state_sh = rep
            params_sh = rep

        # The `with` runs at TRACE time (jit re-executes the Python body on
        # every trace), so the fold constraints are captured only in these
        # two programs, never in the single-device/shard_map ones.
        # 1-D (no spatial axis) meshes skip the pins entirely — the
        # documented miscompiles are 2-D-specific, pinning every fold to
        # P('data') forces a t-interleaved re-partitioning per layer for
        # nothing (same reasoning as evals/validator.py), and the 1-D FSDP
        # step is measured exact without them (tests/test_fsdp.py).
        fold_mesh = mesh if spatial > 1 else None
        def _train_step_spmd(state, batch):
            # Trace-time geometry check (spatial meshes only — the checks
            # below are about conv halo exchange, which a 1-D FSDP mesh
            # never does): the deepest feature scale (stride 32) must give
            # every spatial shard at least one REAL row. When spatial
            # exceeds the deepest H, whole shards are GSPMD padding and
            # the partitioner falls into "involuntary full
            # rematerialization" replicate-repartition paths whose
            # conv-gradient transpose is miscompiled even under remat
            # (measured: spatial=4 on H=64 inputs — deepest scale 2 rows
            # over 4 shards — is ~11% off the true directional derivative;
            # mild padding with >=1 real row per shard — H=96/spatial=2,
            # deepest scale 3 over 2 — agrees with the single-device
            # gradient to ~1%, as do evenly-divisible block>=2
            # geometries).
            sp = spatial
            img_h = batch["images"].shape[2]  # (B, T, H, W, C)
            # SAME-padded stride-2 stages take ceil at every halving, and
            # iterated ceil-halving equals one ceil-division by 32.
            rows = -(-img_h // 32)
            # GSPMD shards a dim in ceil(rows/sp) blocks, so the LAST
            # shard is all padding whenever the first sp-1 blocks already
            # cover every real row — true for many non-divisor sp that a
            # naive rows >= sp check would admit (e.g. 15 rows, sp=6:
            # blocks of 3, shard 5 is 100% padding).
            if sp > 1 and -(-rows // sp) * (sp - 1) >= rows:
                raise ValueError(
                    f"mesh.spatial={sp} leaves all-padding shards at the "
                    f"deepest feature scale ({rows} rows at stride 32, "
                    f"GSPMD block size {-(-rows // sp)}): zero-real-row "
                    "shards miscompile conv gradients "
                    "(docs/PARALLELISM.md)"
                )
            # Single-row GSPMD blocks at the deepest scale are also
            # rejected: a 3x3 conv on 1-row shards needs halo rows from
            # BOTH neighbors (the kernel is taller than the shard), and
            # the partitioner's backward deflates the head's kernel
            # gradients there (measured: H=64/spatial=2 — 2 deepest rows,
            # 1/shard — grad_norm 28-33% LOW at reg_max=16 with a
            # bit-exact loss; block>=2 geometries agree to <1%, including
            # a 1-real-row REMAINDER shard, H=96/spatial=2).
            if sp > 1 and -(-rows // sp) < 2:
                raise ValueError(
                    f"mesh.spatial={sp} shards the deepest feature scale "
                    f"({rows} rows at stride 32) into single-row blocks: "
                    "conv halos span beyond the immediate neighbor shard "
                    "and kernel gradients come back deflated "
                    "(docs/PARALLELISM.md). Use a taller image or a "
                    "smaller mesh.spatial."
                )
            with fold_sharding(fold_mesh):
                return _train_step(state, batch, axis=None)

        def _eval_step_spmd(params, batch):
            with fold_sharding(fold_mesh):
                return _eval_step(params, batch, axis=None)

        train_step = jax.jit(
            _train_step_spmd,
            in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, rep),
            donate_argnums=0,
        )
        eval_step = jax.jit(
            _eval_step_spmd,
            in_shardings=(params_sh, batch_sh),
            out_shardings=rep,
        )
    elif mesh is not None:
        # shard_map, not sharding annotations: the SPMD partitioner cannot
        # split an opaque tpu_custom_call (the Pallas LIF kernels), so the
        # per-device program must be written in LOCAL shapes — shard_map
        # hands each chip its own batch shard and the kernels tile it
        # natively. Math is identical to single-device: the loss psums its
        # normalization sums across replicas before dividing, and the
        # gradient psum assembles d(global loss)/d(params)
        # (tests/test_train.py::test_dp_matches_single_device).
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        data = P(DATA_AXIS)
        batch_specs = {
            "images": data,
            "labels": data,
            "label_mask": data,
            "sample_mask": data,
        }
        train_step = jax.jit(
            jax.shard_map(
                partial(_train_step, axis=DATA_AXIS),
                mesh=mesh,
                in_specs=(P(), batch_specs),
                out_specs=(P(), P()),
                check_vma=False,
            ),
            donate_argnums=0,
        )
        eval_step = jax.jit(
            jax.shard_map(
                partial(_eval_step, axis=DATA_AXIS),
                mesh=mesh,
                in_specs=(P(), batch_specs),
                out_specs=P(),
                check_vma=False,
            )
        )
    else:
        train_step = jax.jit(_train_step, donate_argnums=0)
        eval_step = jax.jit(_eval_step)

    return TrainStepFns(
        train_step=train_step, eval_step=eval_step, forward=jax.jit(_forward)
    )
