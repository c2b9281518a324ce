"""Device mesh + data-parallel sharding.

The distribution layer the reference never had (its repo name says DDP but
training is a single ``device: "cuda:3"`` string — SURVEY §2.5): a 1-D
``data`` mesh over all chips, batches sharded on the leading axis, params
replicated. Gradients are all-reduced over ICI automatically by XLA from
the jit shardings (psum inserted where replicated params meet sharded
data) — no NCCL/MPI-style explicit collectives.

Multi-host: call :func:`init_distributed` first (``jax.distributed``
handles DCN); each host feeds its local shard of the global batch.
CPU-testable via ``XLA_FLAGS=--xla_force_host_platform_device_count=N``.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
TENSOR_AXIS = "tensor"


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization over DCN (no-op on a single host).

    ``num_processes``/``process_id`` are optional overrides for
    environments without cluster auto-detection (e.g. the 2-process CPU
    test, tests/test_multiprocess.py); real TPU pods auto-detect both."""
    if coordinator:
        kwargs = {}
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        # Generous barrier: on loaded hosts (CI, shared dev boxes) workers
        # can take minutes to reach the coordinator rendezvous.
        kwargs["initialization_timeout"] = 600
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def maybe_init_distributed(cfg) -> None:
    """CLI entry for multi-host: initialize jax.distributed from
    ``mesh.coordinator`` / ``mesh.num_processes`` / ``mesh.process_id``
    config keys, with env-var fallbacks (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID) so one config.yaml can be shared by every
    host of a pod slice. Must run before any other JAX backend touch
    (main.py calls it first). No-op when no coordinator is configured."""
    import os

    mesh_cfg = getattr(cfg, "mesh", None)
    coord = getattr(mesh_cfg, "coordinator", None) or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not coord:
        return

    def _pick(attr, env):
        v = getattr(mesh_cfg, attr, None)
        if v is None and os.environ.get(env) is not None:
            v = int(os.environ[env])
        return v

    init_distributed(
        coord,
        num_processes=_pick("num_processes", "NUM_PROCESSES"),
        process_id=_pick("process_id", "PROCESS_ID"),
    )
    print(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()} via {coord}"
    )
    collective_barrier()


def collective_barrier() -> None:
    """One tiny all-reduce over every device, run right after distributed
    init. Two jobs: (a) fail fast at startup if the cross-host fabric is
    broken, instead of minutes later inside the first train step; (b) align
    collective-context creation across processes. The CPU gloo backend in
    particular builds its context lazily inside the FIRST executed
    collective with a hard 30 s rendezvous deadline — if one process
    reaches that collective while a peer is still compiling its
    (minutes-long under load) train step, context init dies with
    ``Gloo context initialization failed: DEADLINE_EXCEEDED`` (observed in
    tests/test_multiprocess.py on a loaded 1-core host). Paying the
    rendezvous here — both sides compile this trivial program in well under
    the deadline — removes the skew."""
    import jax.numpy as jnp

    mesh = make_mesh()
    f = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, DATA_AXIS),
            mesh=mesh,
            in_specs=P(DATA_AXIS),
            out_specs=P(),
        )
    )
    n = len(jax.devices())
    total = int(jax.device_get(f(jnp.ones((n,), jnp.float32)))[0])
    if total != n:
        raise RuntimeError(
            f"collective barrier mismatch: psum over {n} devices returned "
            f"{total} — broken fabric or inconsistent mesh"
        )


def is_main_process() -> bool:
    """True on the host that owns logging/checkpoint writes (rank 0)."""
    return jax.process_index() == 0


def make_mesh(
    data: int = -1,
    spatial: int = 1,
    tensor: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Device mesh: 1-D ``data`` (default), 2-D ``data x spatial``, or 2-D
    ``data x tensor``.

    ``spatial > 1`` adds a second axis that partitions the image-height
    dimension of activations (GSPMD spatial parallelism — XLA inserts the
    conv halo exchanges). ``tensor > 1`` instead partitions conv output
    channels + activations channel-wise (inference-only tensor parallelism
    — see :func:`tp_param_shardings`); the two are mutually exclusive.
    ``data=-1`` uses all visible devices divided by the model axis. Keep
    the model axis innermost: ``mesh_utils`` maps the trailing mesh dim
    onto the most tightly coupled ICI neighbors, which is where the
    per-layer halo/reduce traffic should ride.
    """
    devices = devices if devices is not None else jax.devices()
    spatial = max(int(spatial), 1)
    tensor = max(int(tensor), 1)
    if spatial > 1 and tensor > 1:
        raise ValueError(
            "mesh.spatial and mesh.tensor cannot both exceed 1"
        )
    model = spatial * tensor  # one of them is 1
    if data in (-1, 0):
        if len(devices) % model:
            raise ValueError(
                f"{len(devices)} visible devices not divisible by the "
                f"model axis ({model})"
            )
        data = len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{model}={n} exceeds {len(devices)} visible devices"
        )
    if model == 1:
        arr = mesh_utils.create_device_mesh((n,), devices=devices[:n])
        return Mesh(arr, (DATA_AXIS,))
    axis = SPATIAL_AXIS if spatial > 1 else TENSOR_AXIS
    arr = mesh_utils.create_device_mesh((data, model), devices=devices[:n])
    return Mesh(arr, (DATA_AXIS, axis))


def data_axis_size(mesh: Mesh) -> int:
    """Batch-tiling requirement: the batch axis shards over ``data`` only."""
    return mesh.shape[DATA_AXIS]


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis; trailing
    axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_specs(mesh: Mesh) -> dict:
    """Per-key NamedShardings for a train/eval batch.

    Every key shards its leading (batch) axis over ``data``. On a 2-D
    ``data x spatial`` mesh, ``images`` (B, T, H, W, C) additionally shards
    H over ``spatial`` — the GSPMD partitioner then propagates that spatial
    split through every conv in the model, inserting halo exchanges, and
    the per-sample tensors (labels/masks) stay replicated across the
    spatial group."""
    dat = NamedSharding(mesh, P(DATA_AXIS))
    img = dat
    if SPATIAL_AXIS in mesh.axis_names:
        img = NamedSharding(mesh, P(DATA_AXIS, None, SPATIAL_AXIS))
    return {
        "images": img,
        "labels": dat,
        "label_mask": dat,
        "sample_mask": dat,
    }


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded over the batch axis (and,
    on a 2-D mesh, image height over ``spatial`` — see :func:`batch_specs`).

    Single host: a plain ``device_put`` with the batch sharding. Multi-host:
    each process passes its LOCAL slice of the global batch (leading dim =
    global_bs // process_count, see :func:`local_batch_size`) and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    ``device_put`` cannot place onto non-addressable devices."""
    specs = batch_specs(mesh)
    default = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {
            k: jax.device_put(np.asarray(v), specs.get(k, default))
            for k, v in batch.items()
            if k != "paths"
        }
    return {
        k: jax.make_array_from_process_local_data(
            specs.get(k, default), np.asarray(v)
        )
        for k, v in batch.items()
        if k != "paths"
    }


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch each host's loader must feed
    (the DistributedSampler-equivalent contract: global batch = concat of
    per-host batches in process order)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch_size {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n


def pad_batch_to_devices(batch_size: int, n_devices: int) -> int:
    """Round a global batch size up to a multiple of the mesh size."""
    return -(-batch_size // n_devices) * n_devices


def host_shard_indices(indices: list[int]) -> list[int]:
    """Per-host slice of the sample indices for multi-host training — the
    JAX-native replacement for torch's DistributedSampler (SURVEY §5): each
    host feeds its own contiguous shard of the global index list; the mesh
    sharding stitches per-host batches into the global batch. No-op on a
    single host."""
    n = jax.process_count()
    if n == 1:
        return list(indices)
    i = jax.process_index()
    per = -(-len(indices) // n)
    shard = list(indices[i * per : (i + 1) * per])
    # Pad the last host by wrapping so every host yields the same number of
    # batches (collective steps must stay in lockstep). Wrap within the
    # host's OWN shard (repeat-from-start, torch DistributedSampler
    # semantics); only an entirely empty shard borrows from the global list.
    base = tuple(shard) if shard else tuple(indices)
    j = 0
    while len(shard) < per and base:
        shard.append(base[j % len(base)])
        j += 1
    return shard


# ---------------------------------------------------------------------------
# FSDP-style parameter/optimizer sharding (ZeRO over the data axis)
# ---------------------------------------------------------------------------


def fsdp_spec(shape: tuple, n: int) -> P:
    """Partition spec for one parameter/optimizer leaf under FSDP: shard the
    LARGEST dimension divisible by the data-axis size ``n`` (ties break to
    the trailing dim — channels-last, so conv HWIO kernels shard their
    out-channel axis); leaves with no divisible dim stay replicated.

    One uniform rule for every array in the train state keeps params and
    their AdamW moments (same shapes) on identical shardings, so the
    optimizer update is fully local — the classic ZeRO layout: each device
    owns 1/n of every weight, its moments, and its slice of the update."""
    if n <= 1 or not shape:
        return P()
    best = -1
    for i, d in enumerate(shape):
        if d % n == 0 and (best < 0 or d >= shape[best]):
            best = i
    if best < 0:
        return P()
    return P(*([None] * best + [DATA_AXIS]))


def state_shardings(mesh: Mesh, state_template, fsdp: bool = False):
    """NamedShardings for a full train state (params/opt_state/step/sched).

    ``fsdp=False``: everything replicated (the plain GSPMD spatial path).
    ``fsdp=True``: every array leaf sharded per :func:`fsdp_spec` over the
    ``data`` axis — parameters, AdamW moments, and their updates are then
    1/data-size per device, and XLA turns the gradient all-reduce into a
    reduce-scatter + the forward's parameter use into per-layer all-gathers
    (ZeRO-3 semantics, derived entirely from shardings; SURVEY §2.5 — the
    reference's DDP has no equivalent, torch FSDP is the analog)."""
    n = mesh.shape[DATA_AXIS]

    def rule(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        spec = fsdp_spec(shape, n) if fsdp else P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(rule, state_template)


def place_state(state, shardings):
    """Place a (host or single-device) train state onto the mesh with the
    given shardings — one transfer per leaf, so a resumed/initialized state
    starts sharded instead of being resharded from device 0 inside the
    first step (which would momentarily hold the full state on one chip).

    Multi-host: ``device_put`` cannot target non-addressable devices (same
    constraint as :func:`shard_batch`), so each process materializes only
    its OWN addressable shards from its host copy of the global leaf via
    ``jax.make_array_from_callback`` — every host loads/inits the same
    full state (checkpoints are replicated files; init is seeded), and
    each keeps just 1/data of it."""
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), state, shardings
        )

    def place(x, s):
        host = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            host.shape, s, lambda idx: host[idx]
        )

    return jax.tree.map(place, state, shardings)


def make_state_gatherer(mesh: Mesh, state_template):
    """Jitted identity that re-shards a train state fully REPLICATED —
    the checkpointing collective for multi-host FSDP: a cross-host-sharded
    leaf cannot be ``device_get`` (non-addressable shards), so before a
    save EVERY process runs this gather together (SPMD — one rank alone
    would deadlock) and rank 0 then reads its local, complete copy.
    Built once per run (the jit caches the all-gather program)."""
    rep = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: rep, state_template)
    return jax.jit(lambda s: s, out_shardings=shardings)


def state_is_host_readable(state) -> bool:
    """True when every leaf can be ``device_get`` from this process:
    fully addressable (single-host / process-local), or fully REPLICATED —
    a multi-host replicated array has non-addressable devices, but every
    process holds complete local copies, which is exactly what device_get
    reads."""
    return all(
        getattr(leaf, "is_fully_addressable", True)
        or getattr(leaf, "is_fully_replicated", False)
        for leaf in jax.tree.leaves(state)
    )


# ---------------------------------------------------------------------------
# Tensor (channel) parallelism — inference only
# ---------------------------------------------------------------------------


def tp_spec(shape: tuple, tp: int) -> P:
    """Partition spec for one PARAMETER leaf under channel/tensor
    parallelism: shard the trailing (output-channel/feature) dimension over
    the ``tensor`` axis when divisible, else replicate.

    Covers every parameter family in the model: conv kernels HWIO and
    dense kernels IO shard their out-feature dim; 1-D leaves (biases,
    GroupNorm scale/bias) shard their channel dim so the affine stays
    aligned with the channel-sharded activations. Leaves whose trailing
    dim does not divide ``tp`` (e.g. the class-branch final conv, out
    channels = num_classes) stay replicated — GSPMD inserts the
    gather/reshard where a replicated weight meets sharded activations."""
    if tp <= 1 or not shape or shape[-1] % tp:
        return P()
    return P(*([None] * (len(shape) - 1) + [TENSOR_AXIS]))


def tp_param_shardings(mesh: Mesh, params_template):
    """NamedShardings for a parameter pytree under inference-time tensor
    parallelism (per-leaf :func:`tp_spec` over the mesh's ``tensor`` axis).

    FORWARD ONLY by design: the XLA SPMD partitioner's windowed-conv
    *gradient* bookkeeping is the precise thing we caught miscompiling
    three separate ways on 2-D meshes (docs/PARALLELISM.md), so training
    rejects a tensor axis (train/step.py) and this sharding family is used
    by the predict/eval/serving paths, where a channel-sharded forward
    cuts the B=1 latency floor (the whole point of TP for serving). The
    forward is GSPMD-semantics-preserving and is equivalence-tested on
    CPU meshes (tests/test_tensor_parallel.py)."""
    tp = mesh.shape.get(TENSOR_AXIS, 1)

    def rule(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        return NamedSharding(mesh, tp_spec(shape, tp))

    return jax.tree.map(rule, params_template)


# ---------------------------------------------------------------------------
# GSPMD fold-sharding constraints (spatial-parallel correctness)
# ---------------------------------------------------------------------------

_FOLD_MESH: Mesh | None = None


@contextmanager
def fold_sharding(mesh: Mesh | None):
    """Trace-time context: while active, :func:`constrain_folded` pins every
    (T, B, ...) -> (T*B, ...) folded activation to
    ``P(DATA_AXIS, SPATIAL_AXIS)``.

    Why this exists — an XLA SPMD partitioner miscompile, not a tuning
    knob: on a 2-D ``data x spatial`` mesh, the *backward* of a windowed
    conv whose input came from a dim-merging reshape of (replicated T,
    data-sharded B) double-counts the kernel gradient by exactly the
    spatial-axis size (jax 0.9.0, CPU backend; minimal repro: grad of
    ``sum(conv(x.reshape(T*B, H, W, C), k)**2)`` with x sharded
    ``P(None, 'data', 'spatial')`` returns 2x the true kernel grad at
    spatial=2, while the forward, 1x1 convs, and every pre-folded input
    are exact). Pinning the folded tensor's sharding right after the
    reshape removes the partitioner's wrong partial-sum bookkeeping — and
    is also the layout we want anyway (batch rows spread over ``data``,
    halo convs over ``spatial``).

    The GSPMD step/predict builders (train/step.py, evals/validator.py)
    enter this context around tracing; the single-device and shard_map
    paths never do, so their programs carry no constraints. Thread-local
    safety is not needed: jit tracing of one program is single-threaded.
    """
    global _FOLD_MESH
    prev = _FOLD_MESH
    _FOLD_MESH = mesh
    try:
        yield
    finally:
        _FOLD_MESH = prev


def _tensor_axis_for(channels: int):
    """The fold mesh's ``tensor`` axis name when active AND the channel
    count divides it; else None (replicated channel dim)."""
    if _FOLD_MESH is None or TENSOR_AXIS not in _FOLD_MESH.axis_names:
        return None
    if channels % _FOLD_MESH.shape[TENSOR_AXIS]:
        return None
    return TENSOR_AXIS


def constrain_folded(x4):
    """Pin a folded (T*B, H, W, C) activation to P(data, spatial) — or
    P(data, None, None, tensor) under a tensor-parallel mesh — when a
    GSPMD fold mesh is active (see :func:`fold_sharding`); no-op
    otherwise."""
    if _FOLD_MESH is None:
        return x4
    if SPATIAL_AXIS in _FOLD_MESH.axis_names:
        spec = P(DATA_AXIS, SPATIAL_AXIS)
    else:
        spec = P(DATA_AXIS, None, None, _tensor_axis_for(x4.shape[-1]))
    return jax.lax.with_sharding_constraint(x4, NamedSharding(_FOLD_MESH, spec))


def constrain_tbc(x3):
    """Pin a per-(timestep, sample, channel) tensor (T, B, C) — e.g. the
    folded GroupNorm statistics — to P(None, data) when a GSPMD fold mesh
    is active; no-op otherwise. The (T*B, G) -> (T, B, C) stats reshapes
    re-split the data-sharded folded axis and need the same explicit pin
    as the activations (see :func:`fold_sharding`)."""
    if _FOLD_MESH is None:
        return x3
    return jax.lax.with_sharding_constraint(
        x3,
        NamedSharding(
            _FOLD_MESH, P(None, DATA_AXIS, _tensor_axis_for(x3.shape[-1]))
        ),
    )


def constrain_micro(micro: dict) -> dict:
    """Pin the shardings of a gradient-accumulation microbatch stack when a
    GSPMD fold mesh is active; no-op otherwise.

    Accumulation reshapes every batch tensor (B, ...) -> (k, B/k, ...),
    SPLITTING the data-sharded batch axis — exactly the reshape family
    whose inferred shardings send the SPMD partitioner's conv-gradient
    bookkeeping wrong (see :func:`fold_sharding`). Each microbatch keeps
    the batch sharding with the microbatch-step axis replicated: images
    (k, B/k, T, H, W, C) -> P(None, data, None, spatial); per-sample
    tensors -> P(None, data). Note the microbatch grouping stays
    CONTIGUOUS (micro j = samples [j*B/k, (j+1)*B/k)) on every path — the
    loss normalizes by the microbatch's own target_scores_sum, so grouping
    is semantics, not layout, and must match the single-device step. The
    FSDP-specific gradient inflation needs :func:`constrain_params_rep` on
    top of these pins (these alone did not fix it)."""
    if _FOLD_MESH is None:
        return micro
    has_sp = SPATIAL_AXIS in _FOLD_MESH.axis_names

    def pin(v):
        if v.ndim == 6 and has_sp:  # (k, B/k, T, H, W, C) image stack
            spec = P(None, DATA_AXIS, None, SPATIAL_AXIS)
        else:
            spec = P(None, DATA_AXIS)
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(_FOLD_MESH, spec)
        )

    return {k: pin(v) for k, v in micro.items()}


def constrain_params_rep(tree):
    """Pin every parameter leaf replicated when a 2-D (data x spatial) fold
    mesh is active; no-op on 1-D meshes and outside a fold trace.

    Miscompile defense, same family as :func:`fold_sharding`: FSDP-sharded
    weights feeding the spatially-sharded halo convs send the partitioner's
    windowed-conv kernel-gradient bookkeeping wrong on a data x spatial
    mesh — grad_norm inflates 1.5x at spatial=2 (2.9x with grad
    accumulation on top) with a bit-exact loss, even with every activation
    pin in place, and pinning the gradient OUTPUTS does not help (the wrong
    partial sums happen upstream; measured, jax 0.9.0 CPU —
    tests/test_fsdp.py). Applying this pin at the top of the train step
    all-gathers the weights ONCE per step, so the whole forward/backward
    compiles exactly like the known-good non-FSDP spatial program, while
    the train state itself (params + AdamW moments) stays stored sharded —
    i.e. the 2-D mesh runs ZeRO-1/2 semantics (sharded state, gathered
    compute weights) instead of ZeRO-3. The 1-D FSDP mesh is measured
    exact, so no pin applies there and it keeps true per-layer-gather /
    reduce-scatter ZeRO-3 semantics."""
    if _FOLD_MESH is None or SPATIAL_AXIS not in _FOLD_MESH.axis_names:
        return tree
    rep = NamedSharding(_FOLD_MESH, P())
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, rep), tree
    )


def constrain_tb(x5):
    """Pin a time-major (T, B, H, W, C) activation to
    P(None, data, spatial) when a GSPMD fold mesh is active; no-op
    otherwise. Applied at spiking-block boundaries so every inter-block
    tensor carries an explicit sharding — the partitioner's inferred
    shardings around the fold/unfold reshapes are exactly where its
    conv-gradient bookkeeping goes wrong (see :func:`fold_sharding`)."""
    if _FOLD_MESH is None:
        return x5
    if SPATIAL_AXIS in _FOLD_MESH.axis_names:
        spec = P(None, DATA_AXIS, SPATIAL_AXIS)
    else:
        spec = P(
            None, DATA_AXIS, None, None, _tensor_axis_for(x5.shape[-1])
        )
    return jax.lax.with_sharding_constraint(x5, NamedSharding(_FOLD_MESH, spec))
