"""Config system: the reference's ``config.yaml`` schema plus TPU extensions.

The reference drives everything from a single YAML file loaded with
``yaml.safe_load`` (reference: main.py:120-121, config.yaml:1-37). We keep
that schema byte-compatible — a reference config.yaml loads unchanged — and
add validated dataclasses, TPU-specific keys (``model.timesteps``,
``model.spike``, ``mesh``, ``runtime``), and an optional ``--config`` path
override (the reference hardcodes the filename).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml


@dataclass
class SplitConfig:
    """One dataset split (reference: config.yaml:1-10)."""

    path: str = ""
    seq_len: int = 5


@dataclass
class DatasetConfig:
    train: SplitConfig = field(default_factory=SplitConfig)
    val: SplitConfig = field(default_factory=SplitConfig)
    test: SplitConfig = field(default_factory=SplitConfig)

    def split(self, mode: str) -> SplitConfig:
        if mode not in ("train", "val", "test"):
            raise ValueError(
                f"Invalid mode '{mode}'. Choose from 'train', 'val', or 'test'."
            )
        return getattr(self, mode)


@dataclass
class TrainingConfig:
    """Reference: config.yaml:18-27."""

    seed: int = 42
    epochs: int = 10
    batch_size: int = 64
    num_workers: int = 4
    learning_rate: float = 1e-4  # peak LR of the OneCycle schedule
    weight_decay: float = 5e-4
    save_dir: str = "runs/train/exp1"
    resume_training: bool = False
    weights_path: str = "runs/train/exp1/latest.pt"
    # TPU extensions
    grad_clip_norm: float = 10.0  # reference: train.py:77
    pct_start: float = 0.3  # OneCycle warmup fraction (reference: train.py:167)
    remat: bool = False  # jax.checkpoint over the whole temporal forward
    # Long-T BPTT: checkpoint per time-chunk of this size (activation memory
    # scales with one chunk, not the window). 0 = off. T % chunk must be 0.
    remat_chunk: int = 0
    # Remat policy for the checkpointed regions: "full" recomputes the
    # whole chunk forward; "save_conv" keeps the MXU conv outputs and
    # recomputes only the elementwise GN/LIF/gate chain (train/step.py).
    remat_policy: str = "full"
    # Gradient accumulation: microbatches per optimizer step (activation
    # memory ~ one microbatch; grads averaged). 1 = off. batch_size % k == 0.
    grad_accum_steps: int = 1
    param_groups: bool = False  # discriminative LR groups (train/param_groups.py)
    save_every_epochs: int = 1  # checkpoint write cadence; the best state is
    # snapshotted on-device at every improvement regardless, so best.pt is
    # exact even with sparse writes (slow-storage hosts)


@dataclass
class HypConfig:
    """Detection-loss gains (reference: config.yaml:33-37, model.py:154)."""

    box: float = 7.5
    cls: float = 1.0
    dfl: float = 2.5
    reg_max: int = 16


@dataclass
class SpikeConfig:
    """LIF neuron parameters (TPU/SNN extension; see models/lif.py)."""

    threshold: float = 1.0
    # Membrane leak per timestep. Low decay is the validated default for
    # video (frame-as-timestep) mode: with strong decay the backbone
    # membranes superimpose MOVING objects across frames and box regression
    # degrades badly (A/B on synthetic DSEC: decay 0.5 -> val loss 104.6,
    # decay 0.05 -> 51.8, and T=5 then beats single-frame training). The
    # recurrent bottleneck carries the long-range temporal context instead.
    decay: float = 0.05
    surrogate_slope: float = 4.0  # steepness of the surrogate derivative
    reset: str = "soft"  # "soft" (subtract threshold) or "hard" (to zero)


@dataclass
class ModelConfig:
    """Reference: config.yaml:29-37 plus SNN/TPU extensions."""

    num_classes: int = 8
    # Kept for schema compatibility with the reference (config.yaml:31);
    # selects the backbone width preset: 'yolo11n.pt'|'yolo11s.pt'|'yolo11m.pt'.
    yolo_model_name: str = "yolo11m.pt"
    use_conv_lstm: bool = True  # ConvLSTM bottleneck vs LIF accumulator bottleneck
    hyp: HypConfig = field(default_factory=HypConfig)
    # --- TPU/SNN extensions ---
    timesteps: int = 4  # T for single-image spike-encoded inference
    image_size: tuple[int, int] = (480, 640)  # (H, W); DSEC native resolution
    max_boxes: int = 64  # fixed-shape label padding per image
    spike: SpikeConfig = field(default_factory=SpikeConfig)
    bottleneck: str = "convlstm"  # "convlstm" | "lif" | "lstm" (token LSTM,
    # the reference's use_conv_lstm=False variant); resolved from
    # use_conv_lstm when absent
    width_mult: float = 1.0  # backbone width scale on top of the preset
    stem: str = "s2d4"  # "s2d4" (one-shot 4x4 space-to-depth) | "s2d" | "conv"
    # Backbone transfer (the TPU counterpart of the reference's frozen
    # pretrained feature extractor, reference: model.py:74-98): path to a
    # checkpoint (latest.pt/best.pt from a prior run) whose BACKBONE params
    # initialize a fresh run (shape-checked partial restore; ignored when
    # resume_training restores a full state). Empty/None = scratch init.
    backbone_init: str | None = None
    # Freeze the backbone during training: backbone leaves get zero
    # updates (optax.masked set_to_zero on their grads + weight decay
    # masked off), mirroring the reference's frozen extractor semantics
    # (reference: model.py:84-86, always-eval backbone).
    freeze_backbone: bool = False


@dataclass
class MeshConfig:
    """Device-mesh spec (TPU extension; replaces the reference's single
    ``device: "cuda:3"`` string, config.yaml:13)."""

    data: int = -1  # data-parallel axis size; -1 = all visible devices
    # Spatial parallelism (GSPMD): partition activation image-height over
    # this many devices per replica. The model must run a pure-XLA LIF path
    # (runtime.lif_kernel auto/unrolled/xla) — the SPMD partitioner cannot
    # split a Pallas custom call. mesh = data x spatial devices.
    spatial: int = 1
    # FSDP/ZeRO: shard parameters + AdamW moments over the data axis
    # (each device holds 1/data of every weight; XLA derives the per-layer
    # all-gathers and the gradient reduce-scatter from the shardings).
    # Uses the GSPMD sharding-annotation step, so like spatial it requires
    # a partitionable LIF path (not "pallas").
    fsdp: bool = False
    # Tensor (channel) parallelism — INFERENCE ONLY: shard conv output
    # channels + activations over this many devices per replica to cut
    # single-image latency (the serving/streaming axis; training rejects
    # it — docs/PARALLELISM.md). mesh = data x tensor devices. Like
    # spatial/fsdp it requires a partitionable (non-Pallas) LIF path.
    tensor: int = 1
    # --- multi-host (DCN) launch keys; None = single host. Env-var
    # fallbacks COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID let one
    # shared config.yaml drive every host of a pod slice
    # (parallel/mesh.py::maybe_init_distributed).
    coordinator: str | None = None  # "host:port" of process 0
    num_processes: int | None = None  # total host processes (auto on TPU pods)
    process_id: int | None = None  # this host's rank (auto on TPU pods)


@dataclass
class RuntimeConfig:
    precision: str = "bf16"  # compute dtype for convs/matmuls: "bf16" | "f32"
    prefetch: int = 2  # device-prefetch depth of the input pipeline
    lif_kernel: str = "auto"  # "auto" | "manual" | "unrolled" | "pallas" | "xla"
    debug_nans: bool = False  # jax debug_nans NaN-origin tracing (utils/debug.py)


@dataclass
class Config:
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    mode: str = "train"  # train | visualize | test | eval (reference: main.py:153-158)
    device: str = "tpu"  # kept for schema compat (reference: config.yaml:13)
    debug_train: bool = False
    debug_test: bool = False
    training: TrainingConfig = field(default_factory=TrainingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        return _build(cls, raw or {})


def _build(dc_type, raw: Any):
    """Recursively build a dataclass from a raw dict, validating keys/types."""
    if not dataclasses.is_dataclass(dc_type):
        return raw
    if raw is None:
        raw = {}
    if not isinstance(raw, dict):
        raise TypeError(f"Expected mapping for {dc_type.__name__}, got {type(raw)}")
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            raise KeyError(
                f"Unknown config key '{key}' for section {dc_type.__name__}; "
                f"valid keys: {sorted(fields)}"
            )
        # Resolve dataclass field types (string annotations under __future__).
        resolved = _FIELD_TYPES.get((dc_type.__name__, key))
        if resolved is not None:
            kwargs[key] = _build(resolved, value)
        elif key == "image_size" and value is not None:
            kwargs[key] = tuple(int(v) for v in value)
        else:
            kwargs[key] = value
    obj = dc_type(**kwargs)
    _validate(obj)
    return obj


# Nested-section field types (string annotations make f.type non-introspectable).
_FIELD_TYPES = {
    ("Config", "dataset"): DatasetConfig,
    ("Config", "training"): TrainingConfig,
    ("Config", "model"): ModelConfig,
    ("Config", "mesh"): MeshConfig,
    ("Config", "runtime"): RuntimeConfig,
    ("DatasetConfig", "train"): SplitConfig,
    ("DatasetConfig", "val"): SplitConfig,
    ("DatasetConfig", "test"): SplitConfig,
    ("ModelConfig", "hyp"): HypConfig,
    ("ModelConfig", "spike"): SpikeConfig,
}


def _validate(obj) -> None:
    if isinstance(obj, Config):
        if obj.mode not in ("train", "visualize", "test", "eval"):
            raise ValueError(f"Invalid mode '{obj.mode}'")
    elif isinstance(obj, TrainingConfig):
        if obj.batch_size < 1:
            raise ValueError("training.batch_size must be >= 1")
        if obj.epochs < 1:
            raise ValueError("training.epochs must be >= 1")
        if not (0.0 < obj.pct_start < 1.0):
            raise ValueError("training.pct_start must be in (0, 1)")
        if obj.remat_policy not in ("full", "save_conv"):
            raise ValueError(
                "training.remat_policy must be 'full' or 'save_conv'"
            )
    elif isinstance(obj, ModelConfig):
        if obj.num_classes < 1:
            raise ValueError("model.num_classes must be >= 1")
        if obj.hyp.reg_max < 2:
            raise ValueError("model.hyp.reg_max must be >= 2")
        if obj.timesteps < 1:
            raise ValueError("model.timesteps must be >= 1")
    elif isinstance(obj, SpikeConfig):
        if obj.reset not in ("soft", "hard"):
            raise ValueError("model.spike.reset must be 'soft' or 'hard'")
    elif isinstance(obj, MeshConfig):
        if obj.spatial < 1:
            raise ValueError("mesh.spatial must be >= 1")
        if obj.tensor < 1:
            raise ValueError("mesh.tensor must be >= 1")
        if obj.spatial > 1 and obj.tensor > 1:
            raise ValueError(
                "mesh.spatial and mesh.tensor cannot both exceed 1 "
                "(untested composition; pick one model-parallel axis)"
            )
    elif isinstance(obj, RuntimeConfig):
        if obj.precision not in ("bf16", "f32"):
            raise ValueError("runtime.precision must be 'bf16' or 'f32'")
        if obj.lif_kernel not in ("auto", "manual", "unrolled", "pallas", "xla"):
            raise ValueError(
                "runtime.lif_kernel must be auto|manual|unrolled|pallas|xla"
            )


def apply_device(cfg: Config) -> None:
    """Honor ``device: "cpu"`` by forcing the JAX platform.

    The reference selects its device with a config string (``device:
    "cuda:3"``, config.yaml:13); here accelerator strings map to "all
    visible chips form the mesh" and need no action, but ``"cpu"`` must
    force the platform BEFORE the first backend touch — the tunneled TPU
    plugin ignores the JAX_PLATFORMS env var, and when its relay is down
    any accidental TPU backend init hangs forever. No-op once a backend
    is already initialized (jax raises; we leave the existing platform)."""
    if str(cfg.device).lower() != "cpu":
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; too late to switch


def load_config(path: str | Path = "config.yaml") -> Config:
    """Load and validate a YAML config (reference: main.py:120-121).

    Side effect: ``device: "cpu"`` forces the JAX platform to CPU (see
    :func:`apply_device`) — every CLI entry point loads its config before
    touching a backend, so this is the one reliable hook."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    cfg = Config.from_dict(raw)
    # Back-compat: resolve the bottleneck kind from use_conv_lstm when the
    # raw YAML didn't set `bottleneck` (reference semantics: config.yaml:32).
    raw_model = (raw or {}).get("model") or {}
    if "bottleneck" not in raw_model:
        cfg.model.bottleneck = "convlstm" if cfg.model.use_conv_lstm else "lif"
    apply_device(cfg)
    return cfg
