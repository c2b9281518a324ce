"""Checkpointing: ``latest.pt`` / ``best.pt`` single files under save_dir.

Keeps the reference's naming and resume semantics
(reference: train.py:201-241, main.py:133-151): a checkpoint per epoch at
``<save_dir>/latest.pt``, a copy at ``best.pt`` on val-loss improvement,
``resume_training`` + ``weights_path`` to continue, and warn-and-fresh-init
when the path is missing. Two deliberate fixes over the reference
(SURVEY §2.7): optimizer/schedule state IS saved (resume continues the
OneCycle schedule instead of restarting it), and ``latest.pt`` records the
post-epoch best_val_loss rather than the stale pre-epoch value.

Format: flax msgpack serialization of the host-fetched train-state pytree —
a single file like the reference's torch.save output, atomic via
write-to-temp + rename. (Orbax was tried first; its restore path deadlocks
under this machine's tunneled TPU backend, and a single-host single-file
format needs none of its machinery.)
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _pack(state: dict, epoch: int, best_val_loss: float) -> dict:
    return {
        "state": jax.device_get(state),
        "epoch": np.int32(epoch),
        "best_val_loss": np.float32(best_val_loss),
    }


def save_checkpoint(
    path: str | Path, state: dict, epoch: int, best_val_loss: float
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.to_bytes(_pack(state, epoch, best_val_loss))
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)  # atomic on POSIX


class AsyncCheckpointer:
    """Checkpoint off the training critical path.

    Device-to-host readback on this machine's tunneled TPU runs at ~1 MB/s,
    so a synchronous per-epoch save (reference semantics, train.py:201-241)
    stalls training for minutes. This helper snapshots the state with an
    on-device copy (cheap, and safe against the train step's buffer
    donation) and performs device_get + serialization + file writes in a
    background thread. ``wait()`` joins the in-flight save; saves never
    overlap.
    """

    def __init__(self):
        self._thread = None

    def save(
        self,
        state: dict,
        epoch: int,
        best_val_loss: float,
        latest_path: str | Path,
        best_path: str | Path | None = None,
    ) -> None:
        import jax.numpy as jnp

        self.wait()  # one in-flight save at a time
        # On-device snapshot: the caller's buffers will be donated to the
        # next train step while the background thread reads. Host-numpy
        # leaves (multi-host FSDP saves pass a pre-gathered host state)
        # are already detached from donation — copying them through
        # jnp.copy would pointlessly re-upload the full state.
        snap = jax.tree.map(
            lambda x: x if isinstance(x, np.ndarray) else jnp.copy(x), state
        )

        def job():
            host = jax.device_get(snap)
            save_checkpoint(latest_path, host, epoch, best_val_loss)
            if best_path is not None:
                save_checkpoint(best_path, host, epoch, best_val_loss)

        import threading

        self._thread = threading.Thread(target=job, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            self._thread.join()
        self._thread = None


def _migrate_legacy_gn(params, template):
    """Round-1 -> round-2 param-layout migration: SpikingConvBlock's
    fused GroupNorm renamed ``GroupNorm_0/{scale,bias}`` to in-block
    ``gn_scale``/``gn_bias`` (models/layers.py split-GN fusion). Rewrites
    a raw restored params dict in the old layout so pre-fusion
    checkpoints keep loading; identical math, so the weights transfer
    exactly. Template-guided: only dicts whose template counterpart
    expects ``gn_scale`` are rewritten (the non-spiking decoder/head
    ConvBlocks legitimately keep a real ``GroupNorm_0`` submodule).
    Returns (params, migrated_count)."""
    n = 0

    def walk(d, t):
        nonlocal n
        if not isinstance(d, dict) or not isinstance(t, dict):
            return d
        out = {}
        for k, v in d.items():
            if (
                k == "GroupNorm_0"
                and isinstance(v, dict)
                and set(v) <= {"scale", "bias"}
                and "gn_scale" in t
                and "GroupNorm_0" not in t
                and "gn_scale" not in d
            ):
                if "scale" in v:
                    out["gn_scale"] = v["scale"]
                if "bias" in v:
                    out["gn_bias"] = v["bias"]
                n += 1
            else:
                out[k] = walk(v, t.get(k))
        return out

    return walk(params, template), n


def load_checkpoint(path: str | Path, template_state: dict) -> dict:
    """Restore against a template pytree (structure only).

    The template may hold real arrays OR ``jax.eval_shape`` abstract leaves
    — build it with eval_shape to avoid any device work on the load path
    (device transfers through this machine's TPU tunnel run at ~3 MB/s, so
    a needless init + device_get costs minutes).
    """
    template = {
        "state": template_state,  # no device_get: structure only
        "epoch": np.int32(0),
        "best_val_loss": np.float32(0),
    }
    data = Path(path).read_bytes()
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError):
        # Back-compat: checkpoint written by an older build whose train-state
        # structure differs (e.g. pre-dynamic-schedule optimizer wrapper).
        # Restore params/epoch/best_val_loss structurally from raw msgpack
        # and keep the template's fresh optimizer/schedule state — the same
        # semantics as the reference's resume, which restores only
        # model_state_dict (main.py:140).
        raw = serialization.msgpack_restore(data)
        out = {
            "state": dict(template_state),
            "epoch": np.asarray(raw.get("epoch", 0), np.int32),
            "best_val_loss": np.asarray(
                raw.get("best_val_loss", np.inf), np.float32
            ),
        }
        raw_params = raw.get("state", {}).get("params")
        if raw_params is None:
            raise
        raw_params, migrated = _migrate_legacy_gn(
            raw_params, template_state["params"]
        )
        if migrated:
            print(
                f"NOTE: migrated {migrated} GroupNorm_0 param groups to "
                "the fused gn_scale/gn_bias layout."
            )
        out["state"]["params"] = serialization.from_state_dict(
            template_state["params"], raw_params
        )
        print(
            "NOTE: checkpoint optimizer-state structure does not match this "
            "run's optimizer; restored params only (fresh optimizer/schedule "
            "state). Likely causes: model.freeze_backbone or "
            "training.param_groups toggled since the checkpoint was written "
            "(both change the opt_state pytree), or a checkpoint from an "
            "older build."
        )
        return out


def load_backbone_params(
    path: str | Path, template_params: dict, subtree: str = "backbone"
) -> dict:
    """Shape-checked partial restore of one top-level param subtree.

    The TPU counterpart of the reference's pretrained-feature transfer
    (reference: model.py:74-98 loads frozen COCO YOLO11m weights): load only
    ``params[subtree]`` from a checkpoint written by this repo into freshly
    initialized params, leaving every other module (unet, head) at its
    fresh init. Returns a NEW params dict. Raises with an actionable
    message when the checkpoint lacks the subtree or any leaf's shape
    disagrees with the template (e.g. a different width preset).
    """
    if subtree not in template_params:
        raise ValueError(
            f"template params have no '{subtree}' subtree; "
            f"top-level keys: {sorted(template_params)}"
        )
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    raw_params = (raw.get("state") or {}).get("params")
    if raw_params is None:
        raise ValueError(
            f"checkpoint '{path}' has no state/params tree "
            "(not a checkpoint written by this repo?)"
        )
    raw_sub = raw_params.get(subtree)
    if raw_sub is None:
        raise ValueError(
            f"checkpoint '{path}' has no '{subtree}' params; "
            f"top-level keys: {sorted(raw_params)}"
        )
    template_sub = template_params[subtree]
    raw_sub, migrated = _migrate_legacy_gn(raw_sub, template_sub)
    if migrated:
        print(
            f"NOTE: migrated {migrated} legacy GroupNorm_0 groups in the "
            f"restored {subtree} params."
        )
    try:
        restored = serialization.from_state_dict(template_sub, raw_sub)
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint '{path}' {subtree} structure does not match this "
            f"model (different depth/preset?): {e}"
        ) from e
    # from_state_dict matches structure only; verify shapes leaf-by-leaf so
    # a width mismatch fails HERE with the leaf name, not as a shape error
    # deep inside the first jitted step.
    t_leaves = jax.tree_util.tree_flatten_with_path(template_sub)[0]
    r_leaves = jax.tree_util.tree_flatten_with_path(restored)[0]
    bad = [
        (jax.tree_util.keystr(kp), tuple(tv.shape), tuple(rv.shape))
        for (kp, tv), (_, rv) in zip(t_leaves, r_leaves)
        if tuple(tv.shape) != tuple(rv.shape)
    ]
    if bad:
        detail = "; ".join(
            f"{name}: expected {ts}, checkpoint has {rs}"
            for name, ts, rs in bad[:5]
        )
        raise ValueError(
            f"checkpoint '{path}' {subtree} shapes do not match this model "
            f"({len(bad)} mismatched leaves — different width preset / "
            f"width_mult?): {detail}"
        )
    print(
        f"Initialized {subtree} from '{path}' "
        f"({len(r_leaves)} param leaves)."
    )
    out = dict(template_params)
    out[subtree] = restored
    return out


def resume_or_init(
    cfg, template_state: dict, init_fn=None
) -> tuple[dict, int, float]:
    """Reference resume semantics (main.py:133-151).

    Returns (state, start_epoch, best_val_loss). ``init_fn`` builds the
    real initial state on a fresh (non-resumed) start — the hook where the
    reference applies its weight-init recipe (main.py:147-151). Pass an
    ``jax.eval_shape`` template to keep the resume path free of device
    work.
    """
    if cfg.training.resume_training:
        weights_path = Path(cfg.training.weights_path)
        if weights_path.exists():
            print(f"Resuming training: Loading from {weights_path}")
            try:
                packed = load_checkpoint(weights_path, template_state)
            except Exception as e:
                # Failure recovery (SURVEY §5): a torn/corrupt checkpoint
                # (killed writer, bad disk) must not strand a training
                # job — warn and fall through to a fresh start, the same
                # soft-fail contract as a missing file. Writes are atomic
                # (tmp+rename), so this catches external corruption, not
                # our own interrupted saves. Eval CLIs still raise: random
                # weights at eval time would be silent nonsense.
                print(
                    f"WARNING: checkpoint '{weights_path}' is unreadable "
                    f"({type(e).__name__}: {e}); starting fresh."
                )
            else:
                best = float(packed["best_val_loss"])
                print(
                    "Successfully loaded model and found previous "
                    f"best_val_loss: {best}"
                )
                return packed["state"], int(packed["epoch"]) + 1, best
        else:
            print(
                f"WARNING: 'resume_training' is True but weights_path "
                f"'{weights_path}' not found."
            )
        print("Initializing model from scratch...")
    else:
        print("Initializing new model from scratch...")
    if init_fn is not None:
        # Fresh start: materialize real parameters (the template may be
        # abstract eval_shape structure).
        return init_fn(), 0, float("inf")
    return template_state, 0, float("inf")
