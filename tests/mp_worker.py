"""Worker for the 2-process distributed CPU test (tests/test_multiprocess.py).

Each process hosts 4 virtual CPU devices; together they form an 8-device
global mesh over a real jax.distributed coordinator — exercising
init_distributed, local_batch_size, shard_batch's
make_array_from_process_local_data path, host_shard_indices, and a jitted
cross-process reduction.

Run: python tests/mp_worker.py <process_id> <coordinator_addr>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    pid = int(sys.argv[1])
    coord = sys.argv[2]

    from snn_object_detectionddp_tpu.parallel.mesh import (
        host_shard_indices,
        init_distributed,
        local_batch_size,
        make_mesh,
        shard_batch,
    )

    init_distributed(coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = make_mesh()  # 8 global devices, 1-D data axis

    # --- DistributedSampler-equivalent contract --------------------------
    bs_local = local_batch_size(8)
    assert bs_local == 4

    idx = list(range(10))
    shard = host_shard_indices(idx)
    assert shard == ([0, 1, 2, 3, 4] if pid == 0 else [5, 6, 7, 8, 9]), shard
    # Wrap-padding stays within the host's own shard.
    shard9 = host_shard_indices(list(range(9)))
    assert shard9 == ([0, 1, 2, 3, 4] if pid == 0 else [5, 6, 7, 8, 5]), shard9

    # --- Global batch assembly from per-process local slices -------------
    local = (np.arange(bs_local, dtype=np.float32) + 100.0 * pid).reshape(
        bs_local, 1
    )
    batch = shard_batch({"x": local, "paths": ["ignored"]}, mesh)
    x = batch["x"]
    assert x.shape == (8, 1), x.shape  # global shape, not local

    @jax.jit
    def total(x):
        return jnp.sum(x)

    s = float(jax.device_get(total(x)))
    expected = float(sum(range(4)) + sum(100 + i for i in range(4)))  # 412
    assert s == expected, (s, expected)

    # --- multi-host FSDP state placement ---------------------------------
    # place_state must build each leaf from the host's copy WITHOUT
    # device_put onto non-addressable devices (make_array_from_callback
    # path): every process holds the same full array, keeps 1/data of it.
    from snn_object_detectionddp_tpu.parallel.mesh import (
        place_state,
        state_shardings,
    )

    state = {"w": np.arange(32, dtype=np.float32).reshape(8, 4)}
    sh = state_shardings(mesh, state, fsdp=True)
    placed = place_state(state, sh)
    w = placed["w"]
    assert w.shape == (8, 4), w.shape  # global logical shape
    for shard in w.addressable_shards:  # 4 local devices, 1 row each
        row = int(shard.index[0].start)
        np.testing.assert_array_equal(
            np.asarray(shard.data), state["w"][row : row + 1]
        )
    assert float(jax.device_get(total(w))) == float(state["w"].sum())

    # --- multi-host FSDP checkpoint gather --------------------------------
    # Cross-host-sharded leaves are NOT host-readable; the save path must
    # gather-to-replicated as a collective (all ranks together), after
    # which any rank can device_get its local complete copy.
    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_state_gatherer,
        state_is_host_readable,
    )

    assert not state_is_host_readable(placed)
    gathered = make_state_gatherer(mesh, placed)(placed)
    assert state_is_host_readable(gathered)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(gathered["w"])), state["w"]
    )

    print(f"MP_OK pid={pid} sum={s}", flush=True)


def main_train() -> None:
    """End-to-end multi-host CLI-path training: exactly what `python
    main.py` does on each host of a pod slice — maybe_init_distributed from
    the shared config (rank from the PROCESS_ID env var), then
    main.train_code over the real data pipeline, sharded steps, and
    checkpoint writes (rank 0 only)."""
    cfg_path = sys.argv[2]

    from snn_object_detectionddp_tpu.config import load_config
    from snn_object_detectionddp_tpu.parallel.mesh import maybe_init_distributed

    cfg = load_config(cfg_path)
    maybe_init_distributed(cfg)
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    import main as main_mod
    from snn_object_detectionddp_tpu.models.detector import Detector

    detector = Detector.from_config(cfg)
    main_mod.train_code(cfg, detector)

    from pathlib import Path

    latest = Path(cfg.training.save_dir) / "latest.pt"
    if pid == 0:
        assert latest.exists(), "rank 0 must write latest.pt"
    else:
        # Non-main ranks must not have raced the checkpoint writes.
        pass
    print(f"MP_TRAIN_OK pid={pid}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        main_train()
    else:
        main()
