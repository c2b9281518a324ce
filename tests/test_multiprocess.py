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
