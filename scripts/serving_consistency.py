"""Serving-bench consistency check (VERDICT r4 next #4 'done' criterion):
run bench.measure_serving N times back-to-back and report whether the
TRIMMED serving stats agree within +/-20% across runs (raw stats are
expected to disagree under relay stalls — that is what the trimming is
for). Prints one JSON line per run plus a verdict line.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/serving_consistency.py [N]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for i in range(n):
        r = bench.measure_serving()
        runs.append(r)
        print(json.dumps({"run": i, **r}), flush=True)
    keys = [
        "serving_qps_8streams_trimmed",
        "serving_p50_ms_8streams_trimmed",
        "serving_p99_ms_8streams_trimmed",
        "serving_device_qps_8streams",
    ]
    ok = True
    for k in keys:
        vals = [r[k] for r in runs]
        lo, hi = min(vals), max(vals)
        mid = sum(vals) / len(vals)
        spread = (hi - lo) / mid if mid else 0.0
        ok &= spread <= 0.4  # +/-20% around the mean
        print(f"{k}: {vals} spread={spread:.1%}", flush=True)
    print(f"CONSISTENT={'yes' if ok else 'no'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
