"""Profiling and FLOPs instrumentation.

The JAX-side counterpart of the reference's torch.profiler usage
(reference: utils.py:385-414 — per-model FLOPs with profiler overhead
isolated) and its manual FPS segmentation (reference: eval.py:62-91,
153-183):

- :func:`trace`: context manager writing a jax.profiler trace viewable in
  TensorBoard / Perfetto.
- :func:`flops_of`: static FLOPs of a jitted callable from XLA cost
  analysis (replaces ``model.info()[3]`` / profiler FLOPs counting).
- :class:`Stopwatch`: retrieval-vs-compute wall-time segmentation with the
  reference's FPS incl/excl report shape.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('runs/profile'): ...`` -> TensorBoard-viewable trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of(jitted_fn, *example_args) -> float:
    """Total FLOPs of one call, from the compiled executable's cost model."""
    lowered = jitted_fn.lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def device_memory_stats() -> dict:
    """Per-device HBM usage (bytes) where the backend exposes it."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out


class Stopwatch:
    """Segmented wall-clock accounting (reference: eval.py:62-91)."""

    def __init__(self):
        self.segments: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.segments[name] = self.segments.get(name, 0.0) + (
                time.perf_counter() - t0
            )
            self.counts[name] = self.counts.get(name, 0) + 1

    def fps_report(self, num_frames: int) -> dict:
        total = sum(self.segments.values())
        compute = total - self.segments.get("retrieval", 0.0)
        return {
            "num_frames": num_frames,
            "fps_incl_retrieval": num_frames / max(total, 1e-9),
            "fps_excl_retrieval": num_frames / max(compute, 1e-9),
            "segments_s": dict(self.segments),
        }
