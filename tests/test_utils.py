"""Shared utility helpers: one-slot pipelining, backend probing."""


def test_delayed_fetch_drains_one_late_and_flushes():
    from snn_object_detectionddp_tpu.utils.pipelining import DelayedFetch

    seen = []
    f = DelayedFetch(lambda *a: seen.append(a))
    for i in range(3):
        f.push(i, i * 10)
    # Exactly one item in flight: the last push is not drained yet.
    assert seen == [(0, 0), (1, 10)]
    f.flush()
    assert seen == [(0, 0), (1, 10), (2, 20)]
    f.flush()  # idempotent
    assert len(seen) == 3


def test_delayed_fetch_empty_flush():
    from snn_object_detectionddp_tpu.utils.pipelining import DelayedFetch

    f = DelayedFetch(lambda *a: (_ for _ in ()).throw(AssertionError()))
    f.flush()  # nothing pushed: must not call the callback


def test_probe_backend_returns_device_count():
    from snn_object_detectionddp_tpu.utils.backend import (
        probe_backend,
        require_backend,
    )

    n = probe_backend(120.0)
    assert n is not None and n >= 1  # conftest forces the 8-dev CPU mesh
    assert require_backend(120.0) == n
