import numpy as np

from snn_object_detectionddp_tpu.train.schedule import (
    onecycle_lr,
    onecycle_schedule,
)


def test_dynamic_onecycle_matches_optax():
    for total, pct, peak in [(100, 0.3, 1e-3), (420, 0.3, 2e-3), (37, 0.5, 1e-4)]:
        ref = onecycle_schedule(peak, total, pct)
        steps = np.arange(total + 5)
        got = np.array([float(onecycle_lr(s, total, peak, pct)) for s in steps])
        want = np.array([float(ref(s)) for s in steps])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-10)  # f32 cos tail
