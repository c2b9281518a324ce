"""FSDP/ZeRO parameter+optimizer sharding over the data axis.

The reference is data-parallel-in-name-only (SURVEY §2.5, a single
``device: "cuda:3"`` string); this build's FSDP is the TPU-native analog
of torch FSDP / ZeRO-3: every parameter and AdamW-moment leaf is sharded
1/data per device purely via GSPMD shardings (parallel/mesh.py::
state_shardings) — XLA derives the per-layer weight all-gathers and the
gradient reduce-scatter. These tests pin (a) the sharding rule, (b) exact
step equivalence with the single-device program, (c) that the state is
REALLY sharded (per-device bytes drop), (d) composition with spatial
parallelism and grad accumulation.
"""

import numpy as np
import pytest

from tests.test_train import _batch, _tiny_cfg


@pytest.fixture(scope="module")
def setup():
    """f32 detector (same rationale as tests/test_spatial.py: sharded
    reductions reassociate f32 sums; in bf16 that epsilon can flip a LIF
    spike and the comparison stops being tight)."""
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.step import (
        init_state,
        make_optimizer,
        make_step_fns,
    )

    cfg = _tiny_cfg()
    cfg.runtime.precision = "f32"
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(17))
    tx, schedule = make_optimizer(cfg.training.learning_rate, total_steps=100)
    fns = make_step_fns(det, tx, schedule)

    def fresh_state():
        return init_state(
            jax.tree.map(lambda x: x.copy(), params), tx, schedule
        )

    return cfg, det, tx, schedule, fns, fresh_state


def test_fsdp_spec_rule():
    from jax.sharding import PartitionSpec as P

    from snn_object_detectionddp_tpu.parallel.mesh import fsdp_spec

    # Conv HWIO kernel: largest divisible dim is O (ties -> trailing).
    assert fsdp_spec((3, 3, 16, 32), 8) == P(None, None, None, "data")
    assert fsdp_spec((3, 3, 32, 32), 8) == P(None, None, None, "data")
    # Bias: 1-D divisible channel vector shards.
    assert fsdp_spec((16,), 8) == P("data")
    # No divisible dim -> replicated (sched consts, odd channel counts).
    assert fsdp_spec((3,), 8) == P()
    assert fsdp_spec((), 8) == P()
    # Degenerate axis sizes never shard.
    assert fsdp_spec((32, 32), 1) == P()


def test_fsdp_state_is_sharded(setup):
    """state_shardings(fsdp=True) must actually reduce per-device bytes:
    every leaf with a data-divisible dim carries a non-trivial spec, and a
    placed leaf's addressable shard is 1/data of the global array."""
    import jax
    from jax.sharding import PartitionSpec as P

    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        place_state,
        state_shardings,
    )

    cfg, det, tx, schedule, _fns, fresh = setup
    mesh = make_mesh(-1)  # 1-D data mesh over all 8 CPU devices
    state = fresh()
    sh = state_shardings(mesh, state, fsdp=True)
    placed = place_state(state, sh)

    n = mesh.shape["data"]
    sharded = 0
    for leaf, s in zip(
        jax.tree.leaves(placed["params"]), jax.tree.leaves(sh["params"])
    ):
        if s.spec != P():
            sharded += 1
            shard = leaf.addressable_shards[0].data
            assert shard.size * n == leaf.size
    assert sharded > 0, "no param leaf sharded — FSDP is a no-op"
    # AdamW moments mirror the param shardings (same shapes, same rule).
    mu_specs = {
        tuple(l.shape): s.spec
        for l, s in zip(
            jax.tree.leaves(placed["params"]), jax.tree.leaves(sh["params"])
        )
    }
    for leaf in jax.tree.leaves(placed["opt_state"]):
        if tuple(leaf.shape) in mu_specs and leaf.ndim:
            assert leaf.sharding.spec == mu_specs[tuple(leaf.shape)]


@pytest.mark.slow  # moved out of the fast profile (VERDICT r4 #6):
# the heavyweight exact-equivalence battery; measured 90-214 s each
def test_fsdp_matches_single_device(setup):
    """One FSDP train step on the 8-device data mesh must reproduce the
    single-device step: same loss, same grad_norm, same updated params.
    FSDP is annotations only — any divergence is a partitioner bug (the
    grad_norm assertion is the one that catches mis-scaled gradients; see
    tests/test_spatial.py for why params-after-AdamW can't)."""
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        place_state,
        shard_batch,
        state_shardings,
    )
    from snn_object_detectionddp_tpu.train.step import make_step_fns

    cfg, det, tx, schedule, fns, fresh = setup
    mesh = make_mesh(-1)
    fns_f = make_step_fns(det, tx, schedule, mesh=mesh, fsdp=True)

    batch = _batch(np.random.RandomState(23), b=8)
    state_a = fresh()
    state_b = place_state(
        fresh(), state_shardings(mesh, fresh(), fsdp=True)
    )
    state_a, m_a = fns.train_step(state_a, batch)
    state_b, m_b = fns_f.train_step(state_b, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=2e-2
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_a["params"])),
        jax.tree.leaves(jax.device_get(state_b["params"])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
    # The updated state keeps its FSDP shardings (out_shardings pin them).
    from jax.sharding import PartitionSpec as P

    assert any(
        l.sharding.spec != P() for l in jax.tree.leaves(state_b["params"])
    )

    # Eval with sharded params matches too.
    m_ea = jax.device_get(fns.eval_step(state_a["params"], batch))
    m_eb = jax.device_get(
        fns_f.eval_step(state_b["params"], shard_batch(batch, mesh))
    )
    np.testing.assert_allclose(
        float(m_ea["loss"]), float(m_eb["loss"]), rtol=2e-4
    )


@pytest.mark.slow
def test_fsdp_composes_with_spatial_and_accum(setup):
    """FSDP + spatial (2-D mesh) + grad accumulation in one program must
    still reproduce the single-device step (remat_chunk required by the
    spatial axis, as always)."""
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        place_state,
        shard_batch,
        state_shardings,
    )
    from snn_object_detectionddp_tpu.train.step import make_step_fns

    cfg, det, tx, schedule, _fns, fresh = setup
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    kwargs = dict(grad_accum=2, remat_chunk=1)
    fns_a = make_step_fns(det, tx, schedule, **kwargs)
    fns_b = make_step_fns(det, tx, schedule, mesh=mesh, fsdp=True, **kwargs)

    # h=96: single-row deepest-scale blocks are gated off (test_spatial).
    batch = _batch(np.random.RandomState(31), b=4, h=96)
    state_a = fresh()
    state_b = place_state(
        fresh(), state_shardings(mesh, fresh(), fsdp=True)
    )
    _, m_a = fns_a.train_step(state_a, batch)
    _, m_b = fns_b.train_step(state_b, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=2e-2
    )


def test_fsdp_checkpoint_roundtrip(setup, tmp_path):
    """Checkpointing a sharded train state must assemble the GLOBAL arrays
    (single-host: device_get stitches addressable shards), and a resumed
    state must re-place onto the mesh and keep training — the main.py
    resume path under mesh.fsdp."""
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        place_state,
        shard_batch,
        state_shardings,
    )
    from snn_object_detectionddp_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from snn_object_detectionddp_tpu.train.step import make_step_fns

    cfg, det, tx, schedule, _fns, fresh = setup
    mesh = make_mesh(-1)
    fns = make_step_fns(det, tx, schedule, mesh=mesh, fsdp=True)
    sh = state_shardings(mesh, fresh(), fsdp=True)

    batch = _batch(np.random.RandomState(41), b=8)
    state = place_state(fresh(), sh)
    state, _ = fns.train_step(state, shard_batch(batch, mesh))

    path = tmp_path / "ckpt.pt"
    save_checkpoint(path, state, epoch=3, best_val_loss=1.5)
    restored = load_checkpoint(path, fresh())
    # Saved arrays are the assembled GLOBAL state, not one device's shard.
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state["params"])),
        jax.tree.leaves(restored["state"]["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["epoch"]) == 3

    # Resume: re-place sharded and take another step (finite loss).
    resumed = place_state(restored["state"], sh)
    _, m = fns.train_step(resumed, shard_batch(batch, mesh))
    assert np.isfinite(float(m["loss"]))


def test_fsdp_requires_mesh(setup):
    """fsdp=True without a mesh must fail loudly, not silently train
    un-sharded (same posture as the pallas-LIF / missing-remat checks)."""
    from snn_object_detectionddp_tpu.train.step import make_step_fns

    cfg, det, tx, schedule, _fns, _fresh = setup
    with pytest.raises(ValueError, match="requires a device mesh"):
        make_step_fns(det, tx, schedule, fsdp=True)


def test_fsdp_1d_skips_spatial_geometry_gate(setup):
    """The halo-geometry gate is about SPATIAL sharding; a 1-D FSDP mesh
    must accept any image height (here 32 px: deepest scale is a single
    row, which a spatial mesh would reject). Traced via .lower() — the
    gate runs at trace time, so no compile/execute is needed."""
    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        state_shardings,
    )
    from snn_object_detectionddp_tpu.train.step import make_step_fns

    cfg, det, tx, schedule, _fns, fresh = setup
    mesh = make_mesh(-1)
    fns = make_step_fns(det, tx, schedule, mesh=mesh, fsdp=True)
    state = fresh()
    batch = shard_batch(_batch(np.random.RandomState(2), b=8, h=32), mesh)
    import jax

    sh = state_shardings(mesh, state, fsdp=True)
    abstract = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state,
        sh,
    )
    fns.train_step.lower(abstract, batch)  # raises if the gate misfires


def test_fsdp_rejects_pallas_lif(setup):
    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.parallel.mesh import make_mesh
    from snn_object_detectionddp_tpu.train.step import make_step_fns

    cfg, det, tx, schedule, _fns, _fresh = setup
    cfg2 = _tiny_cfg()
    cfg2.runtime.lif_kernel = "pallas"
    det2 = Detector.from_config(cfg2)
    try:
        with pytest.raises(ValueError, match="partitionable LIF"):
            make_step_fns(det2, tx, schedule, mesh=make_mesh(-1), fsdp=True)
    finally:
        Detector.from_config(cfg)  # restore process-global LIF impl
