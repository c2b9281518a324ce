import numpy as np
import pytest

from snn_object_detectionddp_tpu.config import Config


def _tiny_cfg():
    cfg = Config()
    cfg.model.num_classes = 3
    cfg.model.yolo_model_name = "yolo11n.pt"
    cfg.model.width_mult = 0.25
    cfg.model.hyp.reg_max = 8
    cfg.model.max_boxes = 8
    cfg.training.batch_size = 2
    cfg.training.learning_rate = 1e-3
    return cfg


def _batch(rng, b=2, t=2, h=64, w=64, m=8):
    images = rng.randint(0, 255, size=(b, t, h, w, 3), dtype=np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    labels[:, 0] = [1.0, 0.5, 0.5, 0.4, 0.4]
    mask[:, 0] = True
    return {
        "images": images,
        "labels": labels,
        "label_mask": mask,
        "sample_mask": np.ones((b,), bool),
    }


@pytest.fixture(scope="module")
def setup():
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.step import (
        init_state,
        make_optimizer,
        make_step_fns,
    )

    cfg = _tiny_cfg()
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    tx, schedule = make_optimizer(cfg.training.learning_rate, total_steps=100)
    fns = make_step_fns(det, tx, schedule)

    def fresh_state():
        # train_step donates its state arg; every test needs its own copy.
        return init_state(
            jax.tree.map(lambda x: x.copy(), params), tx, schedule
        )

    return cfg, det, tx, schedule, fns, fresh_state


def test_train_step_reduces_loss(setup):
    cfg, det, tx, schedule, fns, fresh_state = setup
    state = fresh_state()
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    losses = []
    for _ in range(20):
        state, metrics = fns.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < 0.9 * losses[0]
    assert float(metrics["grad_norm"]) > 0


def test_eval_step_runs(setup):
    cfg, det, tx, schedule, fns, fresh_state = setup
    state = fresh_state()
    batch = _batch(np.random.RandomState(1))
    m = fns.eval_step(state["params"], batch)
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_roundtrip(tmp_path, setup):
    import jax

    from snn_object_detectionddp_tpu.train.checkpoint import (
        load_checkpoint,
        resume_or_init,
        save_checkpoint,
    )

    cfg, det, tx, schedule, fns, fresh_state = setup
    state = fresh_state()
    path = tmp_path / "latest.pt"
    save_checkpoint(path, state, epoch=3, best_val_loss=1.25)
    template = jax.tree.map(np.zeros_like, jax.device_get(state))
    packed = load_checkpoint(path, template)
    assert int(packed["epoch"]) == 3
    assert float(packed["best_val_loss"]) == 1.25
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state)), jax.tree.leaves(packed["state"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # resume path
    cfg.training.resume_training = True
    cfg.training.weights_path = str(path)
    st, start_epoch, best = resume_or_init(cfg, template)
    assert start_epoch == 4 and best == 1.25

    # missing path -> warn + fresh init (init_fn builds the real state)
    cfg.training.weights_path = str(tmp_path / "nope.pt")
    called = []
    st, start_epoch, best = resume_or_init(
        cfg, template, init_fn=lambda: (called.append(1), template)[1]
    )
    assert start_epoch == 0 and best == float("inf") and called == [1]

    # corrupt checkpoint -> warn + fresh init (failure recovery, SURVEY §5);
    # load_checkpoint itself must still raise for eval callers.
    bad = tmp_path / "corrupt.pt"
    bad.write_bytes(b"not a checkpoint at all")
    cfg.training.weights_path = str(bad)
    called.clear()
    st, start_epoch, best = resume_or_init(
        cfg, template, init_fn=lambda: (called.append(1), template)[1]
    )
    assert start_epoch == 0 and best == float("inf") and called == [1]
    with pytest.raises(Exception):
        load_checkpoint(bad, template)


@pytest.mark.slow  # moved out of the fast profile (VERDICT r4 #6):
# the heavyweight exact-equivalence battery; measured 90-214 s each
def test_dp_matches_single_device(setup):
    """One sharded train step over an 8-device CPU mesh must produce the
    same loss and parameters as the unsharded step (ICI psum correctness)."""
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import make_mesh
    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, fns, _fresh = setup
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(-1)
    fns_dp = make_step_fns(det, tx, schedule, mesh=mesh)

    params = det.init_params(jax.random.PRNGKey(7))
    batch = _batch(np.random.RandomState(2), b=8)

    # Separate buffer copies: train_step donates its state argument.
    state_a = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
    state_b = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
    state_a, m_a = fns.train_step(state_a, batch)
    state_b, m_b = fns_dp.train_step(state_b, batch)

    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=2e-4
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_a["params"])),
        jax.tree.leaves(jax.device_get(state_b["params"])),
    ):
        # Sharded psum changes fp reduction order; tolerance covers that.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_remat_matches_baseline(setup):
    """training.remat rematerializes the temporal forward; loss and params
    after one step must match the non-remat step."""
    import jax

    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, fns, _fresh = setup
    fns_remat = make_step_fns(det, tx, schedule, remat=True)
    params = det.init_params(jax.random.PRNGKey(3))
    batch = _batch(np.random.RandomState(5))

    state_a = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
    state_b = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
    _, m_a = fns.train_step(state_a, batch)
    _, m_b = fns_remat.train_step(state_b, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4
    )


def test_host_shard_indices_single_host():
    from snn_object_detectionddp_tpu.parallel.mesh import host_shard_indices

    assert host_shard_indices([3, 1, 4, 1, 5]) == [3, 1, 4, 1, 5]


@pytest.mark.slow
def test_remat_chunk_matches_baseline(setup):
    """Chunked long-T remat (training.remat_chunk) must be bit-equivalent
    math to the unchunked forward: same loss and grad norm at T=16 with
    chunk sizes 4 and 8 (VERDICT round-1 #6 / SURVEY §5 long-context)."""
    import jax

    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, fns, _fresh = setup
    params = det.init_params(jax.random.PRNGKey(7))
    batch = _batch(np.random.RandomState(9), t=16)

    results = {}
    for chunk in (None, 4, 8, 16):
        fns_c = make_step_fns(det, tx, schedule, remat_chunk=chunk)
        state = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
        _, m = fns_c.train_step(state, batch)
        results[chunk] = (float(m["loss"]), float(m["grad_norm"]))

    base = results[None]
    for chunk in (4, 8, 16):
        np.testing.assert_allclose(results[chunk][0], base[0], rtol=1e-4)
        np.testing.assert_allclose(results[chunk][1], base[1], rtol=1e-3)


@pytest.mark.slow
def test_remat_chunk_save_conv_matches_baseline():
    """Selective remat (training.remat_policy="save_conv"): saving the
    checkpoint_name-tagged conv outputs while recomputing the elementwise
    GN/LIF/gate chain is the same math — loss and grad norm must match the
    unchunked step (VERDICT r4 next #5). f32: the policy restructures the
    grad program, and in bf16 a fusion-level ulp can flip a Heaviside
    spike (O(1) loss change) — the same reason the spatial equivalence
    tests pin f32 (tests/test_spatial.py setup docstring)."""
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
    tx, schedule = make_optimizer(cfg.training.learning_rate, total_steps=100)
    params = det.init_params(jax.random.PRNGKey(7))
    batch = _batch(np.random.RandomState(9), t=16)

    results = {}
    for chunk, policy in ((None, "full"), (4, "save_conv"), (8, "save_conv")):
        fns_c = make_step_fns(
            det, tx, schedule, remat_chunk=chunk, remat_policy=policy
        )
        state = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
        _, m = fns_c.train_step(state, batch)
        results[(chunk, policy)] = (float(m["loss"]), float(m["grad_norm"]))

    base = results[(None, "full")]
    for key in ((4, "save_conv"), (8, "save_conv")):
        np.testing.assert_allclose(results[key][0], base[0], rtol=1e-4)
        np.testing.assert_allclose(results[key][1], base[1], rtol=1e-3)
    with pytest.raises(ValueError, match="remat_policy"):
        make_step_fns(det, tx, schedule, remat_chunk=4, remat_policy="bogus")


def test_remat_chunk_rejects_indivisible_t(setup):
    import jax

    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, _fns, _fresh = setup
    fns_c = make_step_fns(det, tx, schedule, remat_chunk=3)
    params = det.init_params(jax.random.PRNGKey(0))
    state = init_state(params, tx, schedule)
    batch = _batch(np.random.RandomState(0), t=4)
    with pytest.raises(ValueError, match="remat_chunk"):
        fns_c.train_step(state, batch)


@pytest.mark.slow  # moved out of the fast profile (VERDICT r4 #6):
# the heavyweight exact-equivalence battery; measured 90-214 s each
def test_grad_accum_identical_microbatches_exact(setup):
    """A batch whose two halves are identical must produce the same loss
    and updated params under grad_accum=2 as under grad_accum=1 (up to
    f32 reassociation of the batch reductions): micro totals scale with
    microbatch size and are summed, so the full-batch gradient scale is
    reproduced."""
    import jax

    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, _fns, _fresh = setup
    params = det.init_params(jax.random.PRNGKey(3))
    half = _batch(np.random.RandomState(5), b=2)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}

    outs = {}
    for k in (1, 2):
        fns_k = make_step_fns(det, tx, schedule, grad_accum=k)
        state = init_state(jax.tree.map(lambda x: x.copy(), params), tx, schedule)
        new_state, m = fns_k.train_step(state, batch)
        outs[k] = (float(m["loss"]), float(m["grad_norm"]),
                   jax.tree.leaves(new_state["params"])[0])

    np.testing.assert_allclose(outs[2][0], outs[1][0], rtol=2e-4)
    np.testing.assert_allclose(outs[2][1], outs[1][1], rtol=1e-3)
    # Post-AdamW params: the normalizer sqrt(nu)+eps amplifies tiny f32
    # reassociation deltas where grads are near zero; bound by a fraction
    # of the 1e-3 learning-rate step instead of machine epsilon.
    np.testing.assert_allclose(
        np.asarray(outs[2][2], np.float32),
        np.asarray(outs[1][2], np.float32),
        atol=5e-4,
    )


def test_grad_accum_reduces_loss(setup):
    import jax

    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, _fns, _fresh = setup
    fns_a = make_step_fns(det, tx, schedule, grad_accum=2)
    params = det.init_params(jax.random.PRNGKey(0))
    state = init_state(params, tx, schedule)
    batch = _batch(np.random.RandomState(1), b=4)
    losses = []
    for _ in range(6):
        state, m = fns_a.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_grad_accum_rejects_indivisible_batch(setup):
    import jax

    from snn_object_detectionddp_tpu.train.step import init_state, make_step_fns

    cfg, det, tx, schedule, _fns, _fresh = setup
    fns_a = make_step_fns(det, tx, schedule, grad_accum=3)
    params = det.init_params(jax.random.PRNGKey(0))
    state = init_state(params, tx, schedule)
    with pytest.raises(ValueError, match="grad_accum"):
        fns_a.train_step(state, _batch(np.random.RandomState(0), b=4))


def test_legacy_groupnorm_checkpoint_migrates(tmp_path, setup):
    """Checkpoints from the pre-fusion layout (SpikingConvBlock params
    under GroupNorm_0/{scale,bias}) must load with weights transferred to
    the fused gn_scale/gn_bias names — not be silently dropped as
    'unreadable' (round-2 GN fusion rename)."""
    import jax
    from flax import serialization

    from snn_object_detectionddp_tpu.train.checkpoint import load_checkpoint

    cfg, det, tx, schedule, fns, fresh_state = setup
    state = fresh_state()
    params = jax.device_get(state["params"])

    def unmigrate(d):
        if not isinstance(d, dict):
            return d
        out, gn = {}, {}
        for k, v in d.items():
            if k == "gn_scale":
                gn["scale"] = v
            elif k == "gn_bias":
                gn["bias"] = v
            else:
                out[k] = unmigrate(v)
        if gn:
            out["GroupNorm_0"] = gn
        return out

    old_params = unmigrate(params)
    assert old_params != params  # the rename actually applies somewhere
    blob = serialization.to_bytes(
        {
            "state": {"params": old_params},
            "epoch": np.int32(2),
            "best_val_loss": np.float32(3.5),
        }
    )
    path = tmp_path / "old_layout.pt"
    path.write_bytes(blob)

    template = jax.tree.map(np.zeros_like, jax.device_get(state))
    packed = load_checkpoint(path, template)
    assert int(packed["epoch"]) == 2
    for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(packed["state"]["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f32_precision_honored_end_to_end():
    """runtime.precision='f32' must produce NO bf16 tensor anywhere in the
    step program — in particular the preprocessing stage must not quantize
    inputs through bf16 before the first conv (VERDICT r2 weak #5)."""
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector
    from snn_object_detectionddp_tpu.train.step import make_optimizer, make_step_fns

    cfg = _tiny_cfg()
    cfg.runtime.precision = "f32"
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    tx, schedule = make_optimizer(cfg.training.learning_rate, total_steps=10)
    fns = make_step_fns(det, tx, schedule)
    batch = _batch(np.random.RandomState(0))
    jaxpr = jax.make_jaxpr(lambda p, b: fns.eval_step(p, b))(params, batch)
    assert "bf16" not in str(jaxpr)
    # And the bf16 default still uses bf16 (the A/B control actually A/Bs).
    cfg2 = _tiny_cfg()
    det2 = Detector.from_config(cfg2)
    params2 = det2.init_params(jax.random.PRNGKey(0))
    fns2 = make_step_fns(det2, tx, schedule)
    jaxpr2 = jax.make_jaxpr(lambda p, b: fns2.eval_step(p, b))(params2, batch)
    assert "bf16" in str(jaxpr2)
