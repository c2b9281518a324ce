"""Tensor (channel) parallelism: data x tensor meshes, inference only.

The serving-latency axis: conv output channels + activations shard over
the ``tensor`` mesh axis (params via parallel/mesh.py::tp_param_shardings,
activations via the fold-sharding pins), cutting the B=1 forward latency
floor that bounds streaming throughput (BASELINE.md). Forward-only by
design — the XLA SPMD partitioner's windowed-conv gradient bookkeeping is
exactly what miscompiled three ways on 2-D meshes (docs/PARALLELISM.md) —
so training rejects a tensor axis loudly and these tests pin:
(a) channel-sharded predict == single-device predict,
(b) the param-sharding rule itself,
(c) the train-side and config-side rejections.
"""

import numpy as np
import pytest

from tests.test_train import _batch, _tiny_cfg


@pytest.fixture(scope="module")
def setup():
    """f32 detector (same reasoning as tests/test_spatial.py: sharded
    reductions reassociate f32 sums; in bf16 that epsilon can flip a LIF
    spike and equivalence becomes statistical)."""
    import jax

    from snn_object_detectionddp_tpu.models.detector import Detector

    cfg = _tiny_cfg()
    cfg.runtime.precision = "f32"
    det = Detector.from_config(cfg)
    params = det.init_params(jax.random.PRNGKey(17))
    return cfg, det, params


def test_make_mesh_tensor_axis():
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import (
        data_axis_size,
        make_mesh,
    )

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    m = make_mesh(-1, tensor=2)
    assert m.axis_names == ("data", "tensor")
    assert m.shape["data"] == 4 and m.shape["tensor"] == 2
    assert data_axis_size(m) == 4
    m1 = make_mesh(1, tensor=4, devices=jax.devices()[:4])
    assert m1.shape["tensor"] == 4
    with pytest.raises(ValueError):
        make_mesh(-1, spatial=2, tensor=2)


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    from snn_object_detectionddp_tpu.parallel.mesh import tp_spec

    # Conv kernel HWIO: out-channel dim shards.
    assert tp_spec((3, 3, 16, 32), 2) == P(None, None, None, "tensor")
    # Dense IO kernel.
    assert tp_spec((64, 128), 4) == P(None, "tensor")
    # Channel-aligned 1-D leaves (bias, GroupNorm affine).
    assert tp_spec((32,), 2) == P("tensor")
    # Non-divisible trailing dim stays replicated (e.g. nc=3 class conv).
    assert tp_spec((3, 3, 16, 3), 2) == P()
    # Scalars / tp=1.
    assert tp_spec((), 2) == P()
    assert tp_spec((3, 3, 16, 32), 1) == P()


def test_tp_param_shardings_cover_model(setup):
    """Most of the model's parameter volume must actually shard (the rule
    falling back to replicated everywhere would silently disable TP)."""
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import (
        make_mesh,
        tp_param_shardings,
    )

    cfg, det, params = setup
    mesh = make_mesh(1, tensor=2, devices=jax.devices()[:2])
    sh = tp_param_shardings(mesh, params)
    leaves = list(
        zip(jax.tree.leaves(params), jax.tree.leaves(sh))
    )
    sharded = sum(
        l.size for l, s in leaves if "tensor" in tuple(s.spec)
    )
    total = sum(l.size for l, _ in leaves)
    assert sharded / total > 0.9, (
        f"only {sharded}/{total} param elements tensor-sharded"
    )


@pytest.mark.parametrize(
    "geom", [(1, 2, 1), (2, 2, 4)], ids=["latency-1x2", "composed-2x2"]
)
def test_tp_predict_matches_single_device(setup, geom):
    """Channel-sharded predict must reproduce the single-device predict:
    same valid mask, same kept classes, boxes/scores to f32-reassociation
    tolerance. Covers the pure-TP latency mesh (data=1, the serving shape)
    and the composed data x tensor eval mesh."""
    import jax

    from snn_object_detectionddp_tpu.evals.validator import make_predict_fn
    from snn_object_detectionddp_tpu.parallel.mesh import make_mesh

    cfg, det, params = setup
    d, tp, b = geom
    images = np.random.RandomState(23).randint(
        0, 255, size=(b, 2, 64, 64, 3), dtype=np.uint8
    )

    out_a = jax.device_get(make_predict_fn(det)(params, images))
    mesh = make_mesh(d, tensor=tp, devices=jax.devices()[: d * tp])
    out_b = jax.device_get(make_predict_fn(det, mesh=mesh)(params, images))

    np.testing.assert_array_equal(out_a["valid"], out_b["valid"])
    v = out_a["valid"]
    np.testing.assert_array_equal(out_a["classes"][v], out_b["classes"][v])
    np.testing.assert_allclose(
        out_a["scores"][v], out_b["scores"][v], rtol=1e-5
    )
    np.testing.assert_allclose(
        out_a["boxes"][v], out_b["boxes"][v], rtol=1e-4, atol=1e-3
    )


def test_tp_forward_state_matches_single_device(setup):
    """The recurrent state coming out of a channel-sharded forward must
    match the single-device state (streaming carries it across calls)."""
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import (
        fold_sharding,
        make_mesh,
        tp_param_shardings,
    )

    cfg, det, params = setup
    frames = (
        np.random.RandomState(31).rand(2, 1, 64, 64, 3).astype(np.float32)
    )

    raw_a, state_a = jax.jit(
        lambda p, f: det.module.apply({"params": p}, f)
    )(params, frames)

    mesh = make_mesh(1, tensor=2, devices=jax.devices()[:2])
    p_sh = jax.device_put(params, tp_param_shardings(mesh, params))

    def fwd(p, f):
        with fold_sharding(mesh):
            return det.module.apply({"params": p}, f)

    raw_b, state_b = jax.jit(fwd)(p_sh, frames)

    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(a)),
            np.asarray(jax.device_get(b)),
            rtol=1e-5,
            atol=1e-5,
        )
    for a, b in zip(raw_a, raw_b):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(a)),
            np.asarray(jax.device_get(b)),
            rtol=1e-4,
            atol=1e-4,
        )


def test_train_rejects_tensor_mesh(setup):
    import jax

    from snn_object_detectionddp_tpu.parallel.mesh import make_mesh
    from snn_object_detectionddp_tpu.train.step import (
        make_optimizer,
        make_step_fns,
    )

    cfg, det, params = setup
    tx, schedule = make_optimizer(1e-3, total_steps=10)
    mesh = make_mesh(1, tensor=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="inference-only"):
        make_step_fns(det, tx, schedule, mesh=mesh)


def test_config_rejects_spatial_plus_tensor():
    from snn_object_detectionddp_tpu.config import Config

    with pytest.raises(ValueError, match="mesh.spatial and mesh.tensor"):
        Config.from_dict({"mesh": {"spatial": 2, "tensor": 2}})
    cfg = Config.from_dict({"mesh": {"tensor": 2}})
    assert cfg.mesh.tensor == 2
