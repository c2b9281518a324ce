"""Minimal repro: XLA SPMD partitioner miscompiles windowed-conv kernel
gradients on a 2-D (data x spatial) mesh after a dim-merging reshape.

Found while validating this build's GSPMD spatial parallelism
(tests/test_spatial.py) on jax/jaxlib 0.9.0, CPU backend with
``--xla_force_host_platform_device_count``. Symptoms and scope, as
measured by this script:

1. ``grad(sum(conv2d(x.reshape(T*B, H, W, C), k)**2))`` with x sharded
   ``P(None, 'data', 'spatial')`` on a 2x2 mesh returns a kernel gradient
   EXACTLY 2x (= spatial size) the single-device value. The forward is
   bit-exact; only the backward is wrong.
2. 1x1 convs are exact — the bug needs the halo-exchange (windowed) path.
3. Pre-folded inputs (no reshape inside the program) are exact at every
   probed geometry, including 1-row-per-shard H and strided convs.
4. Pinning the folded tensor with
   ``with_sharding_constraint(x4, P('data', 'spatial'))`` right after the
   reshape fixes this isolated case — but in larger composite programs
   (conv->GN->recurrence chains as in this repo's spiking blocks) the
   partitioner still inflates deep-layer kernel grads (observed up to
   ~2x per conv at small-H stages with a bit-identical forward loss, so
   near-threshold spike flips are ruled out; finite differences side
   with the single-device gradient).
5. Wrapping the forward in ``jax.checkpoint`` (chunked BPTT remat)
   removes the forward->backward residual shardings entirely; the
   resulting GSPMD gradient is finite-difference-valid to <0.5%.

Production consequence in this repo: spatial-parallel TRAINING
(mesh.spatial > 1) requires ``training.remat_chunk >= 1`` (enforced in
train/step.py) and the model pins every (T,B)->(T*B) fold with
``parallel.mesh.constrain_folded``; spatial eval/inference is forward-only
and unaffected. See docs/PARALLELISM.md.

6. COMPOSITE chains make the two defenses inseparable. In a fold ->
   (3x3 strided conv -> tanh -> pin) x3 -> head-conv chain, measured
   per-kernel gradient ratios (GSPMD / single-device):
       pins only, no remat : 0.500 on every chained conv (= 1/spatial —
                             silent DEFLATION; the isolated-conv pin
                             workaround of #4 does NOT generalize)
       remat only, no pins : 3.8x - 7.6x, varying per kernel
       pins + remat        : 1.000 everywhere
   This is why spatial training requires BOTH the model-wide fold pins
   AND remat_chunk — each alone is differently wrong. (The full model
   additionally deflates head gradients on single-row deepest-scale
   shards even WITH both defenses — not reproducible in this minimal
   chain; that geometry is gated off at trace time in train/step.py and
   checked on hardware by scripts/check_mesh_grads.py.)

Run:  python scripts/repro_gspmd_convgrad.py   (CPU; self-provisions 8
virtual devices; prints a table of single vs GSPMD gradient norms.)
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.lax import with_sharding_constraint as wsc
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main() -> int:
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "spatial"))
    rep = NamedSharding(mesh, P())
    sh5 = NamedSharding(mesh, P(None, "data", "spatial"))

    T, B, H, W, C, F = 4, 4, 64, 64, 3, 32
    rng = np.random.RandomState(0)
    x5 = jnp.asarray(rng.rand(T, B, H, W, C).astype(np.float32))
    k3 = jnp.asarray(rng.randn(3, 3, C, F).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rng.randn(1, 1, C, F).astype(np.float32) * 0.1)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    fold = lambda x: x.reshape((T * B, H, W, C))

    def ratio(obj, k):
        g1 = jax.jit(jax.grad(obj))(k, x5)
        g2 = jax.jit(jax.grad(obj), in_shardings=(rep, sh5), out_shardings=rep)(
            k, x5
        )
        n1, n2 = float(jnp.linalg.norm(g1)), float(jnp.linalg.norm(g2))
        return n1, n2, n2 / n1

    rows = [
        (
            "3x3 conv after (T,B)->(T*B) fold  [BUG: ratio 2.0]",
            ratio(lambda k, x: jnp.sum(conv(fold(x), k) ** 2) * 1e-3, k3),
        ),
        (
            "1x1 conv after fold               [ok]",
            ratio(lambda k, x: jnp.sum(conv(fold(x), k) ** 2) * 1e-3, k1),
        ),
        (
            "3x3 conv, fold pinned by wsc      [workaround]",
            ratio(
                lambda k, x: jnp.sum(
                    conv(
                        wsc(fold(x), NamedSharding(mesh, P("data", "spatial"))),
                        k,
                    )
                    ** 2
                )
                * 1e-3,
                k3,
            ),
        ),
    ]
    # Composite chain (docstring #6): fold -> (strided 3x3 -> tanh ->
    # pin?) x3 -> head conv, optionally under jax.checkpoint — the
    # minimal analog of this repo's spiking encoder + head. Prints
    # per-kernel grad ratios for every defense combination; only
    # pins+remat is correct.
    CK = 8
    ks = {
        n: jnp.asarray(rng.randn(3, 3, CK, CK).astype(np.float32) * 0.2)
        for n in ("k1", "k2", "k3", "kh")
    }
    xc = jnp.asarray(rng.rand(T, B, 16, 16, CK).astype(np.float32))
    pin4 = NamedSharding(mesh, P("data", "spatial"))

    def chain_obj(pin, remat):
        def fwd(ks, x):
            h = x.reshape((T * B, 16, 16, CK))
            for name, s in (("k1", 2), ("k2", 2), ("k3", 2)):
                if pin:
                    h = wsc(h, pin4)
                h = jnp.tanh(
                    jax.lax.conv_general_dilated(
                        h, ks[name], (s, s), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
            if pin:
                h = wsc(h, pin4)
            h = jax.lax.conv_general_dilated(
                h, ks["kh"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(h ** 2) * 1e-2

        return jax.checkpoint(fwd) if remat else fwd

    print("\ncomposite chain (per-kernel grad ratio gspmd/single):")
    combo_ok = True
    for pin in (False, True):
        for remat in (False, True):
            obj = chain_obj(pin, remat)
            gc1 = jax.jit(jax.grad(obj))(ks, xc)
            gc2 = jax.jit(
                jax.grad(obj), in_shardings=(rep, sh5), out_shardings=rep
            )(ks, xc)
            ratios = {
                n: float(jnp.linalg.norm(gc2[n]) / jnp.linalg.norm(gc1[n]))
                for n in ks
            }
            exact = all(abs(r - 1) < 1e-3 for r in ratios.values())
            if pin and remat and not exact:
                combo_ok = False
            tag = (
                "[production defense — must be exact]" if (pin and remat)
                else ""
            )
            print(
                f"  pins={int(pin)} remat={int(remat)}  "
                + " ".join(f"{n}:{r:.3f}" for n, r in ratios.items())
                + (f"  {tag}" if tag else "")
            )

    bad = not combo_ok
    for name, (n1, n2, r) in rows:
        flag = "" if abs(r - 1) < 1e-3 else "   <-- WRONG GRADIENT"
        expected_bug = "BUG" in name
        if abs(r - 1) > 1e-3 and not expected_bug:
            bad = True
        print(f"{name:52s} single={n1:10.4f} gspmd={n2:10.4f} ratio={r:.4f}{flag}")
    # exit 0 when the bug reproduces (ANY wrong gradient in the unpinned
    # case — not just the exact 2.0 ratio this jax version produces, so a
    # differently-wrong future version is still reported as broken) AND
    # the workaround holds
    fixed_ok = abs(rows[2][1][2] - 1) < 1e-3
    repro_ok = abs(rows[0][1][2] - 1) > 1e-3
    if repro_ok:
        print("\nbug REPRODUCES on this jax/jaxlib "
              f"({jax.__version__}); workaround {'holds' if fixed_ok else 'FAILS'}")
    else:
        print(f"\nbug does NOT reproduce on jax {jax.__version__} — "
              "likely fixed upstream; the remat requirement in "
              "train/step.py can be revisited")
    return 1 if (bad or not fixed_ok) else 0


if __name__ == "__main__":
    raise SystemExit(main())
