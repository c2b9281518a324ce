"""A/B the SpikingConvBlock post-conv stage on TPU at real backbone shapes.

Variants:
  old    : nn.GroupNorm-equivalent XLA normalize + lif_scan_pallas
  fused  : split-GN stats (XLA) + affine_lif_pallas (new kernel)
  xla    : split-GN stats + affine_lif_xla (broadcast + lax.scan)

Timing: N iterations are chained on-device inside one jit (the carry feeds
v0 so XLA cannot parallelize or elide them), then a scalar is fetched —
robust against the tunnel's async dispatch.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from snn_object_detectionddp_tpu.models.lif import LIFParams, run_lif
from snn_object_detectionddp_tpu.kernels.affine_lif_pallas import (
    affine_lif_pallas,
    affine_lif_xla,
)

p = LIFParams()
N_CHAIN = 20


def split_gn(x, gamma, beta, groups):
    t, b = x.shape[:2]
    c = x.shape[-1]
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(t * b, -1, groups, cg)
    mean = xf.mean(axis=(1, 3))
    var = xf.var(axis=(1, 3))
    rstd = jax.lax.rsqrt(var + 1e-6)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(t, b, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(t, b, c)
    a = rstd_c * gamma
    bias = beta - mean_c * rstd_c * gamma
    return a, bias


def gn_full(x, gamma, beta, groups):
    t, b = x.shape[:2]
    c = x.shape[-1]
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(t * b, -1, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y.reshape(x.shape) * gamma + beta
    return y


def make_fns(groups):
    def old(x, gamma, beta, v0):
        y = gn_full(x, gamma, beta, groups)
        return run_lif(y.astype(jnp.bfloat16), p, v0)

    def fused(x, gamma, beta, v0):
        a, bias = split_gn(x, gamma, beta, groups)
        return affine_lif_pallas(x, a, bias, v0, p, False)

    def xla(x, gamma, beta, v0):
        a, bias = split_gn(x, gamma, beta, groups)
        return affine_lif_xla(x, a, bias, v0, p)

    return {"old": old, "fused": fused, "xla": xla}


def chain_fwd(f):
    @jax.jit
    def run(x, gamma, beta, v0):
        def body(v, _):
            s, v2 = f(x, gamma, beta, v)
            # fold the spikes in so neither output is dead
            return v2 + 1e-12 * s.astype(jnp.float32).mean(), None

        v, _ = jax.lax.scan(body, v0, None, length=N_CHAIN)
        return v.mean()

    return run


def chain_grad(f):
    def loss(x, gamma, beta, v0):
        s, v = f(x, gamma, beta, v0)
        return s.astype(jnp.float32).mean() + v.mean()

    g = jax.grad(loss, argnums=(0, 3))

    @jax.jit
    def run(x, gamma, beta, v0):
        def body(carry, _):
            v, acc = carry
            gx, gv = g(x, gamma, beta, v)
            return (v + gv, acc + gx.astype(jnp.float32).mean()), None

        (v, acc), _ = jax.lax.scan(body, (v0, 0.0), None, length=N_CHAIN)
        return v.mean() + acc

    return run


def timeit(run, args, reps=3):
    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN * 1e3


SHAPES = [
    ("stem2", (4, 16, 120, 160, 96), 8),
    ("stage1", (4, 16, 60, 80, 128), 8),
    ("stage3", (4, 16, 15, 20, 512), 8),
]

for name, shape, groups in SHAPES:
    T, B, H, W, C = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    v0 = jnp.zeros((B, H, W, C), jnp.float32)
    gb = 2 * T * B * H * W * C * 2 / 2**30  # read x + write s, bf16
    row = {"shape": name, "min_gb": round(gb, 3)}
    for key, f in make_fns(groups).items():
        fwd_ms = timeit(chain_fwd(f), (x, gamma, beta, v0))
        grad_ms = timeit(chain_grad(f), (x, gamma, beta, v0))
        row[key] = f"fwd {fwd_ms:.3f}ms ({gb / fwd_ms * 1e3:.0f} GB/s) grad {grad_ms:.3f}ms"
    print(row, flush=True)
