"""Is the affine+LIF kernel DMA-bound or VPU-bound?

Three kernels with IDENTICAL block structure at each geometry:
  copy   s = x (no time recurrence, no f32 math) — pure DMA cost
  bf16   full LIF but membrane kept in bf16 — halves VPU f32 work
  full   the production kernel (f32 membrane)

If copy ~= full, the kernel is DMA/structure-bound and compute tweaks are
pointless; if copy << full, the VPU time loop is the cost and reducing
f32 ops (or overlapping) is the lever.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_lif_bound.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_CHAIN = 30


def timeit(run, args, n=N_CHAIN, reps=3):
    float(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def _poke_f(x, c):
    patch = (x[(0,) * (x.ndim - 1)][:1] + (c * 1e-6).astype(x.dtype)).reshape(
        (1,) * x.ndim
    )
    return jax.lax.dynamic_update_slice(x, patch, (0,) * x.ndim)


def chain(fn, n=N_CHAIN):
    @jax.jit
    def run(a, *rest):
        def body(carry, _):
            c, a = carry
            a = _poke_f(a, c)
            y = fn(a, *rest)
            s = sum(jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(y))
            return (s * 1e-9, a), None

        (c, _), _ = jax.lax.scan(body, (jnp.float32(0), a), None, length=n)
        return c

    return run


def _copy_kernel(x_ref, s_ref, *, t_steps):
    for t in range(t_steps):
        s_ref[t, 0] = x_ref[t, 0]


def _lif_kernel(x_ref, a_ref, b_ref, v0_ref, s_ref, vfin_ref, *, t_steps,
                acc_dtype):
    decay, threshold = 0.05, 1.0
    v = v0_ref[0].astype(acc_dtype)
    for t in range(t_steps):
        cur = x_ref[t, 0].astype(acc_dtype) * a_ref[t, 0].astype(
            acc_dtype
        ) + b_ref[t, 0].astype(acc_dtype)
        v_pre = decay * v + cur
        s = (v_pre >= threshold).astype(acc_dtype)
        s_ref[t, 0] = s.astype(s_ref.dtype)
        v = v_pre - s * threshold
    vfin_ref[0] = v.astype(jnp.float32)


def run_geometry(name, t, b, h, wc, tile_h, chunk):
    @jax.jit
    def gen(key):
        return jax.random.normal(key, (t, b, h, wc), jnp.float32).astype(
            jnp.bfloat16
        )

    x = gen(jax.random.PRNGKey(1))
    x.block_until_ready()
    a3 = jnp.ones((t, b, 1, wc), jnp.float32)
    b3 = jnp.zeros((t, b, 1, wc), jnp.float32)
    v03 = jnp.zeros((b, h, wc), jnp.float32)
    grid = (b, wc // chunk, h // tile_h)
    x_blk = pl.BlockSpec((t, 1, tile_h, chunk), lambda bi, j, i: (0, bi, i, j),
                         memory_space=pltpu.VMEM)
    ab_blk = pl.BlockSpec((t, 1, 1, chunk), lambda bi, j, i: (0, bi, 0, j),
                          memory_space=pltpu.VMEM)
    v_blk = pl.BlockSpec((1, tile_h, chunk), lambda bi, j, i: (bi, i, j),
                         memory_space=pltpu.VMEM)
    x4 = x.reshape(t, b, h, wc)

    def copy(x4):
        return pl.pallas_call(
            partial(_copy_kernel, t_steps=t),
            grid=grid, in_specs=[x_blk], out_specs=x_blk,
            out_shape=jax.ShapeDtypeStruct(x4.shape, x4.dtype),
        )(x4)

    def lif(acc_dtype, x4, a3, b3, v03):
        return pl.pallas_call(
            partial(_lif_kernel, t_steps=t, acc_dtype=acc_dtype),
            grid=grid, in_specs=[x_blk, ab_blk, ab_blk, v_blk],
            out_specs=(x_blk, v_blk),
            out_shape=(jax.ShapeDtypeStruct(x4.shape, x4.dtype),
                       jax.ShapeDtypeStruct(v03.shape, jnp.float32)),
        )(x4, a3, b3, v03)

    mb = (x4.size * 2 * 2) / 1e6
    ms = timeit(chain(copy), (x4,))
    print(f"{name:8} copy  {ms:7.3f} ms  {mb / ms:6.1f} GB/s", flush=True)
    ms = timeit(chain(partial(lif, jnp.bfloat16)), (x4, a3, b3, v03))
    print(f"{name:8} bf16  {ms:7.3f} ms  {mb / ms:6.1f} GB/s", flush=True)
    ms = timeit(chain(partial(lif, jnp.float32)), (x4, a3, b3, v03))
    print(f"{name:8} f32   {ms:7.3f} ms  {mb / ms:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    run_geometry("stem", 4, 32, 120, 7680, 8, 7680)
    run_geometry("stage1", 4, 32, 60, 10240, 12, 2560)
    run_geometry("stage2", 4, 32, 30, 10240, 30, 2560)
