"""Stem formulation probe: the profiler shows the preprocess -> s2d4 chain
pays ~4.4 ms/step of layout/transpose copies (copy.1669/1670) before stem1.

A k=12 stride-4 conv on the raw (T*B, 480, 640, 3) image is mathematically
identical to space_to_depth(4) followed by the 3x3 stride-1 conv on 48
block-channels (the 12x12 footprint covers the same 3x3 blocks of 4x4
pixels; the weights are a permutation of each other). XLA lowers small-Cin
convs via its own internal space-to-batch, so the explicit rearrange may be
redundant data movement.

Cases:
  s2d      space_to_depth(4) + 3x3 conv 48->48 (current stem1)
  k12      conv k=(12,12) stride 4, pad 4, Cin=3 -> 48
  both followed by nothing else; equal FLOPs (101.9 GF at NB=128).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_stem.py
"""

import time

import jax
import jax.numpy as jnp

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_CHAIN = 30
NB = 128


def timeit(run, args, n=N_CHAIN, reps=3):
    float(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def _poke(x, c):
    delta = (c * 1e-6).astype(x.dtype)
    patch = (x[(0,) * (x.ndim - 1)][:1] + delta).reshape((1,) * x.ndim)
    return jax.lax.dynamic_update_slice(x, patch, (0,) * x.ndim)


def chain(fn, n=N_CHAIN):
    @jax.jit
    def run(a, *rest):
        def body(carry, _):
            c, a = carry
            a = _poke(a, c)
            y = fn(a, *rest)
            s = sum(jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(y))
            return (s * 1e-9, a), None

        (c, _), _ = jax.lax.scan(body, (jnp.float32(0), a), None, length=n)
        return c

    return run


def _rand(shape, dtype, seed):
    @jax.jit
    def gen(key):
        return jax.random.normal(key, shape, jnp.float32).astype(dtype)

    out = gen(jax.random.PRNGKey(seed))
    out.block_until_ready()
    return out


GFLOP = NB * 120 * 160 * 9 * 48 * 48 * 2 / 1e9


def case_s2d():
    x = _rand((NB, 480, 640, 3), jnp.bfloat16, 0)
    k = _rand((3, 3, 48, 48), jnp.bfloat16, 1)

    def f(x, k):
        nb, h, w, c = x.shape
        y = x.reshape(nb, h // 4, 4, w // 4, 4, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(nb, h // 4, w // 4, 48)
        dn = jax.lax.conv_dimension_numbers(
            y.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            y, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    ms = timeit(chain(f), (x, k))
    print(f"s2d+3x3   {GFLOP:6.1f} GF  {ms:7.3f} ms  {GFLOP / ms:6.1f} TF/s",
          flush=True)


def case_k12():
    x = _rand((NB, 480, 640, 3), jnp.bfloat16, 0)
    k = _rand((12, 12, 3, 48), jnp.bfloat16, 1)

    def f(x, k):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, k, (4, 4), ((4, 4), (4, 4)), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    ms = timeit(chain(f), (x, k))
    print(f"k12s4     {GFLOP:6.1f} GF  {ms:7.3f} ms  {GFLOP / ms:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    import sys

    print(f"backend: {jax.default_backend()}", flush=True)
    cases = {"s2d": case_s2d, "k12": case_k12}
    for key in sys.argv[1:] or list(cases):
        cases[key]()
