"""Chain-timed probes for the two non-conv hotspots the B=32 ablation
exposed (preprocess 7.26 ms; LIF deltas at stem shapes), against their
HBM-bandwidth speed-of-light. Same methodology as probe_mxu: on-device
operands, on-device iteration chains with a live carry dependency, one
scalar drain.

Cases:
  pre-full      current preprocess_video ((B,T,HW3) u8 -> transpose -> scale)
  pre-scale     scale+cast only, no transpose (the loader-emits-time-major
                alternative: host reorder is free at batch assembly)
  pre-transpose uint8 (B,T,...) -> (T,B,...) transpose alone
  pre-post      scale+cast then transpose on bf16 (order swap)
  lif-<stage>   fused affine+LIF kernel at each backbone geometry
  lifx-<stage>  XLA scan path at the same geometry

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_hotspots.py [cases]
"""

import time

import jax
import jax.numpy as jnp

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


def _poke_u8(x, c):
    patch = (x[(0,) * (x.ndim - 1)][:1] + (c.astype(jnp.int32) % 3).astype(
        x.dtype
    )).reshape((1,) * x.ndim)
    return jax.lax.dynamic_update_slice(x, patch, (0,) * x.ndim)


def _poke_f(x, c):
    patch = (x[(0,) * (x.ndim - 1)][:1] + (c * 1e-6).astype(x.dtype)).reshape(
        (1,) * x.ndim
    )
    return jax.lax.dynamic_update_slice(x, patch, (0,) * x.ndim)


def chain(fn, poke, n=N_CHAIN):
    @jax.jit
    def run(a, *rest):
        def body(carry, _):
            c, a = carry
            a = poke(a, c)
            y = fn(a, *rest)
            s = sum(jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(y))
            return (s * 1e-9, a), None

        (c, _), _ = jax.lax.scan(body, (jnp.float32(0), a), None, length=n)
        return c

    return run


def report(name, mb, ms):
    print(f"{name:16} {mb:8.0f} MB io  {ms:8.3f} ms  {mb / ms / 1.0:7.1f} GB/s",
          flush=True)


def u8_images(b, t, h, w):
    @jax.jit
    def gen(key):
        return jax.random.randint(key, (b, t, h, w, 3), 0, 255, jnp.int32).astype(
            jnp.uint8
        )

    out = gen(jax.random.PRNGKey(0))
    out.block_until_ready()
    return out


B, T, H, W = 32, 4, 480, 640
PIX = B * T * H * W * 3


def pre_full():
    imgs = u8_images(B, T, H, W)

    def f(x):
        y = jnp.transpose(x, (1, 0, 2, 3, 4))
        return (y.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)

    ms = timeit(chain(f, _poke_u8), (imgs,))
    report("pre-full", PIX * 3 / 1e6, ms)  # u8 read + bf16 write


def pre_scale():
    imgs = u8_images(T, B, H, W)  # already time-major

    def f(x):
        return (x.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)

    ms = timeit(chain(f, _poke_u8), (imgs,))
    report("pre-scale", PIX * 3 / 1e6, ms)


def pre_transpose():
    imgs = u8_images(B, T, H, W)

    def f(x):
        return jnp.transpose(x, (1, 0, 2, 3, 4))

    ms = timeit(chain(f, _poke_u8), (imgs,))
    report("pre-transpose", PIX * 2 / 1e6, ms)


def pre_post():
    imgs = u8_images(B, T, H, W)

    def f(x):
        y = (x.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)
        return jnp.transpose(y, (1, 0, 2, 3, 4))

    ms = timeit(chain(f, _poke_u8), (imgs,))
    report("pre-post", PIX * 5 / 1e6, ms)


def pre_reshape_merge():
    """Transpose expressed only over the leading axes with flattened pixel
    tail — sometimes a different (cheaper) XLA lowering."""
    imgs = u8_images(B, T, H, W)

    def f(x):
        y = x.reshape(B, T, H * W * 3)
        y = jnp.swapaxes(y, 0, 1)
        return (y.astype(jnp.float32) * (1.0 / 255.0)).astype(
            jnp.bfloat16
        ).reshape(T, B, H, W, 3)

    ms = timeit(chain(f, _poke_u8), (imgs,))
    report("pre-reshape", PIX * 3 / 1e6, ms)


LIF_SHAPES = {
    "stem": (4, 32, 120, 160, 48),
    "stage1": (4, 32, 60, 80, 128),
    "stage2": (4, 32, 30, 40, 256),
    "stage3": (4, 32, 15, 20, 512),
}


def lif_case(name, shape, impl):
    from snn_object_detectionddp_tpu.kernels.affine_lif_pallas import (
        affine_lif_pallas,
        affine_lif_xla,
    )
    from snn_object_detectionddp_tpu.models.lif import LIFParams

    t, b, h, w, c = shape
    p = LIFParams()

    @jax.jit
    def gen(key):
        return (jax.random.normal(key, shape, jnp.float32)).astype(jnp.bfloat16)

    x = gen(jax.random.PRNGKey(1))
    x.block_until_ready()
    a = jnp.ones((t, b, c), jnp.float32)
    bb = jnp.zeros((t, b, c), jnp.float32)
    v0 = jnp.zeros((b, h, w, c), jnp.float32)

    def f(x, a, bb, v0):
        if impl == "pallas":
            return affine_lif_pallas(x, a, bb, v0, p, False)
        return affine_lif_xla(x, a, bb, v0, p)

    ms = timeit(chain(f, _poke_f), (x, a, bb, v0))
    mb = (t * b * h * w * c) * 2 * 2 / 1e6  # x read + spikes write, bf16
    report(name, mb, ms)


CASES = {
    "pre-full": pre_full,
    "pre-scale": pre_scale,
    "pre-transpose": pre_transpose,
    "pre-post": pre_post,
    "pre-reshape": pre_reshape_merge,
}
for nm, sh in LIF_SHAPES.items():
    CASES[f"lif-{nm}"] = (lambda nm=nm, sh=sh: lif_case(f"lif-{nm}", sh, "pallas"))
    CASES[f"lifx-{nm}"] = (lambda nm=nm, sh=sh: lif_case(f"lifx-{nm}", sh, "xla"))

if __name__ == "__main__":
    import sys

    print(f"backend: {jax.default_backend()}", flush=True)
    for key in sys.argv[1:] or list(CASES):
        CASES[key]()
