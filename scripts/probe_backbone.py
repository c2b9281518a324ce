"""Chain-timed decomposition of the flagship backbone's 44 ms (37 TF/s —
half the chip's conv rate, while the unet runs at 91 TF/s).

Times, at the exact per-layer geometries (NB = T*B = 128):
  conv-<layer>    the conv alone (with its real stride)
  s2d             the space-to-depth stem rearrange
  gn-<layer>      the GroupNorm statistics pass (one f32 read + moments)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_backbone.py [cases]
"""

import time
from functools import partial

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


def _poke(x, c):
    if x.dtype == jnp.uint8:
        delta = (c.astype(jnp.int32) % 3).astype(jnp.uint8)
    else:
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


NB = 128  # T*B at the bench flagship (T=4, batch 32)

# (name, H, W, Cin, Cout, stride) — the 8 backbone convs (yolo11m preset:
# channels (48,128,256,512), depth 1 -> stem1, stem2, then c1(s2)+c2 per stage).
LAYERS = [
    ("stem1", 120, 160, 48, 48, 1),
    ("stem2", 120, 160, 48, 96, 1),
    ("s1c1", 120, 160, 96, 128, 2),
    ("s1c2", 60, 80, 128, 128, 1),
    ("s2c1", 60, 80, 128, 256, 2),
    ("s2c2", 30, 40, 256, 256, 1),
    ("s3c1", 30, 40, 256, 512, 2),
    ("s3c2", 15, 20, 512, 512, 1),
]


def conv_layer(name, h, w, cin, cout, stride):
    x = _rand((NB, h, w, cin), jnp.bfloat16, 0)
    k = _rand((3, 3, cin, cout), jnp.bfloat16, 1)
    ho, wo = h // stride, w // stride
    gflop = NB * ho * wo * 9 * cin * cout * 2 / 1e9

    def conv(x, k):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    ms = timeit(chain(conv), (x, k))
    print(f"conv-{name:7} s{stride} {gflop:7.1f} GF  {ms:7.3f} ms  "
          f"{gflop / ms:6.1f} TF/s", flush=True)


def s2d_stem():
    x = _rand((NB, 480, 640, 3), jnp.bfloat16, 0)

    def s2d(x):
        nb, h, w, c = x.shape
        y = x.reshape(nb, h // 4, 4, w // 4, 4, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(nb, h // 4, w // 4, 16 * c)

    mb = x.size * 2 * 2 / 1e6
    ms = timeit(chain(s2d), (x,))
    print(f"s2d stem          {mb:7.0f} MB  {ms:7.3f} ms  {mb / ms:6.1f} GB/s",
          flush=True)


def gn_stats(name, h, w, c):
    x = _rand((NB, h, w, c), jnp.bfloat16, 0)
    groups = max(1, c // 16)

    def stats(x):
        xf = x.astype(jnp.float32).reshape(NB, -1, groups, c // groups)
        mean = xf.mean(axis=(1, 3))
        mean2 = jnp.mean(jnp.square(xf), axis=(1, 3))
        return mean, mean2

    mb = x.size * 2 / 1e6
    ms = timeit(chain(stats), (x,))
    print(f"gn-{name:9} {mb:7.0f} MB  {ms:7.3f} ms  {mb / ms:6.1f} GB/s",
          flush=True)


CASES = {}
for nm, h, w, ci, co, s in LAYERS:
    CASES[f"conv-{nm}"] = partial(conv_layer, nm, h, w, ci, co, s)
CASES["s2d"] = s2d_stem
for nm, h, w, ci, co, s in LAYERS[:2] + [LAYERS[3], LAYERS[5]]:
    CASES[f"gn-{nm}"] = partial(gn_stats, nm, h // s, w // s, co)

if __name__ == "__main__":
    import sys

    print(f"backend: {jax.default_backend()}", flush=True)
    for key in sys.argv[1:] or list(CASES):
        CASES[key]()
