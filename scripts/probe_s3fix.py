"""Variant hunt for the two backbone pathologies probe_backbone.py found:

  conv-s3c2 (NB=128, 15x20, 512->512 s1): 24 TF/s vs 68-105 everywhere else
  gn stats at s2c2/s3 geometries: ~21 GB/s vs 150-300 elsewhere

Conv variants (all numerically equal to SAME 3x3):
  base     jax.lax.conv_general_dilated as the model calls it
  padh     zero-pad H 15->16, conv SAME, slice back (padding IS zeros)
  pad8     zero-pad to 16x24, VALID conv on explicit pad, slice
  im2col   conv_general_dilated_patches -> one (38400,4608)@(4608,512) matmul
  shift9   pad once, 9 shifted slices concat along C -> one matmul
  mm       upper bound: the bare im2col matmul on pre-materialized patches

GN-stat variants (per-(NB,G) mean/mean2, model convention layers.py:93-97):
  base     reshape (NB,-1,G,cg), mean over (1,3)  [cg minor dim]
  chan     sum over HW first at (NB,HW,C) [C minor], then fold groups
  dot      HW reduction as ones-vector matmul, then fold groups

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_s3fix.py [cases]
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


NB, H, W, C = 128, 15, 20, 512
GFLOP = NB * H * W * 9 * C * C * 2 / 1e9


def _report(name, ms, gflop=GFLOP):
    print(f"{name:10} {ms:7.3f} ms  {gflop / ms:6.1f} TF/s", flush=True)


def _conv_same(x, k, stride=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def conv_base():
    x = _rand((NB, H, W, C), jnp.bfloat16, 0)
    k = _rand((3, 3, C, C), jnp.bfloat16, 1)
    _report("base", timeit(chain(_conv_same), (x, k)))


def conv_padh():
    x = _rand((NB, H, W, C), jnp.bfloat16, 0)
    k = _rand((3, 3, C, C), jnp.bfloat16, 1)

    def f(x, k):
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
        return _conv_same(xp, k)[:, :H]

    _report("padh", timeit(chain(f), (x, k)))


def conv_pad8():
    x = _rand((NB, H, W, C), jnp.bfloat16, 0)
    k = _rand((3, 3, C, C), jnp.bfloat16, 1)

    def f(x, k):
        # explicit zero ring (VALID conv then needs +2 each dim) + round up
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 3), (0, 0)))  # 18 x 24
        dn = jax.lax.conv_dimension_numbers(
            xp.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return y[:, :H, :W]

    _report("pad8", timeit(chain(f), (x, k)))


def conv_im2col():
    x = _rand((NB, H, W, C), jnp.bfloat16, 0)
    k = _rand((3, 3, C, C), jnp.bfloat16, 1)

    def f(x, k):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )  # (NB, H, W, 9C) in kernel-major order
        y = jax.lax.dot_general(
            p.reshape(NB * H * W, 9 * C),
            k.transpose(2, 0, 1, 3).reshape(9 * C, C),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.bfloat16).reshape(NB, H, W, C)

    _report("im2col", timeit(chain(f), (x, k)))


def conv_shift9():
    x = _rand((NB, H, W, C), jnp.bfloat16, 0)
    k = _rand((3, 3, C, C), jnp.bfloat16, 1)

    def f(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, dy : dy + H, dx : dx + W, :]
            for dy in range(3)
            for dx in range(3)
        ]
        p = jnp.concatenate(cols, axis=-1).reshape(NB * H * W, 9 * C)
        y = jax.lax.dot_general(
            p,
            k.reshape(9 * C, C),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.bfloat16).reshape(NB, H, W, C)

    _report("shift9", timeit(chain(f), (x, k)))


def conv_mm():
    p = _rand((NB * H * W, 9 * C), jnp.bfloat16, 0)
    k = _rand((9 * C, C), jnp.bfloat16, 1)

    def f(p, k):
        return jax.lax.dot_general(
            p, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    _report("mm", timeit(chain(f), (p, k)))


# ---------------- GN stats ----------------

GN_GEOMS = {
    "s2c2": (30, 40, 256),
    "s3c2": (15, 20, 512),
    "s1c2": (60, 80, 128),
}


def _groups(c):
    g = 32
    while c % g:
        g -= 1
    return g


def gn_case(geom, variant):
    h, w, c = GN_GEOMS[geom]
    g = _groups(c)
    cg = c // g
    x = _rand((NB, h, w, c), jnp.bfloat16, 0)
    mb = x.size * 2 / 1e6

    if variant == "base":
        def f(x):
            xf = x.astype(jnp.float32).reshape(NB, -1, g, cg)
            return xf.mean(axis=(1, 3)), jnp.mean(jnp.square(xf), axis=(1, 3))
    elif variant == "chan":
        def f(x):
            xf = x.astype(jnp.float32).reshape(NB, h * w, c)
            s1 = jnp.sum(xf, axis=1).reshape(NB, g, cg).sum(axis=2)
            s2 = jnp.sum(jnp.square(xf), axis=1).reshape(NB, g, cg).sum(axis=2)
            n = h * w * cg
            return s1 / n, s2 / n
    elif variant == "dot":
        def f(x):
            xf = x.astype(jnp.float32).reshape(NB, h * w, c)
            ones = jnp.ones((h * w,), jnp.float32)
            s1 = jnp.einsum("s,nsc->nc", ones, xf)
            s2 = jnp.einsum("s,nsc->nc", ones, jnp.square(xf))
            n = h * w * cg
            return (s1.reshape(NB, g, cg).sum(axis=2) / n,
                    s2.reshape(NB, g, cg).sum(axis=2) / n)

    ms = timeit(chain(f), (x,))
    print(f"gn-{geom}-{variant:5} {mb:6.0f} MB  {ms:7.3f} ms  {mb / ms:6.1f} GB/s",
          flush=True)


CASES = {
    "base": conv_base,
    "padh": conv_padh,
    "pad8": conv_pad8,
    "im2col": conv_im2col,
    "shift9": conv_shift9,
    "mm": conv_mm,
}
for gm in GN_GEOMS:
    for v in ("base", "chan", "dot"):
        CASES[f"gn-{gm}-{v}"] = partial(gn_case, gm, v)

if __name__ == "__main__":
    import sys

    print(f"backend: {jax.default_backend()}", flush=True)
    for key in sys.argv[1:] or list(CASES):
        CASES[key]()
