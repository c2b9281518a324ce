"""Tile-geometry sweep for the fused affine+LIF forward kernel.

probe_hotspots showed the kernel sustains only 64-135 GB/s against a
~600 GB/s achievable HBM rate — LIF layers are ~half the backbone's time.
This sweeps (tile_h, chunk) block shapes and VMEM budgets at each backbone
geometry by monkeypatching pick_tiles, looking for the shape that gets the
time loop to bandwidth speed-of-light.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_lif_tiles.py [case...]
  case = <stage>:<tile_h>x<chunk>   e.g.  stem:40x2560 stem:120x7680
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


SHAPES = {
    "stem": (4, 32, 120, 160, 48),
    "stage1": (4, 32, 60, 80, 128),
    "stage2": (4, 32, 30, 40, 256),
    "stage3": (4, 32, 15, 20, 512),
}


def run_case(stage, tile_h, chunk):
    import snn_object_detectionddp_tpu.kernels.affine_lif_pallas as K
    from snn_object_detectionddp_tpu.models.lif import LIFParams

    t, b, h, w, c = SHAPES[stage]
    wc = w * c
    assert h % tile_h == 0 and wc % chunk == 0, (stage, tile_h, chunk)
    p = LIFParams()

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (t, b, h, w, c), jnp.float32).astype(
            jnp.bfloat16
        )

    x = gen(jax.random.PRNGKey(1))
    x.block_until_ready()
    a = jnp.ones((t, b, c), jnp.float32)
    bb = jnp.zeros((t, b, c), jnp.float32)
    v0 = jnp.zeros((b, h, w, c), jnp.float32)

    orig = K.pick_tiles
    K.pick_tiles = lambda *a_, **k_: (tile_h, chunk)
    try:
        fn = lambda x, a, bb, v0: K.affine_lif_pallas(x, a, bb, v0, p, False)
        ms = timeit(chain(fn), (x, a, bb, v0))
    except Exception as e:
        print(f"{stage}:{tile_h}x{chunk}  FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    finally:
        K.pick_tiles = orig
    # IO: x bf16 + spikes bf16 + v0 f32 + vfin f32
    mb = (t * b * h * wc * 2 * 2 + b * h * wc * 4 * 2) / 1e6
    vmem_kb = (t * tile_h * chunk * 2 * 2 + tile_h * chunk * 4 * 2) / 1024
    print(
        f"{stage}:{tile_h}x{chunk:<6} grid=({b},{wc // chunk},{h // tile_h})"
        f"  vmem/blk={vmem_kb:6.0f} KB  {ms:7.3f} ms  {mb / ms:6.1f} GB/s",
        flush=True,
    )


DEFAULT = [
    # stem (120, 7680): current pick is 40x2560 (102400 elems)
    "stem:40x2560", "stem:120x7680", "stem:120x1920", "stem:24x7680",
    "stem:8x7680", "stem:120x3840",
    # stage1 (60, 10240)
    "stage1:60x10240", "stage1:12x10240", "stage1:60x2560",
    # stage2 (30, 10240)
    "stage2:30x10240", "stage2:30x5120", "stage2:10x10240",
    # stage3 (15, 10240)
    "stage3:15x10240", "stage3:15x5120",
]

if __name__ == "__main__":
    import sys

    print(f"backend: {jax.default_backend()}", flush=True)
    for case in sys.argv[1:] or DEFAULT:
        stage, th_chunk = case.split(":")
        th, chunk = (int(v) for v in th_chunk.split("x"))
        run_case(stage, th, chunk)
