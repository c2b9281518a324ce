"""Feasibility probe: do int8 convs hit the v5e's double-rate MXU path?

Times bf16 vs int8 3x3 convs at backbone shapes (chained on-device via a
carry, scalar-drain timing — tunnel-safe). If int8 is ~2x bf16, a
quantized inference path is worth building; if XLA emulates int8 via
upcast, it is not.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(run, args, n=20, reps=3):
    float(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def conv(x, k, out_dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=out_dtype,
    )


def chain(x, k, out_dtype, in_dtype, n=20):
    @jax.jit
    def run(x, k):
        def body(c, _):
            y = conv(x, k, out_dtype)
            # fold output back to input dtype so iterations chain
            c2 = (c + y.astype(jnp.float32).mean()).astype(jnp.float32)
            return c2, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c
    return run


SHAPES = [  # (name, NB, H, W, Cin, Cout)
    ("stem2", 64, 120, 160, 48, 96),
    ("stage2", 64, 30, 40, 256, 256),
    ("stage3", 64, 15, 20, 512, 512),
]

rng = np.random.RandomState(0)
for name, nb, h, w, cin, cout in SHAPES:
    xf = jnp.asarray(rng.randn(nb, h, w, cin), jnp.bfloat16)
    kf = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 127, (nb, h, w, cin)), jnp.int8)
    ki = jnp.asarray(rng.randint(-127, 127, (3, 3, cin, cout)), jnp.int8)
    gflop = nb * h * w * 9 * cin * cout * 2 / 1e9
    try:
        ms_bf = timeit(chain(xf, kf, jnp.float32, jnp.bfloat16), (xf, kf))
        ms_i8 = timeit(chain(xi, ki, jnp.int32, jnp.int8), (xi, ki))
        print(f"{name:8} {gflop:7.1f} GFLOP  bf16 {ms_bf:7.3f} ms ({gflop/ms_bf:6.1f} TF/s)"
              f"  int8 {ms_i8:7.3f} ms ({gflop/ms_i8:6.1f} TOP/s)  ratio {ms_bf/ms_i8:4.2f}x",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
