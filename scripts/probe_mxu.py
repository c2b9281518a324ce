"""MXU speed-of-light probe: where does the 62 TF/s XLA-conv ceiling come from?

Measures, on the real chip (tunnel-safe scalar-drain timing):

1. Plain XLA matmuls, bf16 and int8, square and conv-shaped (im2col
   geometry) — establishes the chip's achievable matmul rate and whether
   int8 runs at the MXU's double rate through XLA `dot_general` (round-2's
   probe_int8 showed XLA *convs* do NOT; matmuls are the sharper question).
2. XLA conv_general_dilated at backbone shapes (round-2 baseline, ~62 TF/s).
3. Conv decomposed as 9 shifted matmuls (pure XLA): if plain matmuls beat
   62 TF/s, this tells us whether a matmul-based conv (the Pallas im2col
   route, BASELINE.json north-star kernel) can beat XLA's conv lowering —
   before writing a single kernel line.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_mxu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(run, args, n=20, reps=3):
    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))  # scalar readback forces a queue drain
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def chain(fn, out_to_scalar, n=20):
    """Chain n iterations on-device with a scalar data dependency."""

    @jax.jit
    def run(*args):
        def body(c, _):
            y = fn(*args)
            return c + out_to_scalar(y), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    return run


def _dev_rand(shape, dtype, seed):
    """Generate operands ON DEVICE — uploading hundreds of MB of host
    randoms through this machine's ~3 MB/s tunnel stalls for minutes."""

    @jax.jit
    def gen(key):
        if dtype == jnp.int8:
            return jax.random.randint(key, shape, -127, 127, jnp.int32).astype(
                jnp.int8
            )
        return (jax.random.normal(key, shape, jnp.float32) * 0.05).astype(dtype)

    out = gen(jax.random.PRNGKey(seed))
    out.block_until_ready()
    return out


def matmul_case(name, m, k, n, in_dtype, acc_dtype):
    a = _dev_rand((m, k), in_dtype, 0)
    b = _dev_rand((k, n), in_dtype, 1)
    gflop = 2 * m * k * n / 1e9

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
        )

    run = chain(mm, lambda y: y.astype(jnp.float32).mean())
    ms = timeit(run, (a, b))
    print(
        f"matmul {name:24} {gflop:8.1f} GF  {ms:8.3f} ms  "
        f"{gflop / ms:7.1f} T/s",
        flush=True,
    )
    return gflop / ms


def conv_case(name, nb, h, w, cin, cout, in_dtype, acc_dtype):
    x = _dev_rand((nb, h, w, cin), in_dtype, 2)
    k = _dev_rand((3, 3, cin, cout), in_dtype, 3)
    gflop = nb * h * w * 9 * cin * cout * 2 / 1e9

    def conv(x, k):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=acc_dtype,
        )

    run = chain(conv, lambda y: y.astype(jnp.float32).mean())
    ms = timeit(run, (x, k))
    print(
        f"conv   {name:24} {gflop:8.1f} GF  {ms:8.3f} ms  "
        f"{gflop / ms:7.1f} T/s",
        flush=True,
    )
    return gflop / ms


def shifted_case(name, nb, h, w, cin, cout, in_dtype, acc_dtype):
    """3x3 SAME conv as 9 shifted (NHW, Cin)x(Cin, Cout) matmuls over a
    pre-padded input — the matmul-based conv a Pallas im2col kernel would
    run, expressed in pure XLA to bound its achievable rate."""
    x = _dev_rand((nb, h, w, cin), in_dtype, 4)
    k = _dev_rand((3, 3, cin, cout), in_dtype, 5)
    gflop = nb * h * w * 9 * cin * cout * 2 / 1e9

    def conv9(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                win = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (nb, h, w, cin)
                ).reshape(nb * h * w, cin)
                p = jax.lax.dot_general(
                    win, k[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
                acc = p if acc is None else acc + p
        return acc

    run = chain(conv9, lambda y: y.astype(jnp.float32).mean())
    ms = timeit(run, (x, k))
    print(
        f"conv9  {name:24} {gflop:8.1f} GF  {ms:8.3f} ms  "
        f"{gflop / ms:7.1f} T/s",
        flush=True,
    )
    return gflop / ms


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    # --- 1. plain matmuls: the chip's achievable rate ----------------------
    for m, k, n in ((4096, 4096, 4096), (8192, 2304, 256), (153600, 2304, 256)):
        matmul_case(f"bf16 {m}x{k}x{n}", m, k, n, jnp.bfloat16, jnp.float32)
        matmul_case(f"int8 {m}x{k}x{n}", m, k, n, jnp.int8, jnp.int32)
    # --- 2. XLA convs at backbone shapes (round-2 baseline) ---------------
    SHAPES = [
        ("stem2 120x160x48->96", 64, 120, 160, 48, 96),
        ("stage2 30x40x256", 64, 30, 40, 256, 256),
        ("stage3 15x20x512", 64, 15, 20, 512, 512),
    ]
    for name, nb, h, w, cin, cout in SHAPES:
        conv_case("bf16 " + name, nb, h, w, cin, cout, jnp.bfloat16, jnp.float32)
        conv_case("int8 " + name, nb, h, w, cin, cout, jnp.int8, jnp.int32)
    # --- 3. conv as 9 shifted matmuls -------------------------------------
    for name, nb, h, w, cin, cout in SHAPES:
        shifted_case("bf16 " + name, nb, h, w, cin, cout, jnp.bfloat16, jnp.float32)
        shifted_case("int8 " + name, nb, h, w, cin, cout, jnp.int8, jnp.int32)
