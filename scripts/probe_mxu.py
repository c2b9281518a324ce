"""MXU speed-of-light probe: where does the 62 TF/s XLA-conv ceiling come from?

Measures, on the real chip:

1. Plain XLA matmuls, bf16 and int8, square and conv-shaped (im2col
   geometry) — establishes the chip's achievable matmul rate and whether
   int8 runs at the MXU's double rate through XLA `dot_general`.
2. XLA conv_general_dilated at backbone shapes (round-2 baseline, ~62 TF/s).
3. Conv decomposed as 9 shifted matmuls (pure XLA): if plain matmuls beat
   62 TF/s, this tells us whether a matmul-based conv (the Pallas im2col
   route, BASELINE.json north-star kernel) can beat XLA's conv lowering —
   before writing a single kernel line.

Timing methodology (three tunnel/XLA traps, each observed to produce
garbage numbers on this machine):
- operands are generated ON DEVICE (uploading conv-shaped operands through
  the ~3 MB/s tunnel stalls for minutes);
- N_CHAIN iterations are chained on-device inside one program and drained
  with a single scalar readback (each readback costs a ~28 ms RTT);
- each iteration's input carries a data dependency on the previous
  iteration's output — without it XLA hoists the loop-invariant matmul out
  of the scan and 200 "iterations" measure one RTT (observed: 4096^3
  "1083 TF/s" on a 197 TF/s chip).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_mxu.py
"""

import time

import jax
import jax.numpy as jnp

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_CHAIN = 50


def timeit(run, args, n=N_CHAIN, reps=3):
    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))  # scalar readback forces a queue drain
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def _poke(x, c):
    """Write a carry-dependent value into x[0...] — the data dependency
    that keeps every chained iteration live."""
    if x.dtype == jnp.int8:
        delta = (c.astype(jnp.int32) % 3).astype(jnp.int8)
    else:
        delta = (c * 1e-6).astype(x.dtype)
    patch = (x[(0,) * (x.ndim - 1)][:1] + delta).reshape((1,) * x.ndim)
    return jax.lax.dynamic_update_slice(x, patch, (0,) * x.ndim)


def chain(fn, n=N_CHAIN):
    """Chain n iterations on-device; iteration i's input depends on
    iteration i-1's output, so nothing hoists or folds."""

    @jax.jit
    def run(a, *rest):
        def body(carry, _):
            c, a = carry
            a = _poke(a, c)
            y = fn(a, *rest)
            return (jnp.sum(y).astype(jnp.float32) * 1e-9, a), None

        (c, _), _ = jax.lax.scan(body, (jnp.float32(0), a), None, length=n)
        return c

    return run


def report(kind, name, gflop, ms):
    print(
        f"{kind:6} {name:26} {gflop:8.1f} GF  {ms:8.3f} ms  "
        f"{gflop / ms:7.1f} T/s",
        flush=True,
    )


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

    ms = timeit(chain(mm), (a, b))
    report("matmul", name, gflop, ms)
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

    ms = timeit(chain(conv), (x, k))
    report("conv", name, gflop, ms)
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

    ms = timeit(chain(conv9), (x, k))
    report("conv9", name, gflop, ms)
    return gflop / ms


SHAPES = {
    "stem2": (64, 120, 160, 48, 96),
    "stage2": (64, 30, 40, 256, 256),
    "stage3": (64, 15, 20, 512, 512),
}

CASES = {}
for _nm, _sh in SHAPES.items():
    _nb, _h, _w, _ci, _co = _sh
    _m, _k = _nb * _h * _w, 9 * _ci
    CASES[f"mm-bf16-{_nm}"] = (
        matmul_case, (f"bf16 {_m}x{_k}x{_co}", _m, _k, _co, jnp.bfloat16, jnp.float32)
    )
    CASES[f"mm-int8-{_nm}"] = (
        matmul_case, (f"int8 {_m}x{_k}x{_co}", _m, _k, _co, jnp.int8, jnp.int32)
    )
    CASES[f"conv-bf16-{_nm}"] = (
        conv_case, (f"bf16 {_nm}", *_sh, jnp.bfloat16, jnp.float32)
    )
    CASES[f"conv-int8-{_nm}"] = (
        conv_case, (f"int8 {_nm}", *_sh, jnp.int8, jnp.int32)
    )
    CASES[f"conv9-bf16-{_nm}"] = (
        shifted_case, (f"bf16 {_nm}", *_sh, jnp.bfloat16, jnp.float32)
    )
    CASES[f"conv9-int8-{_nm}"] = (
        shifted_case, (f"int8 {_nm}", *_sh, jnp.int8, jnp.int32)
    )
CASES["mm-bf16-4096"] = (
    matmul_case, ("bf16 4096^3", 4096, 4096, 4096, jnp.bfloat16, jnp.float32)
)
CASES["mm-int8-4096"] = (
    matmul_case, ("int8 4096^3", 4096, 4096, 4096, jnp.int8, jnp.int32)
)

if __name__ == "__main__":
    import sys

    print(f"backend: {jax.default_backend()}", flush=True)
    sel = sys.argv[1:] or list(CASES)
    for key in sel:
        fn, args = CASES[key]
        fn(*args)
