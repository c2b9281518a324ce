"""Device-side fused preprocessing: normalize, resize, spike-encode.

The north-star moves the reference's per-worker CPU preprocessing
(cv2 decode + /255.0 + permute, reference: dataset.py:138-153) onto the
device as one jit stage feeding HBM-resident (T, B, H, W, C) batches.
Decode stays on host (:mod:`.pipeline`); everything after the uint8 tensor
runs here under jit, fusing into the first conv's input pipeline.

Encodings (single-image SNN mode, `model.timesteps` T):
- "direct": repeat the frame at every timestep (direct/constant-current
  encoding — the standard high-accuracy choice; see PAPERS.md
  "Revisiting Direct Encoding").
- "rate": Bernoulli spikes with p = pixel intensity per timestep.
Video mode uses the dataset's own seq_len frames as the time axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_hw", "dtype"))
def preprocess_video(
    images_u8: jnp.ndarray,
    out_hw: tuple[int, int] | None = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """(B, T, H, W, 3) uint8 -> (T, B, H', W', 3) ``dtype`` in [0, 1].

    Transposes to time-major for the model's layer-major temporal batching.
    HBM-traffic ordering (measured 6.2 -> ~1 ms at batch 16, T=4, 480x640):
    the transpose runs on the uint8 bytes (4x less traffic than
    transposing f32), and the output streams at the model's compute dtype
    (the first conv consumes bf16 regardless, so emitting f32 here only
    doubled the write+read volume). The /255 itself is computed in f32 and
    rounded once — identical to the old f32-pipeline value after the
    conv-input cast."""
    x = jnp.transpose(images_u8, (1, 0, 2, 3, 4))  # (T, B, H, W, 3) uint8
    xf = x.astype(jnp.float32) * (1.0 / 255.0)
    if out_hw is not None and out_hw != x.shape[2:4]:
        # Resize BEFORE the output-dtype cast: bilinear interpolation of
        # already-bf16-rounded values would compound quantization.
        t, b = x.shape[:2]
        xf = jax.image.resize(
            xf, (t, b, out_hw[0], out_hw[1], 3), method="bilinear"
        )
    return xf.astype(dtype)


@partial(jax.jit, static_argnames=("timesteps", "out_hw", "dtype"))
def encode_direct(
    image_u8: jnp.ndarray,
    timesteps: int,
    out_hw: tuple[int, int] | None = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (T, B, H', W', 3) in the model compute
    ``dtype`` (pass ``detector.module.dtype`` so ``runtime.precision``
    is honored), frame repeated T times."""
    x = preprocess_video(image_u8[:, None], out_hw, dtype)  # (1,B,H',W',3)
    return jnp.tile(x, (timesteps, 1, 1, 1, 1))


@partial(jax.jit, static_argnames=("timesteps", "out_hw", "dtype"))
def encode_rate(
    image_u8: jnp.ndarray,
    rng: jax.Array,
    timesteps: int,
    out_hw: tuple[int, int] | None = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (T, B, H', W', 3) Bernoulli spike trains.
    Spikes are exactly 0/1 so the output cast to any float dtype is
    lossless; the Bernoulli threshold compare itself stays f32."""
    x = preprocess_video(image_u8[:, None], out_hw, jnp.float32)[0]
    u = jax.random.uniform(rng, (timesteps,) + x.shape, dtype=jnp.float32)
    return (u < x[None]).astype(dtype)
