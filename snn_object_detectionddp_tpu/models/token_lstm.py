"""Token-LSTM bottleneck: the reference's ``use_conv_lstm: False`` variant.

The reference's alternative bottleneck flattens the (b, c, h, w) bottleneck
map into a spatial-token sequence and runs a 2-layer ``nn.LSTM(1024, 1024)``
over the h*w tokens, carrying (h, c) hidden state across frames
(reference: model.py:113-114, 131-137; the repo comments it "not
recommended"). Re-implemented here with explicit parameters and a pure
``lax.scan`` over tokens so the recurrence jits cleanly; the reference's
inter-layer dropout (0.1) is omitted — inference-mode behavior — since this
variant exists for behavioral A/B, not as the recommended path.

Selected via ``model.bottleneck: "lstm"``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class TokenLSTM(nn.Module):
    """(T, B, H, W, C) -> (h_seq (T, B, H, W, C), carry) via a 2-layer LSTM
    scanned over the H*W spatial tokens of each frame; hidden state carried
    across frames."""

    hidden: int
    num_layers: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, state: tuple | None = None):
        t, b, h, w, c = x_t.shape
        if c != self.hidden:
            raise ValueError(f"TokenLSTM expects input dim {self.hidden}, got {c}")
        if state is None:
            zeros = jnp.zeros((self.num_layers, b, self.hidden), jnp.float32)
            state = (zeros, zeros)  # (h, c) per layer

        # Explicit per-layer weights (xavier ih / orthogonal hh / forget-gate
        # bias 1 — the reference's LSTM init recipe,
        # weight_initialization.py:36-47). Gate order: (i, f, g, o).
        w_ih, w_hh, bias = [], [], []
        for layer in range(self.num_layers):
            in_dim = self.hidden
            w_ih.append(
                self.param(
                    f"l{layer}_w_ih",
                    nn.initializers.xavier_uniform(),
                    (in_dim, 4 * self.hidden),
                    jnp.float32,
                )
            )
            w_hh.append(
                self.param(
                    f"l{layer}_w_hh",
                    nn.initializers.orthogonal(),
                    (self.hidden, 4 * self.hidden),
                    jnp.float32,
                )
            )

            def _bias_init(key, shape, dtype):
                out = jnp.zeros(shape, dtype)
                return out.at[self.hidden : 2 * self.hidden].set(1.0)

            bias.append(
                self.param(f"l{layer}_bias", _bias_init, (4 * self.hidden,), jnp.float32)
            )

        compute_dtype = self.dtype
        hidden = self.hidden
        n_layers = self.num_layers

        def cell(x_tok, h_state, c_state, layer):
            gates = (
                jnp.dot(
                    x_tok.astype(compute_dtype),
                    w_ih[layer].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + jnp.dot(
                    h_state.astype(compute_dtype),
                    w_hh[layer].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + bias[layer]
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_next = jax.nn.sigmoid(f) * c_state + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
            return h_next, c_next

        def token_scan(carry, x_tok):
            h_all, c_all = carry  # (L, B, hidden)
            inp = x_tok
            new_h, new_c = [], []
            for layer in range(n_layers):
                h_next, c_next = cell(inp, h_all[layer], c_all[layer], layer)
                new_h.append(h_next)
                new_c.append(c_next)
                inp = h_next
            return (jnp.stack(new_h), jnp.stack(new_c)), inp

        outs = []
        carry = state
        for frame in range(t):  # T is small and static
            tokens = x_t[frame].reshape(b, h * w, c).transpose(1, 0, 2)
            carry, y = jax.lax.scan(token_scan, carry, tokens.astype(jnp.float32))
            outs.append(
                y.transpose(1, 0, 2).reshape(b, h, w, self.hidden)
            )
        return jnp.stack(outs).astype(self.dtype), carry
