"""Fused LSTM cell.

TPU-native replacement for ``torch.nn.LSTMCell`` used throughout the
reference decoder (var_updown/var_updown/modules/updown_cell.py:34-84).
Instead of two input/hidden matmuls with two bias vectors, the input and
hidden weights are fused into a single ``(in_features + hidden, 4*hidden)``
matrix so each step is ONE MXU matmul; the bias is the pre-summed
``b_ih + b_hh``. Gate order is (i, f, g, o) — identical to PyTorch — so
reference checkpoints import losslessly via
:func:`from_torch_lstm_cell`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LSTMCellParams(NamedTuple):
    w: jnp.ndarray  # (input_size + hidden_size, 4 * hidden_size)
    b: jnp.ndarray  # (4 * hidden_size,)

    @property
    def hidden_size(self) -> int:
        return self.w.shape[1] // 4

    @property
    def input_size(self) -> int:
        return self.w.shape[0] - self.hidden_size


def init_lstm_cell(key: jax.Array, input_size: int, hidden_size: int,
                   dtype=jnp.float32) -> LSTMCellParams:
    """PyTorch-style uniform(-1/sqrt(H), 1/sqrt(H)) initialization."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(hidden_size)
    w = jax.random.uniform(k_w, (input_size + hidden_size, 4 * hidden_size),
                           minval=-bound, maxval=bound, dtype=dtype)
    # Two torch bias vectors summed → variance doubles; sample both and add
    # for distributional parity.
    b1 = jax.random.uniform(k_b, (2, 4 * hidden_size), minval=-bound, maxval=bound, dtype=dtype)
    return LSTMCellParams(w=w, b=b1.sum(axis=0))


def lstm_cell(params: LSTMCellParams, x: jnp.ndarray, h: jnp.ndarray,
              c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step. x: (..., input_size); h, c: (..., hidden_size).

    Gate order (i, f, g, o) matches ``torch.nn.LSTMCell``.
    """
    hidden = h.shape[-1]
    xh = jnp.concatenate([x, h], axis=-1)
    # f32 MXU accumulation, then gate math in the working dtype — in bf16
    # this halves the dominant HBM traffic (the (G, 4H) gate tensor).
    gates = jnp.dot(xh, params.w, preferred_element_type=jnp.float32
                    ).astype(h.dtype) + params.b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(h.dtype), c_new.astype(c.dtype)


def from_torch_lstm_cell(w_ih, w_hh, b_ih, b_hh) -> LSTMCellParams:
    """Convert ``torch.nn.LSTMCell`` weights (numpy arrays, torch layout
    ``(4H, in)`` / ``(4H, H)``) into the fused layout."""
    import numpy as np

    w = np.concatenate([np.asarray(w_ih).T, np.asarray(w_hh).T], axis=0)
    b = np.asarray(b_ih) + np.asarray(b_hh)
    return LSTMCellParams(w=jnp.asarray(w), b=jnp.asarray(b))
