"""Shared parameter initializers.

``torch_linear`` reproduces PyTorch's ``nn.Linear`` default init —
U(-1/√fan_in, 1/√fan_in) for both weight and bias — with the key split
(kw, kb) convention every captioner-family init uses; previously this was
re-implemented identically in captioner.py, baseline.py and updown_cell.py
(round-3 review dedup). attention.py keeps its own one-key-per-tensor
variant (different RNG contract, non-linear-shaped leaves).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def torch_linear(key: jax.Array, fan_in: int, fan_out: int,
                 dtype=jnp.float32, bias: bool = True) -> Dict[str, jnp.ndarray]:
    """Torch-default linear params ``{"w": (fan_in, fan_out)[, "b": (fan_out,)]}``.

    Consumes ``key`` as split(key) → (kw, kb) and draws the weight from kw
    and the bias from kb, so values are identical to the three historical
    inline copies for the same keys.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound,
                           dtype=dtype)
    if not bias:
        return {"w": w}
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound,
                           dtype=dtype)
    return {"w": w, "b": b}
