"""Fused single-program parameter initialization.

Eager ``init_*`` runs ~100 tiny RNG programs; through the axon tunnel each
dispatch pays ~0.3–0.5 s, so eager init costs ~50 s per model while the
fused program (client compile cached) takes ~2 s — most of round-2's
"config-1 compile_s 211 s" (BASELINE.md round-3 diagnosis). Shared by all
CLIs, bench, and ``__graft_entry__`` so the two rules live in ONE place:
initialize inside a single ``jax.jit``, and pass any embedding table as a
jit ARGUMENT (a closure would bake a ~25 MB constant into the executable
and its compile-cache entry).
"""

from __future__ import annotations


def jit_init(init_fn, cfg, key, embedding_table=None, dtype=None):
    """``init_fn(key, cfg[, embedding_table][, dtype=…])`` as one jitted
    program. Works for ``init_captioner``, ``init_baseline`` (third
    positional = embedding table) and ``init_detector`` (no table)."""
    import jax
    import jax.numpy as jnp

    kw = {} if dtype is None else {"dtype": dtype}
    if embedding_table is None:
        return jax.jit(lambda k: init_fn(k, cfg, **kw))(key)
    return jax.jit(lambda k, e: init_fn(k, cfg, e, **kw))(
        key, jnp.asarray(embedding_table))
