"""Persistent XLA compile cache for the CLIs.

Cold-compiling the production decode/train programs takes minutes through
the remote compile path (CLAUDE.md); without a persistent cache EVERY CLI
invocation pays it again — measured 8 min for a 64-image inference run
whose warm decode time is under a minute. Every entry point calls
:func:`enable_compile_cache` right after backend selection.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (default: the
    repo-level ``.jax_cache``, overridable via ``SSC_JAX_CACHE``)."""
    import jax

    if path is None:
        path = os.environ.get("SSC_JAX_CACHE", "")
    if jax.default_backend() == "cpu":
        # On CPU, cache only when a path was given explicitly (argument or
        # SSC_JAX_CACHE): the test suite exports SSC_JAX_CACHE so its CLI
        # subprocess smokes warm-start across runs (the dominant suite cost
        # on this 1-core box), but ad-hoc CPU runs don't litter the repo
        # accelerator cache with tiny entries.
        if not path:
            return ""
    if not path:
        path = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Threshold 1 s, NOT the old 5 s: on the axon path the client-side
    # XLA compile can be quick (bench config 1's greedy program: 4.2 s)
    # while the FIRST EXECUTION of a fresh binary pays a minutes-long
    # remote-side compile. A client cache hit re-ships the byte-identical
    # serialized executable, which the remote recognizes — so any program
    # whose client compile is non-trivial must be stored or every new
    # process re-pays the remote compile (round-2's "config-1 recompiles
    # 211 s every bench run" mystery, VERDICT r2 item 1).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return path
