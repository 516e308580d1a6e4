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

    if jax.default_backend() == "cpu":
        # CPU compiles are fast and the suite's subprocess smokes would
        # litter the repo cache with tiny entries — persistent caching only
        # pays on the accelerator path
        return ""
    if path is None:
        path = os.environ.get("SSC_JAX_CACHE") or os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    return path
