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


# jit names too generic to group by — many DISTINCT live programs share
# them (e.g. the several jit__lambda entries in .jax_cache), so same-name
# near-same-size dedup would delete live entries every run and re-pay the
# minutes-scale remote load cost in perpetual churn (ADVICE r4)
GENERIC_JIT_NAMES = frozenset(
    {"jit__lambda", "jit_fn", "jit__unnamed_function", "jit__unnamed"})


def prune_compile_cache(path: str | None = None,
                        max_bytes: int = 400 * 1024 * 1024,
                        dup_size_tol: float = 0.02,
                        drift_age_secs: float = 3600.0,
                        dry_run: bool = False) -> dict:
    """Garbage-collect the persistent compile cache.

    The environment-side cache KEY can drift between processes for the
    byte-identical computation (same computation/jaxlib/flags hashes —
    different tunnel backend instances; BASELINE.md round-3 notes), leaving
    duplicate multi-MB entries that bloat the committed cache (measured
    590 MB before a manual prune). Two passes:

    1. **drift dedup** — entries sharing the jit name whose sizes agree
       within ``dup_size_tol`` (2%) are treated as drifted keys of one
       program; the newest survives, older duplicates drop. (Measured drift
       pairs differ by 0.8-1.2%; same-name entries at genuinely different
       shapes/buckets differ by far more.)
    2. **size cap** — if the cache still exceeds ``max_bytes`` (default
       400 MB — generous headroom over the ~250 MB working set; the cap
       guards unbounded accretion, not a tight budget), the oldest-STORED
       entries drop until it fits, EXCEPT the newest entry of every
       jit-name group: cache hits never touch mtime, so "oldest mtime"
       means oldest-stored (possibly still-hot), and keeping one entry per
       program family bounds the worst case at one shape-variant recompile
       rather than a whole program family.

    Dropping a live entry only costs a re-compile + re-store — safe by
    construction. Returns a report dict; ``dry_run`` reports without
    deleting. Called from ``bench.py`` (start AND end of the run, so
    drift duplicates re-stored mid-run don't survive into committed
    snapshots) — the cache stays bounded across rounds without manual
    pruning."""
    if path is None:
        path = os.environ.get("SSC_JAX_CACHE") or os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    if not os.path.isdir(path):
        return {"path": path, "dropped": [], "kept_bytes": 0,
                "dropped_bytes": 0}

    entries = []
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if not os.path.isfile(full):
            continue
        st = os.stat(full)
        entries.append((name, st.st_size, st.st_mtime))

    dropped = []

    def drop(name, size, why):
        dropped.append({"name": name, "bytes": size, "why": why})
        if not dry_run:
            try:
                os.unlink(os.path.join(path, name))
            except OSError:
                pass

    # pass 1: drift dedup within same-jit-name groups. Two guards against
    # deleting LIVE entries (ADVICE r4): generic jit names (many distinct
    # programs share them) are excluded entirely, and a duplicate only
    # drops when it is at least ``drift_age_secs`` OLDER than its twin —
    # real key drift leaves the stale entry a round behind (hours), while
    # two distinct live programs re-stored in the same bench run sit
    # minutes apart and both survive.
    groups: dict = {}
    for name, size, mtime in entries:
        prefix = name.rsplit("-", 2)[0] if name.endswith("-cache") else name
        groups.setdefault(prefix, []).append((name, size, mtime))
    kept = []
    group_newest: dict = {}
    for prefix, group in groups.items():
        group.sort(key=lambda e: -e[2])          # newest first
        group_newest[prefix] = group[0][0]
        if prefix in GENERIC_JIT_NAMES:
            kept.extend(group)
            continue
        survivors: list = []
        for name, size, mtime in group:
            twin = next(
                (s for s in survivors
                 if abs(s[1] - size) <= dup_size_tol * max(s[1], size)
                 and s[2] - mtime >= drift_age_secs),
                None)
            if twin is not None:
                drop(name, size, f"key-drift duplicate of {twin[0]}")
            else:
                survivors.append((name, size, mtime))
        kept.extend(survivors)

    # pass 2: size cap — oldest-stored first, sparing each group's newest
    protected = set(group_newest.values())
    total = sum(size for _, size, _ in kept)
    evictable = sorted((e for e in kept if e[0] not in protected),
                       key=lambda e: e[2])       # oldest first
    while total > max_bytes and evictable:
        name, size, _ = evictable.pop(0)
        drop(name, size, "size cap")
        total -= size

    return {"path": path, "dropped": dropped, "kept_bytes": total,
            "dropped_bytes": sum(d["bytes"] for d in dropped)}
