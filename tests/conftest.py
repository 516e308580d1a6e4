"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 "multi-chip tests
without hardware")."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session may preset axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU) via a site customization;
# explicit config update is the only reliable way to force CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache for the suite: the heavy tests are XLA-CPU
# compile-dominated (detector fwd+grad ≈ 18 s cold, 3 s warm), so repeat
# keep-green runs skip most compilation. Separate dir from the TPU
# `.jax_cache` (different backend, gitignored). Disable with
# SSC_TEST_CACHE=off; the AOT loader's "prefer-no-scatter not supported"
# stderr on cache loads is a known cosmetic pseudo-feature mismatch.
_cache = os.environ.get("SSC_TEST_CACHE", "")
if _cache != "off":
    _cache_dir = os.path.abspath(
        _cache or os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    # CLI subprocess smokes (--cpu) read this via enable_compile_cache so
    # they warm-start across suite runs too — they dominate full-suite time
    os.environ["SSC_JAX_CACHE"] = _cache_dir


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-dims parity / multi-minute tests — excluded from the "
        "keep-green quick loop (`pytest -m 'not slow'`); run the full "
        "suite before snapshots")
