"""Multi-host (multi-process) runtime — SURVEY.md §5.8.

The reference's only distribution mechanism is single-process
``torch.nn.DataParallel`` (no process groups, no multi-node capability).
The TPU-native scaling story past one host is JAX's multi-controller
runtime: every process calls :func:`jax.distributed.initialize` once, then
runs the SAME mesh/pjit code as single-host — the mesh spans all global
devices, collectives ride ICI within a pod slice and DCN across slices,
and each process feeds only its local input shard.

This module provides the two pieces that story needs:

* :func:`maybe_initialize_distributed` — env-gated, idempotent
  ``jax.distributed.initialize``. Call it at CLI entry, before the first
  device query. Single-process runs (no env vars set) are untouched.
* :func:`local_batch_size` — the per-process slice of a global batch.

The global-array assembly itself lives in :mod:`.mesh`:
``shard_batch`` / ``shard_detector_batch`` route every leaf through
``jax.make_array_from_process_local_data`` whenever
``jax.process_count() > 1``, so under multi-host each process's data
loader must yield its LOCAL batch (``local_batch_size`` rows, drawn from
a per-process dataset shard — ``TrainingDataset.batches(...,
process_shard=(index, count))``), and the train step sees one global
batch. No other call-site changes.

There is no multi-host hardware in this environment, but the
multi-process branch IS executed for real: ``tests/test_multihost.py::
test_real_two_process_cluster`` (and the final ``dryrun_multichip``
stage) stand up a genuine 2-process ``jax.distributed`` CPU cluster on
localhost — coordinator + two subprocesses, each with forced host
devices, wired through this module's SSC_COORDINATOR env path — and
verify the global loss/update on disjoint per-process shards equals the
single-process run on the concatenated batch (see
:mod:`.distributed_worker`). The single-process path is additionally
verified identical to plain ``device_put`` placement.
"""

from __future__ import annotations

import os

import jax

_ENV_COORDINATOR = "SSC_COORDINATOR"
_ENV_NUM_PROCESSES = "SSC_NUM_PROCESSES"
_ENV_PROCESS_ID = "SSC_PROCESS_ID"
_ENV_AUTO = "SSC_MULTIHOST"

_initialized = False


def maybe_initialize_distributed() -> None:
    """Initialize JAX's multi-controller runtime when configured by env.

    Two forms (both no-ops when unset, and idempotent):

    * ``SSC_MULTIHOST=1`` — ``jax.distributed.initialize()`` with no
      arguments: Cloud TPU pod slices auto-detect the coordinator,
      process count and process id from the TPU metadata.
    * ``SSC_COORDINATOR=host:port`` + ``SSC_NUM_PROCESSES`` +
      ``SSC_PROCESS_ID`` — explicit wiring for environments without
      auto-detection (e.g. CPU/GPU multi-process tests).

    Must run before the first JAX device query (backend init), which is
    why the CLIs call it at the top of ``main()``.
    """
    global _initialized
    if _initialized:
        return
    if os.environ.get(_ENV_COORDINATOR):
        jax.distributed.initialize(
            coordinator_address=os.environ[_ENV_COORDINATOR],
            num_processes=int(os.environ[_ENV_NUM_PROCESSES]),
            process_id=int(os.environ[_ENV_PROCESS_ID]))
        _initialized = True
    elif os.environ.get(_ENV_AUTO, "") not in ("", "0"):
        jax.distributed.initialize()
        _initialized = True


def local_batch_size(global_batch_size: int) -> int:
    """Rows this process contributes to a global batch (the per-process
    loader batch size under multi-host; the full batch single-process)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch size {global_batch_size} is not divisible by "
            f"the {n} participating processes")
    return global_batch_size // n
