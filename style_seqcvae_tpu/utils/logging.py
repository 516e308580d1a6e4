"""Structured metrics + profiling.

The reference logs scalars to tensorboardX (var_updown/scripts/
train.py:179-182) and prints wall-clock timings (frcnn/test_net.py:544-548).
Here: a JSONL metrics writer (always available), optional TensorBoard via
flax/tensorboardX when installed, a step timer with proper device sync, and
a ``jax.profiler`` trace context (SURVEY §5.1)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsWriter:
    def __init__(self, serialization_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(serialization_dir, exist_ok=True)
        self._path = os.path.join(serialization_dir, filename)
        self._f = open(self._path, "a")
        self._tb = None
        try:  # optional tensorboard backend
            from flax.metrics import tensorboard

            self._tb = tensorboard.SummaryWriter(serialization_dir)
        except Exception:
            pass

    def scalars(self, step: int, values: Dict[str, Any]) -> None:
        rec = {"step": int(step)}
        for k, v in values.items():
            rec[k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.scalar(k, v, step)

    def close(self) -> None:
        self._f.close()


def device_sync(x) -> float:
    """Force execution and return a python float. NOTE: on the axon tunnel
    platform ``jax.block_until_ready`` does NOT block; fetching a scalar via
    device_get is the only reliable sync."""
    import jax

    return float(jax.device_get(x))


class StepTimer:
    """Per-phase wall-clock accumulator (data / step / decode)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, count: int = 1):
        """``count``: logical units this timed region covers — a K-step
        chained dispatch passes K so ``summary()`` stays per-step."""
        t0 = time.time()
        yield
        self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0
        self.counts[name] = self.counts.get(name, 0) + count

    def summary(self) -> Dict[str, float]:
        return {f"{k}_ms": 1000.0 * v / max(self.counts[k], 1)
                for k, v in self.totals.items()}


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
