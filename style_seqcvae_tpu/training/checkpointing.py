"""Orbax-based checkpointing with the reference manager's semantics.

The reference ``CheckpointManager`` (updown-baseline/updown/utils/
checkpointing.py:9-113) saves ``{model, optimizer}`` every N steps plus a
tracked-best checkpoint by metric/mode. Here checkpoints carry
``(params, opt_state, rng, step, config snapshot)`` so resume is
step-accurate — deliberately fixing the reference's restart-at-iteration-1
resume bug (var_updown/scripts/train.py:142-151; divergence noted per
SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, serialization_dir: str, mode: str = "max", keep: int = 10):
        """``keep``: retain at most this many ``checkpoint_{it}`` dirs —
        older ones are pruned after each save (``checkpoint_best`` is never
        pruned). ``keep <= 0`` disables pruning. A 70k-iteration reference
        run checkpointing every 2k steps would otherwise fill the disk."""
        self._dir = os.path.abspath(serialization_dir)
        os.makedirs(self._dir, exist_ok=True)
        self._mode = mode
        self._keep = keep
        self._best_metric: Optional[float] = None
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name) -> str:
        return os.path.join(self._dir, str(name))

    def step(self, state, metric: float, iteration: int, config_dump: str = "") -> None:
        """Save ``checkpoint_{it}`` and refresh ``checkpoint_best`` when the
        tracked metric improves (reference checkpointing.py:81-113)."""
        self.save(state, f"checkpoint_{iteration}")
        if config_dump:
            with open(self._path(f"checkpoint_{iteration}.config.yml"), "w") as f:
                f.write(config_dump)
        # ties REFRESH best (>=/<=): the train CLI passes a constant metric
        # (the reference does the same, checkpointing.py:81-113), and with a
        # strict comparison checkpoint_best would freeze at the FIRST save
        # while pruning deletes the numbered checkpoints around it — and
        # inference/serve default to loading checkpoint_best. With ties
        # refreshing, a constant metric makes best track the newest save.
        improved = (
            self._best_metric is None
            or (self._mode == "max" and metric >= self._best_metric)
            or (self._mode == "min" and metric <= self._best_metric)
        )
        if improved:
            self._best_metric = float(metric)
            self.save(state, "checkpoint_best")
        self._prune()

    def _prune(self) -> None:
        """Delete numbered checkpoints beyond the ``keep`` most recent."""
        if self._keep <= 0:
            return
        its = sorted(self._iterations())
        for it in its[:max(0, len(its) - self._keep)]:
            for suffix in ("", ".config.yml"):
                path = self._path(f"checkpoint_{it}{suffix}")
                if os.path.isdir(path):
                    import shutil

                    shutil.rmtree(path, ignore_errors=True)
                elif os.path.exists(path):
                    os.remove(path)

    def _iterations(self):
        return [int(d.split("_")[1]) for d in os.listdir(self._dir)
                if d.startswith("checkpoint_") and d.split("_")[1].isdigit()]

    def save(self, state, name: str) -> None:
        path = self._path(name)
        self._ckpt.save(path, _to_saveable(state), force=True)
        # StandardCheckpointer commits asynchronously; wait so saves never
        # race interpreter shutdown or an immediate restore.
        self._ckpt.wait_until_finished()

    def restore(self, name: str, target_state):
        # Abstract target with the LIVE state's shardings: Orbax then
        # reshards on load, so a single-process save restores onto a
        # multi-process mesh and a distributed sharded save restores into
        # one process (with a concrete target Orbax can reproduce the
        # SAVED placement instead — restoring a laptop-saved scalar onto
        # global device 0 only, which poisons the next jitted step on an
        # 8-device mesh; test_multihost.py portability test).
        def absify(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return x

        abstract = jax.tree_util.tree_map(absify, _to_saveable(target_state))
        return _from_saveable(
            self._ckpt.restore(self._path(name), abstract), target_state)

    def latest_iteration(self) -> Optional[int]:
        its = self._iterations()
        return max(its) if its else None


def _to_saveable(state):
    """NamedTuples → dicts (orbax StandardCheckpointer wants plain pytrees)."""

    def conv(x):
        if hasattr(x, "_asdict"):
            return {k: conv(v) for k, v in x._asdict().items()}
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [conv(v) for v in x]
        return x

    return conv(state)


def _from_saveable(data, target):
    """Rebuild the NamedTuple structure of ``target`` from restored dicts."""
    if hasattr(target, "_asdict"):
        return type(target)(**{
            k: _from_saveable(data[k], v) for k, v in target._asdict().items()})
    if isinstance(target, dict):
        return {k: _from_saveable(data[k], v) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        return type(target)(_from_saveable(d, t) for d, t in zip(data, target))
    return data
