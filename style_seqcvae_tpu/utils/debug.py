"""Debug-mode helpers (SURVEY §5.2: the single-controller replacement for
race detectors / sanitizers).

* :func:`enable_nan_debugging` — turn on ``jax_debug_nans`` (compiled code
  re-runs op-by-op on NaN and raises at the producing op).
* :func:`checked` — wrap a function with ``jax.experimental.checkify`` so
  NaN/inf/OOB-index errors inside jit surface as real errors with location.
"""

from __future__ import annotations

import functools
from typing import Callable


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def checked(fn: Callable, *, errors=None) -> Callable:
    """Returns a wrapped fn that raises on NaN / div-by-zero / OOB index
    produced anywhere inside (works under jit)."""
    from jax.experimental import checkify

    errs = errors if errors is not None else (
        checkify.float_checks | checkify.index_checks | checkify.div_checks)
    cfn = checkify.checkify(fn, errors=errs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
