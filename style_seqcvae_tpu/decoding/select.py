"""Beam selection after (constrained) beam search.

Mirrors updown-baseline/updown/utils/decoding.py:10-138:

* :func:`select_best_beam` — top beam (non-CBS path, decoding.py:10-27).
* :func:`select_best_beam_with_constraints` — among FSM states satisfying at
  least ``min(given, min_constraints_to_satisfy)`` constraints, take the
  top beam of the most likely state. ``cbs_simple`` counts set bits of the
  state id (decoding.py:82-86); the grounded mode runs the object∧attribute
  state-set algebra (decoding.py:87-123).

The cbs_simple path is also provided as a pure-JAX function
(:func:`valid_state_mask_simple` + :func:`select_best_beam_simple_jax`) so it
can live inside the compiled decode (vmapped over z-samples).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def select_best_beam(beams, beam_log_probabilities):
    """(B, K, T) → (B, T): beams arrive sorted by likelihood."""
    return beams[:, 0, :]


def valid_state_mask_simple(num_states: int, given_constraints: jnp.ndarray,
                            min_constraints_to_satisfy: int) -> jnp.ndarray:
    """(B,) given-constraint counts → (B, S) bool mask of valid states.

    State s is valid iff popcount(s) >= min(given, min_to_satisfy) and
    s < 2**given (mirrors decoding.py:82-86)."""
    s = jnp.arange(num_states, dtype=jnp.uint32)
    pop = jnp.sum((s[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :]) & 1, axis=1)
    need = jnp.minimum(given_constraints, min_constraints_to_satisfy)   # (B,)
    in_range = s[None, :] < (1 << given_constraints)[:, None]
    return (pop[None, :] >= need[:, None]) & in_range


def select_best_beam_simple_jax(beams: jnp.ndarray, lp: jnp.ndarray,
                                given_constraints: jnp.ndarray,
                                min_constraints_to_satisfy: int
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device cbs_simple selection.

    beams: (B, S, K, T); lp: (B, S, K); given_constraints: (B,) int.
    Returns (best (B, T), best_lp (B,))."""
    B, S, K, T = beams.shape
    valid = valid_state_mask_simple(S, given_constraints, min_constraints_to_satisfy)
    top_lp = jnp.where(valid, lp[:, :, 0], -jnp.inf)     # (B, S) beam-0 lp
    best_state = jnp.argmax(top_lp, axis=1)              # (B,)
    best = jnp.take_along_axis(
        beams[:, :, 0, :], best_state[:, None, None], axis=1)[:, 0, :]
    return best, jnp.max(top_lp, axis=1)


def select_best_beam_with_constraints(
    beams: np.ndarray,                 # (B, S, K, T)
    beam_log_probabilities: np.ndarray,  # (B, S, K)
    given_constraints: Sequence[int],  # (B,)
    constraints: Optional[List[List]] = None,       # grounded mode
    constraint2states: Optional[List[Dict[str, List[int]]]] = None,
    min_constraints_to_satisfy: int = 2,
    cbs_simple: bool = True,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Host-side selection with both modes (decoding.py:30-138).

    Returns ``(best_beams (B, T), per-image arrays of valid top beams)``."""
    beams = np.asarray(beams)
    lp = np.asarray(beam_log_probabilities)
    B = beams.shape[0]
    best_beams, batch_valid_beams = [], []

    for i in range(B):
        given = int(given_constraints[i])
        if cbs_simple:
            valid_states = [s for s in range(2 ** given)
                            if bin(s).count("1") >= min(given, min_constraints_to_satisfy)]
        else:
            # Grounded mode: each constraint i is (object_name, [attr names]).
            # A state is valid if enough objects are satisfied, where an
            # object with attributes requires one of its attributes too
            # (decoding.py:87-123).
            n_states = 2 ** given
            states_objects = np.zeros(n_states, dtype=int)
            objects_with_attributes = np.zeros(n_states, dtype=int)
            for o in constraints[i]:
                states_object = np.zeros(n_states, dtype=int)
                states_object[constraint2states[i][o[0]]] = 1
                states_attributes = np.zeros(n_states, dtype=int)
                if not o[1]:
                    states_attributes[:] = 1
                else:
                    for a in o[1]:
                        sa = np.zeros(n_states, dtype=int)
                        sa[constraint2states[i][a]] = 1
                        states_attributes |= sa
                states_object &= states_attributes
                if not np.all(states_attributes):
                    objects_with_attributes |= states_object
                states_objects += states_object
            if np.any(objects_with_attributes):
                states_objects *= (np.clip(states_objects, 0, 1) & objects_with_attributes)
            valid_states = list(np.where(
                states_objects >= min(len(constraints[i]), min_constraints_to_satisfy))[0])

        valid_beams = beams[i, valid_states, 0, :]
        valid_lp = lp[i, valid_states, 0]
        batch_valid_beams.append(valid_beams)
        sel = int(np.argmax(valid_lp))
        best_beams.append(valid_beams[sel])

    return np.stack(best_beams).astype(np.int64), batch_valid_beams
