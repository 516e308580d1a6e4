"""On-device CBS constraint selection + FSM table construction.

The reference builds its per-image FSM on the host between feature
extraction and decoding (updown-baseline/updown/data/datasets.py:470-580 →
updown/utils/constraints.py:329-478), which forces a host round-trip in the
middle of the serving path. For the ``cbs_simple`` mode the constraints are
single-word attribute wordforms (``constraint_wordforms_attribs_exp.tsv``:
≤5 single-token forms per attribute), so both steps reduce to fixed-shape
gathers/arithmetic and can run inside the SAME XLA program as the detector
forward and the CBS decode — one dispatch from raw image to N diverse
captions (see ``style_seqcvae_tpu.serving``).

Semantics:

- **Selection** mirrors the host ``cbs_simple`` path
  (``data/datasets.py::generate_cbs_state_machine`` here; reference
  ``datasets.py:498-518``): one random attribute per detected object class
  — attribute presence unioned over all boxes of the class and deduplicated
  by *cleaned* wordform key exactly like the host's ``set`` — up to
  ``max_constraints`` objects. Documented divergences: objects are taken in
  descending detection-score order (the host consumes the class-major h5
  stream), and the random pick uses a jax PRNG key (statistical, not
  bitwise, RNG parity — same policy as the target layers, README "Known
  divergences").

- **Table construction** is equivalence-tested against
  ``FiniteStateMachineBuilder.build_tables`` (tests/test_device_fsm.py):
  identical decode beams + log-probs for distinct single-word constraints.
  A word picked by two objects is wired independently per constraint slot
  (the clean bit-lattice generalization: the token nondeterministically
  sets either bit) instead of replaying the reference's repeated-constraint
  chain replay (``constraints.py:394-401``), whose from-state arithmetic is
  only exercised by the sentiment ``[w, w, w]`` case — and sentiment FSMs
  have no per-image data dependence, so those stay host-built.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence

import numpy as np

from style_seqcvae_tpu.decoding.cbs_fast import FSMTables

MAX_WORDFORMS = 5   # constraint_wordforms_attribs_exp.tsv row maximum


class AttributeWordformTable(NamedTuple):
    """Static per-vocabulary lookup tables (host-built once, shipped to the
    device as ordinary jit constants/arguments).

    tokens     (A, W) int32 — vocab ids of the wordforms of attribute
               ``a``'s cleaned name (rows gathered via ``canonical``).
    valid      (A, W) bool  — which wordform slots are real.
    selectable (A,)   bool  — attribute is whitelisted and has wordforms.
    canonical  (A,)   int32 — lowest attribute id sharing the same cleaned
               name (the host selection operates on a ``set`` of cleaned
               names; projecting onto canonical ids reproduces that dedup).
    """
    tokens: np.ndarray
    valid: np.ndarray
    selectable: np.ndarray
    canonical: np.ndarray


def clean_attribute_name(name: str) -> str:
    """The reference's attribute-name cleanup (datasets.py:453 here;
    reference datasets.py:503): last whitespace token, second-to-last when
    the name ends in a space."""
    parts = name.split(" ")
    return parts[-1] or parts[-2]


def build_attribute_wordform_table(
    att_id2name: Sequence[str],
    wordforms: Dict[str, List[str]],
    vocabulary,
    max_wordforms: int = MAX_WORDFORMS,
) -> AttributeWordformTable:
    """Host-side precompute of :class:`AttributeWordformTable`.

    ``att_id2name``: attribute-head index → raw attribute name (the
    COCO-Attributes index order the detector's attribute head was trained
    with). ``wordforms``: cleaned-name → wordform list — pass
    ``FiniteStateMachineBuilder.wordforms`` so whitelist pruning
    (constraints.py:314-327) is already applied. Multi-token wordforms are
    dropped with a count (none exist in the shipped TSVs)."""
    A = len(att_id2name)
    tokens = np.zeros((A, max_wordforms), np.int32)
    valid = np.zeros((A, max_wordforms), bool)
    selectable = np.zeros((A,), bool)
    canonical = np.arange(A, dtype=np.int32)
    first_by_clean: Dict[str, int] = {}
    dropped_multitoken = 0
    for a, name in enumerate(att_id2name):
        cleaned = clean_attribute_name(name)
        canonical[a] = first_by_clean.setdefault(cleaned, a)
        forms = wordforms.get(cleaned)
        if not forms:
            continue
        single = [w for w in forms if " " not in w.strip()]
        dropped_multitoken += len(forms) - len(single)
        single = single[:max_wordforms]
        if not single:
            continue
        selectable[a] = True
        for j, w in enumerate(single):
            tokens[a, j] = vocabulary.get_token_index(w)
            valid[a, j] = True
    if dropped_multitoken:
        import warnings

        warnings.warn(
            f"build_attribute_wordform_table: dropped {dropped_multitoken} "
            "multi-token wordforms (device cbs_simple tables support "
            "single-token forms only)")
    # canonical rows must carry the wordforms; aliases gather through them
    return AttributeWordformTable(
        tokens=tokens[canonical], valid=valid[canonical],
        selectable=selectable[canonical], canonical=canonical)


def select_attribute_constraints(class_ids, valid, att_scores, table, key, *,
                                 att_thresh: float = 0.3,
                                 max_constraints: int = 3):
    """Device analogue of the host cbs_simple candidate selection for ONE
    image (datasets.py:447-459 here; reference datasets.py:498-518).

    class_ids (M,) int, valid (M,) bool, att_scores (M, A) float — the
    outputs of ``select_detections_device`` (descending detection score).
    Returns ``(att_ids (max_constraints,) int32 with -1 padding,
    num_given () int32)``; ``att_ids`` are canonical attribute ids feeding
    :func:`build_tables_device`."""
    import jax
    import jax.numpy as jnp

    M, A = att_scores.shape
    selectable = jnp.asarray(table.selectable)
    canonical = jnp.asarray(table.canonical)

    present = (att_scores > att_thresh) & valid[:, None] & selectable[None, :]
    # host set-of-cleaned-names dedup: scatter-OR onto canonical ids
    present_c = jnp.zeros((M, A), bool).at[:, canonical].max(present)

    same = (class_ids[:, None] == class_ids[None, :]) \
        & valid[:, None] & valid[None, :]                        # (M, M)
    # union of attributes over boxes of the same class
    obj_att = (same.astype(jnp.float32) @ present_c.astype(jnp.float32)) > 0

    idx = jnp.arange(M)
    earlier_same = same & (idx[None, :] < idx[:, None])
    first = valid & ~earlier_same.any(axis=1)                    # (M,)
    cand = first & obj_att.any(axis=1)
    rank = jnp.cumsum(cand) - 1                                  # 0-based slot

    slots = jnp.arange(max_constraints)
    slot_onehot = cand[None, :] & (rank[None, :] == slots[:, None])  # (k, M)
    slot_valid = slot_onehot.any(axis=1)
    slot_box = jnp.argmax(slot_onehot, axis=1)                   # (k,)
    slot_att = obj_att[slot_box]                                 # (k, A)

    g = jax.random.gumbel(key, (max_constraints, A))
    pick = jnp.argmax(jnp.where(slot_att, g, -jnp.inf), axis=1)
    att_ids = jnp.where(slot_valid, pick, -1).astype(jnp.int32)
    return att_ids, slot_valid.sum().astype(jnp.int32)


def build_tables_device(att_ids, table, max_constraints: int = 3,
                        num_states: int = 0) -> FSMTables:
    """Exception-form FSM for ONE image's ≤``max_constraints`` single-word
    constraints, built with pure gathers (jit-safe).

    ``att_ids`` (k,) int32 canonical attribute ids, -1 = absent. Output
    shapes: default_dest (S,), exc_* (S, k·W) with S = 2**k main states
    (sub-states never arise for single-word constraints,
    constraints.py:363-425). Equivalent to
    ``FiniteStateMachineBuilder.build_tables`` for distinct constraints
    (tested); duplicate words wire independently per slot (see module
    docstring)."""
    import jax.numpy as jnp

    k = att_ids.shape[0]
    assert k <= max_constraints
    S = num_states or 2 ** k
    assert S >= 2 ** k, f"num_states {S} < 2**{k} main states"
    W = table.tokens.shape[1]

    ids = jnp.clip(att_ids, 0)
    tok = jnp.asarray(table.tokens)[ids]                         # (k, W)
    val = jnp.asarray(table.valid)[ids] & (att_ids >= 0)[:, None]

    states = jnp.arange(S, dtype=jnp.int32)
    bits = (states[:, None] >> jnp.arange(k)[None, :]) & 1       # (S, k)
    bit_vals = (1 << jnp.arange(k, dtype=jnp.int32))             # (k,)

    exc_token = jnp.broadcast_to(tok.reshape(-1)[None, :], (S, k * W))
    exc_dest = states[:, None] | jnp.repeat(bit_vals, W)[None, :]
    exc_valid = val.reshape(-1)[None, :] & jnp.repeat(bits == 0, W, axis=1)
    return FSMTables(default_dest=states,
                     exc_token=exc_token.astype(jnp.int32),
                     exc_dest=exc_dest.astype(jnp.int32),
                     exc_valid=exc_valid)
