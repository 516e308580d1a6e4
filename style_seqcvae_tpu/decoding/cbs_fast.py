"""Speed-of-light Constrained Beam Search via FSM default/exception
decomposition.

Every state of the reference FSM (updown-baseline/updown/utils/
constraints.py:329-478) has a **default destination** for almost the whole
vocabulary — itself for main states (self-loop), the reset state for
sub-states — plus a handful of **exception tokens** (constraint wordforms)
with explicit destinations. The dense CBS (cbs.py here, reference
cbs.py:200-226) rescans the full ``(B, S, K, V)`` log-prob tensor once per
target state; this module exploits the decomposition to do ONE full-vocab
top-k per step (over default tokens) plus O(E)-sized gathers, cutting HBM
traffic by ~S× while producing byte-identical beams for reachable states.

Candidate-set equivalence: for target state ``i``, tokens from source ``s``
are (a) all non-exception tokens iff ``default_dest[s] == i`` — their top
``per_node_beam_size`` is the top of the default top-k — plus (b) exception
entries with ``dest == i``. Nondeterministic tokens (shared wordforms)
appear as multiple exception entries, exactly reproducing the dense
adjacency semantics.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.decoding.beam_search import (
    _cleaned_log_probs,
    reconstruct_sequences,
)
from style_seqcvae_tpu.ops.topk import small_top_k

MASK_VAL = -1e20


class FSMTables(NamedTuple):
    """Exception-form FSM. Batch-leading shapes:
    default_dest (B, S) int32; exc_token/exc_dest (B, S, E) int32;
    exc_valid (B, S, E) bool."""
    default_dest: jnp.ndarray
    exc_token: jnp.ndarray
    exc_dest: jnp.ndarray
    exc_valid: jnp.ndarray

    @property
    def num_states(self) -> int:
        return self.default_dest.shape[-1]


def pack_exception_entries(default_dest: np.ndarray, entries,
                           max_exceptions: int = 0) -> FSMTables:
    """Pack per-state ``[(token, dest)]`` exception rows into FSMTables
    (shared encoding contract: mask-only entries use dest=-1, E = longest
    row or 1, zero padding with valid=False). Used by :func:`fsm_to_tables`
    and ``fsm.FiniteStateMachineBuilder.build_tables``."""
    S = default_dest.shape[0]
    E = max_exceptions or max((len(r) for r in entries), default=1) or 1
    exc_token = np.zeros((S, E), np.int32)
    exc_dest = np.zeros((S, E), np.int32)
    exc_valid = np.zeros((S, E), bool)
    for s, row in enumerate(entries):
        assert len(row) <= E, f"state {s} has {len(row)} exceptions > E={E}"
        for j, (v, d) in enumerate(row):
            exc_token[s, j], exc_dest[s, j], exc_valid[s, j] = v, d, True
    return FSMTables(default_dest, exc_token, exc_dest, exc_valid)


def fsm_to_tables(fsm_dense: np.ndarray, max_exceptions: int = 0) -> FSMTables:
    """Convert a dense (S, S, V) adjacency into exception form (host-side,
    per image/z-sample at FSM build time)."""
    S, _, V = fsm_dense.shape
    default_dest = np.zeros((S,), np.int32)
    entries = []
    for s in range(S):
        counts = fsm_dense[s].sum(axis=1)       # transitions per destination
        d = int(np.argmax(counts)) if counts.sum() > 0 else s
        default_dest[s] = d
        # tokens that do not follow the plain default transition
        other = (fsm_dense[s].sum(axis=0) - fsm_dense[s, d]) > 0
        no_default = fsm_dense[s, d] == 0
        exc_tok = np.where(other | no_default)[0]
        row = []
        for v in exc_tok:
            dests = np.where(fsm_dense[s, :, v])[0]
            if len(dests) == 0:
                # dead token (all destinations trimmed away): must still be
                # masked out of the default transition — emit a mask-only
                # entry with an unreachable destination.
                row.append((int(v), -1))
            for dest in dests:
                row.append((int(v), int(dest)))
        entries.append(row)

    return pack_exception_entries(default_dest, entries, max_exceptions)


def stack_fsm_tables(tables, pad_exceptions: int = 0) -> FSMTables:
    """Stack per-image FSMTables (padding E) into batch-leading arrays."""
    E = max(pad_exceptions, max(t.exc_token.shape[-1] for t in tables))

    def pad(t: FSMTables) -> FSMTables:
        e = t.exc_token.shape[-1]
        if e == E:
            return t
        pw = [(0, 0), (0, E - e)]
        return FSMTables(
            t.default_dest,
            np.pad(t.exc_token, pw), np.pad(t.exc_dest, pw),
            np.pad(t.exc_valid, pw))

    ts = [pad(t) for t in tables]
    return FSMTables(*[jnp.asarray(np.stack([getattr(t, f) for t in ts]))
                       for f in FSMTables._fields])


def constrained_beam_search_fast(
    step_fn: Callable,
    start_tokens: jnp.ndarray,   # (B,)
    init_state,
    fsm: FSMTables,              # batch-leading (B, S[, E])
    rng: jax.Array,
    *,
    max_steps: int,
    beam_size: int,
    per_node_beam_size: int = 0,
    end_index: int,
    raw_step: bool = False,
    noise: "Optional[jnp.ndarray]" = None,
    fused_vocab_topk: "Optional[bool]" = None,
    prehead_step: bool = False,
    embedding: "Optional[jnp.ndarray]" = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as :func:`style_seqcvae_tpu.decoding.cbs.
    constrained_beam_search`: returns ((B, S, K, T), (B, S, K)).

    ``raw_step=True``: the step fn returns ``((logits, logz), state)``
    (captioner.make_step_fn(return_raw=True)); selection happens on raw
    logits and only the few selected values get the -logz correction —
    no (G, V) log_softmax materialization. End-token freezing is applied
    post-selection (valid because the end token is never a constraint
    wordform, so it always takes the default transition).

    ``fused_vocab_topk`` (opt-in; measured slower on v5e — see inline
    note): the per-step masked top-k + logsumexp collapse into ONE Pallas
    pass over the (B·S·K, V) logits (ops/pallas/topk_lse.py): the kernel
    returns the unmasked top-(pnbs+E) + logsumexp, and exceptions are
    filtered afterwards on the tiny (·, pnbs+E) tensors — exact, since a
    state has at most E exception tokens. The step's own logz output is
    unused in this mode and dead-code-eliminated.

    ``prehead_step=True`` (with ``embedding`` (V, E)): the step fn returns
    the tied-head PRE-embedding activation ``(…, E)``
    (captioner.make_optimized_step_fn(return_prehead=True)); the vocab
    matmul, top-(pnbs+E) and logsumexp all fuse into ONE streaming Pallas
    kernel (ops/pallas/vocab_topk_lse.py) — the (B·S·K, V) logits tensor
    (~270 MB bf16 at production shapes) never exists in HBM. Exception
    logits come from a tiny einsum against the pre-gathered exception
    embedding rows. Measured on one v5e at production shapes: 741 vs the
    raw path's 938 captions/s — the k-step VPU merge per V tile costs more
    than the saved logits traffic, so with round-2's post-matmul fusion
    attempt (704) this brackets the design space: XLA's materialized chain
    IS the selection roofline here. Kept as a tested opt-in; bf16 tile-
    merge lse rounding can flip near-tied beams on-chip (token-identical
    in f32)."""
    B, S = fsm.default_dest.shape
    E = fsm.exc_token.shape[-1]
    K = beam_size
    pnbs = per_node_beam_size or beam_size
    on_tpu = jax.default_backend() == "tpu"
    # Measured on one v5e at production shapes: the fused Pallas pass is
    # SLOWER end-to-end (704 vs 940 captions/s) — the custom call is a
    # fusion barrier (logits must materialize instead of fusing into XLA's
    # masked k=2 argmax chain). Kept as an opt-in for future re-evaluation;
    # default stays on the XLA path.
    fused = bool(fused_vocab_topk)
    if fused and not raw_step:
        raise ValueError("fused_vocab_topk requires raw_step=True (the "
                         "kernel selects on raw logits + logsumexp)")
    if prehead_step:
        if embedding is None:
            raise ValueError("prehead_step requires the tied embedding "
                             "table (V, E)")
        if raw_step or fused:
            raise ValueError("prehead_step is its own step contract — "
                             "drop raw_step/fused_vocab_topk")

    states_iota = jnp.arange(S, dtype=jnp.int32)

    # ---- first step: transitions from state 0 ----------------------------
    rng, k0 = jax.random.split(rng)
    if noise is not None:
        # precomputed z-noise (max_steps, B, S, K, z) — passed to the step
        # in place of PRNG keys (generation inside the scan is expensive)
        assert noise.shape[0] == max_steps, (
            f"noise must have max_steps={max_steps} rows, got {noise.shape[0]}")
        k0 = noise[0][:, :1, :1]
    lp0, state = step_fn(
        start_tokens[:, None, None],
        jax.tree_util.tree_map(lambda t: t[:, None, None], init_state), k0)
    if prehead_step:
        # first step is B rows — materializing (B, V) logits here is cheap
        logits0 = jax.lax.dot_general(
            lp0[:, 0, 0, :], embedding, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (B, V)
        lp0 = logits0 - jax.scipy.special.logsumexp(logits0, axis=-1,
                                                    keepdims=True)
    elif raw_step:
        logits0, logz0 = lp0
        lp0 = (logits0[:, 0, 0, :].astype(jnp.float32)
               - logz0[:, 0, 0, None])
    else:
        lp0 = lp0[:, 0, 0, :]                                 # (B, V)
    V = lp0.shape[-1]

    # additive scatter, NOT .set(): padding entries are (token 0, valid
    # False) and a REAL token-0 exception (e.g. a constraint wordform that
    # tokenized to @@UNKNOWN@@=0) lands on the same index — duplicate-index
    # .set() is nondeterministic about which write wins, .add() ORs them.
    exc_mask0 = jnp.zeros((B, V), jnp.int32).at[
        jnp.arange(B)[:, None], fsm.exc_token[:, 0, :]].add(
            fsm.exc_valid[:, 0, :].astype(jnp.int32)) > 0
    def0_lp, def0_cls = small_top_k(jnp.where(exc_mask0, -jnp.inf, lp0), K)  # (B, K)
    exc0_lp = jnp.where(fsm.exc_valid[:, 0, :],
                        jnp.take_along_axis(lp0, fsm.exc_token[:, 0, :], axis=-1),
                        -jnp.inf)                             # (B, E)

    d0 = fsm.default_dest[:, 0]                               # (B,)
    # per target state i: merge default beam (if d0==i) + exceptions→i
    def_part = jnp.where((d0[:, None] == states_iota[None, :])[:, :, None],
                         def0_lp[:, None, :], -jnp.inf)       # (B, S, K)
    exc_part = jnp.where(fsm.exc_dest[:, 0, None, :] == states_iota[None, :, None],
                         exc0_lp[:, None, :], -jnp.inf)       # (B, S, E)
    cand0 = jnp.concatenate([def_part, exc_part], axis=-1)    # (B, S, K+E)
    cand0_cls = jnp.concatenate([
        jnp.broadcast_to(def0_cls[:, None, :], (B, S, K)),
        jnp.broadcast_to(fsm.exc_token[:, 0, None, :], (B, S, E))], axis=-1)
    last_lp, idx0 = small_top_k(cand0, K)                     # (B, S, K)
    last_lp = last_lp.astype(jnp.float32)  # accumulate scores in f32
    last_preds = jnp.take_along_axis(cand0_cls, idx0, axis=-1)
    start_preds_flat = last_preds.reshape(B, S * K)

    state = jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t, (B, S, K) + t.shape[3:]), state)

    # Static per-state exception mask over the vocab (used every step).
    # Additive scatter for the same padding-vs-real-token-0 collision as
    # exc_mask0 above.
    exc_vocab_mask = jnp.zeros((B, S, V), jnp.int32).at[
        jnp.arange(B)[:, None, None],
        jnp.broadcast_to(states_iota[None, :, None], (B, S, E)),
        fsm.exc_token].add(fsm.exc_valid.astype(jnp.int32)) > 0

    step_keys = (jax.random.split(rng, max_steps - 1) if noise is None
                 else noise[1:])

    end_pattern = jnp.full((pnbs,), MASK_VAL).at[0].set(0.0)

    if raw_step:
        # Exception-token logits via a tiny one-hot einsum (MXU) instead of
        # a lane-dimension gather (slow on TPU). (B, S, E, V) is ~1 MB.
        # dtype follows the model so f32 models stay exact.
        exc_onehot = jax.nn.one_hot(fsm.exc_token, V, dtype=jnp.float32)
        exc_onehot = exc_onehot * fsm.exc_valid[..., None]
    if prehead_step:
        # exception-token embedding rows are step-constant: gather once,
        # per-step exception logits are then a tiny (K, E_exc) einsum
        exc_emb = (embedding[fsm.exc_token]
                   * fsm.exc_valid[..., None].astype(embedding.dtype))

    def _default_from_topk(tvals, tidx, logz):
        """Drop exception tokens from an unmasked top-(pnbs+E) and return
        the default-candidate (log-prob, class) pair — exact, since at most
        E exception tokens exist per state. Shared by the prehead and fused
        branches."""
        is_exc = jnp.any(
            (tidx[..., :, None] == fsm.exc_token[:, :, None, None, :])
            & fsm.exc_valid[:, :, None, None, :], axis=-1)
        def_l, pos = small_top_k(jnp.where(is_exc, MASK_VAL, tvals), pnbs)
        def_cls = jnp.take_along_axis(tidx, pos, axis=-1)
        return def_l - logz[..., None], def_cls

    def scan_step(carry, key):
        state, last_preds, last_lp = carry
        out, new_state = step_fn(last_preds, state, key)         # (B, S, K, V)
        if prehead_step:
            from style_seqcvae_tpu.ops.pallas.vocab_topk_lse import (
                matmul_top_k_with_lse)

            proj = out                              # (B, S, K, Ed)
            Ed = proj.shape[-1]
            k_tot = pnbs + E
            tvals, tidx, lse = matmul_top_k_with_lse(
                proj.reshape(B * S * K, Ed), embedding, k_tot,
                interpret=not on_tpu)
            tvals = tvals.reshape(B, S, K, k_tot)
            tidx = tidx.reshape(B, S, K, k_tot)
            logz = lse.reshape(B, S, K)
            def_lp, def_cls = _default_from_topk(tvals, tidx, logz)
            exc_l = jnp.einsum("bske,bsxe->bskx",
                               proj.astype(exc_emb.dtype), exc_emb,
                               preferred_element_type=jnp.float32)
            exc_lp = exc_l - logz[..., None]
            exc_lp = jnp.where(fsm.exc_valid[:, :, None, :], exc_lp, MASK_VAL)
        elif raw_step and fused:
            logits, _ = out          # step's logz unused here → DCE'd
            from style_seqcvae_tpu.ops.pallas.topk_lse import top_k_with_lse

            k_tot = pnbs + E
            tvals, tidx, lse = top_k_with_lse(
                logits.reshape(B * S * K, V), k_tot, interpret=not on_tpu)
            tvals = tvals.reshape(B, S, K, k_tot)
            tidx = tidx.reshape(B, S, K, k_tot)
            logz = lse.reshape(B, S, K)
            def_lp, def_cls = _default_from_topk(tvals, tidx, logz)
            exc_l = jnp.einsum("bskv,bsev->bske", logits,
                               exc_onehot.astype(logits.dtype),
                               preferred_element_type=jnp.float32)
            exc_lp = exc_l - logz[..., None]
            exc_lp = jnp.where(fsm.exc_valid[:, :, None, :], exc_lp, MASK_VAL)
        elif raw_step:
            logits, logz = out
            # ONE full-vocab top-k on RAW logits (same order as log-probs)…
            def_l, def_cls = small_top_k(
                jnp.where(exc_vocab_mask[:, :, None, :], MASK_VAL, logits), pnbs)
            def_lp = def_l.astype(jnp.float32) - logz[..., None]
            exc_l = jnp.einsum("bskv,bsev->bske", logits,
                               exc_onehot.astype(logits.dtype),
                               preferred_element_type=jnp.float32)
            exc_lp = exc_l - logz[..., None]
            exc_lp = jnp.where(fsm.exc_valid[:, :, None, :], exc_lp, MASK_VAL)
        else:
            cleaned = _cleaned_log_probs(out, last_preds, end_index)
            # ONE full-vocab top-k (default/non-exception tokens)…
            def_lp, def_cls = small_top_k(
                jnp.where(exc_vocab_mask[:, :, None, :], MASK_VAL, cleaned), pnbs)
            # …plus an O(E) gather of exception-token log-probs.
            exc_lp = jnp.take_along_axis(
                cleaned, jnp.broadcast_to(fsm.exc_token[:, :, None, :],
                                          (B, S, K, E)), axis=-1)
            exc_lp = jnp.where(fsm.exc_valid[:, :, None, :], exc_lp, MASK_VAL)

        if prehead_step or raw_step:
            # end freezing post-selection (shared by the three raw-logit
            # branches; the log-prob branch freezes pre-selection inside
            # _cleaned_log_probs): ended beams emit end with lp 0
            ended = (last_preds == end_index)[..., None]
            def_lp = jnp.where(ended, end_pattern, def_lp)
            def_cls = jnp.where(ended, end_index, def_cls)
            exc_lp = jnp.where(ended, MASK_VAL, exc_lp)

        # All remaining work runs on tiny (≤ K·(pnbs+E)) tensors — vectorize
        # over an explicit target-state axis S_to instead of a sequential
        # scan (the scan's per-state dispatch barriers dominated).
        tgt = states_iota                                            # (S_to,)
        dmask = fsm.default_dest[:, None, :] == tgt[None, :, None]   # (B,S_to,S_from)
        def_c = jnp.where(dmask[:, :, :, None, None], def_lp[:, None], MASK_VAL)
        emask = fsm.exc_dest[:, None, :, :] == tgt[None, :, None, None]
        exc_c = jnp.where(emask[:, :, :, None, :], exc_lp[:, None], MASK_VAL)
        cand = jnp.concatenate([def_c, exc_c], axis=-1)   # (B,S_to,S_from,K,pnbs+E)
        top_lp, top_idx = small_top_k(cand, pnbs)         # (B,S_to,S_from,K,pnbs)
        cand_cls = jnp.concatenate([
            jnp.broadcast_to(def_cls[:, None], (B, S) + def_cls.shape[1:]),
            jnp.broadcast_to(fsm.exc_token[:, None, :, None, :], (B, S, S, K, E))],
            axis=-1)
        top_cls = jnp.take_along_axis(cand_cls, top_idx, axis=-1)
        summed = top_lp.astype(jnp.float32) + last_lp[:, None, :, :, None]
        flat_lp = summed.reshape(B, S, S * K * pnbs)
        flat_cls = top_cls.reshape(B, S, S * K * pnbs)
        new_lp, idx = jax.lax.top_k(flat_lp, K)           # (B, S_to, K)
        new_preds = jnp.take_along_axis(flat_cls, idx, axis=2)
        backptr = (idx // pnbs).reshape(B, S * K)

        new_state = jax.tree_util.tree_map(
            lambda t: jnp.take_along_axis(
                t.reshape((B, S * K) + t.shape[3:]),
                backptr.reshape((B, S * K) + (1,) * (t.ndim - 3)), axis=1
            ).reshape((B, S, K) + t.shape[3:]),
            new_state)
        return (new_state, new_preds, new_lp), (new_preds.reshape(B, S * K), backptr)

    (_, _, final_lp), (preds_t, bp_t) = jax.lax.scan(
        scan_step, (state, last_preds, last_lp), step_keys)

    all_preds = jnp.concatenate([start_preds_flat[None], preds_t], axis=0)
    sequences = reconstruct_sequences(all_preds, bp_t)
    return sequences.reshape(B, S, K, max_steps), final_lp
