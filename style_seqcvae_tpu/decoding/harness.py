"""Diverse-decoding harness: N z-samples × (CBS | beam search) as ONE
compiled program.

The reference decodes each z-sample in a Python loop at batch size 1
(var_updown/scripts/inference.py:138-170); here the z-axis is ``vmap``-ed on
device and the per-image FSMs ride along as stacked exception tables. jit
caching is managed by padding FSM state/exception counts to a small set of
bucket sizes so repeated images reuse the compiled program.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.decoding.beam_search import beam_search
from style_seqcvae_tpu.decoding.cbs_fast import (
    FSMTables,
    constrained_beam_search_fast,
    stack_fsm_tables,
)
from style_seqcvae_tpu.decoding.select import select_best_beam_simple_jax
from style_seqcvae_tpu.models.captioner import (
    CaptionerConfig,
    make_decode_context,
)
from style_seqcvae_tpu.models.updown_cell import init_cell_state


def _bucket(n: int, buckets=(8, 12, 16, 24, 32)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def pad_tables_batch(tables_per_image: List[List[FSMTables]],
                     n_z: int) -> FSMTables:
    """Per-image per-z FSMTables → one (Z, B, S[, E]) stack. S and E pad to
    shared bucket sizes across the whole group (so repeated groups reuse the
    compiled program); images with fewer than n_z tables replicate their
    last one (shared-FSM mode)."""
    per_image = [list(ts) for ts in tables_per_image]
    for ts in per_image:
        while len(ts) < n_z:
            ts.append(ts[-1])
    flat = [t for ts in per_image for t in ts]
    S = _bucket(max(t.default_dest.shape[0] for t in flat))
    E = _bucket(max(t.exc_token.shape[-1] for t in flat))

    def pad(t: FSMTables) -> FSMTables:
        s, e = t.default_dest.shape[0], t.exc_token.shape[-1]
        dd = np.concatenate([np.asarray(t.default_dest),
                             np.arange(s, S, dtype=np.int32)])
        pw = [(0, S - s), (0, E - e)]
        return FSMTables(dd,
                         np.pad(np.asarray(t.exc_token), pw),
                         np.pad(np.asarray(t.exc_dest), pw),
                         np.pad(np.asarray(t.exc_valid), pw))

    padded = [[pad(t) for t in ts] for ts in per_image]
    out = []
    for f in FSMTables._fields:
        # (Z, B, ...): z-major so vmap over z sees a (B, ...) FSM per sample
        out.append(jnp.asarray(np.stack(
            [np.stack([np.asarray(getattr(padded[b][z], f))
                       for b in range(len(padded))])
             for z in range(n_z)])))
    return FSMTables(*out)


def pad_tables(tables: List[FSMTables], n_z: int) -> FSMTables:
    """Single-image form of :func:`pad_tables_batch` → (Z, 1, S[, E])."""
    return pad_tables_batch([tables], n_z)


class DecodeHarness:
    def __init__(self, params, cfg: CaptionerConfig, family: str = "cvae",
                 mesh=None):
        """family: "cvae" (Style-SeqCVAE, z-sampled) or "baseline" (the
        non-variational UpDown — deterministic, so every z-sample is
        identical; callers should pass n_z=1).

        ``mesh``: optional ``jax.sharding.Mesh`` — shards the
        (z × batch × states × beam) decode grid over the mesh's data axis
        (SURVEY.md §2.6; the reference's only inference scaling is
        DataParallel, var_updown/scripts/inference.py:108-109). Params are
        replicated; the z axis (or batch) is the DP split, so sharded and
        unsharded decodes produce identical captions."""
        assert family in ("cvae", "baseline")
        if mesh is not None:
            from style_seqcvae_tpu.parallel.mesh import replicate

            params = replicate(mesh, params)
        self.params = params
        self.cfg = cfg
        self.family = family
        self.mesh = mesh
        self._jit_cbs = jax.jit(self._decode_cbs_impl,
                                static_argnames=("n_z", "return_all"))
        self._jit_beam = jax.jit(self._decode_beam_impl, static_argnames=("n_z",))
        self._jit_sample = jax.jit(
            self._decode_sample_impl,
            static_argnames=("n_z", "method", "top_k", "top_p", "temperature"))

    def _shard_decode_inputs(self, n_z, feats, sentiment, obj_att_embeds,
                             tables=None, nc=None, key=None):
        """device_put decode inputs with grid sharding (no-op mesh=None)."""
        from jax.sharding import NamedSharding
        from style_seqcvae_tpu.parallel.mesh import decode_grid_specs

        B = feats.shape[0]
        z_spec, b_spec = decode_grid_specs(self.mesh, n_z, B)

        def put(x, spec):
            if x is None:
                return None
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        from jax.sharding import PartitionSpec as P

        feats = put(feats, b_spec)
        sentiment = put(sentiment, b_spec)
        obj_att_embeds = put(obj_att_embeds, b_spec)
        if tables is not None:
            tables = jax.tree_util.tree_map(lambda t: put(t, z_spec), tables)
        nc = put(nc, b_spec)
        key = put(key, P())
        return feats, sentiment, obj_att_embeds, tables, nc, key

    def _step_and_state(self, params, feats, sentiment, obj_att_embeds,
                        raw: bool = False):
        """(step_fn, init_state, start_tokens, raw_available) for the
        configured family. ``raw=True`` asks for the raw-logits contract
        (selection on raw scores + per-row logsumexp correction — skips the
        (G, V) log_softmax materialization); the cvae family serves it via
        the optimized step fn (folded constant LSTM gate segments)."""
        cfg = self.cfg
        B = feats.shape[0]
        start = jnp.full((B,), cfg.boundary_index)
        if self.family == "baseline":
            from style_seqcvae_tpu.models.baseline import (
                init_baseline_state, make_baseline_step_fn)

            step = make_baseline_step_fn(params, cfg, feats)
            return step, init_baseline_state((B,), cfg.hidden_size,
                                             feats.dtype), start, False
        from style_seqcvae_tpu.models.captioner import make_optimized_step_fn

        ctx = make_decode_context(params, cfg, feats, sentiment=sentiment,
                                  obj_att_embeds=obj_att_embeds)
        step = make_optimized_step_fn(params, cfg, ctx, return_raw=raw)
        return step, init_cell_state((B,), cfg.hidden_size, feats.dtype), \
            start, raw

    # ---------------- CBS path ----------------
    def _decode_cbs_impl(self, params, feats, sentiment, obj_att_embeds,
                         tables: FSMTables, num_constraints, key, *,
                         n_z: int, return_all: bool):
        cfg = self.cfg
        step, init_state, start, raw = self._step_and_state(
            params, feats, sentiment, obj_att_embeds, raw=True)

        def one_z(z_key, fsm_z):
            seqs, lp = constrained_beam_search_fast(
                step, start, init_state, fsm_z, z_key,
                max_steps=cfg.max_caption_length, beam_size=cfg.beam_size,
                per_node_beam_size=cfg.beam_size // 2,
                end_index=cfg.boundary_index, raw_step=raw)
            if return_all:
                return seqs, lp
            best, best_lp = select_best_beam_simple_jax(
                seqs, lp, num_constraints, cfg.min_constraints_to_satisfy)
            return best, best_lp

        keys = jax.random.split(key, n_z)
        return jax.vmap(one_z)(keys, tables)

    def decode_cbs(self, feats: np.ndarray, sentiment, obj_att_embeds,
                   tables, num_constraints, key, n_z: int,
                   return_all: bool = False, fetch: bool = True):
        """feats (B, N, F); ``tables`` is per-z ``List[FSMTables]`` (B=1) or
        per-image ``List[List[FSMTables]]``. Returns (n_z, B, T) token ids
        (or all (n_z, B, S, K, T) beams when ``return_all`` for grounded
        selection).

        ``fetch=False`` returns the still-on-device arrays without blocking
        — callers can pipeline the next dispatch behind the transfer (the
        inference CLI overlaps group N+1's decode with group N's
        host-side selection/detokenization)."""
        B = feats.shape[0]
        if tables and isinstance(tables[0], FSMTables):
            assert B == 1, "per-image FSM lists required for batched decode"
            stacked = pad_tables(list(tables), n_z)
        else:
            assert len(tables) == B
            stacked = pad_tables_batch(tables, n_z)
        nc = np.asarray(num_constraints).reshape(-1)
        nc = jnp.asarray(np.broadcast_to(nc[:1], (B,)) if nc.size < B
                         else nc[:B])
        oae = (jnp.asarray(obj_att_embeds)
               if obj_att_embeds is not None else None)
        feats = jnp.asarray(feats)
        sentiment = jnp.asarray(sentiment) if sentiment is not None else None
        if self.mesh is not None:
            feats, sentiment, oae, stacked, nc, key = \
                self._shard_decode_inputs(n_z, feats, sentiment, oae,
                                          stacked, nc, key)
        out = self._jit_cbs(self.params, feats, sentiment,
                            oae, stacked, nc, key, n_z=n_z, return_all=return_all)
        if not fetch:
            return out
        return jax.tree_util.tree_map(np.asarray, out)

    # ---------------- plain beam path ----------------
    def _decode_beam_impl(self, params, feats, sentiment, obj_att_embeds, key,
                          *, n_z: int):
        cfg = self.cfg
        step, init_state, start, _ = self._step_and_state(
            params, feats, sentiment, obj_att_embeds)

        def one_z(z_key):
            seqs, lp = beam_search(
                step, start, init_state, z_key,
                max_steps=cfg.max_caption_length,
                beam_size=cfg.beam_size,
                per_node_beam_size=cfg.beam_size // 2,
                end_index=cfg.boundary_index)
            return seqs[:, 0, :], lp[:, 0]

        keys = jax.random.split(key, n_z)
        return jax.vmap(one_z)(keys)

    # ---------------- stochastic sampler path ----------------
    def _decode_sample_impl(self, params, feats, sentiment, obj_att_embeds,
                            key, *, n_z: int, method: str, top_k: int,
                            top_p: float, temperature: float):
        cfg = self.cfg
        step, init_state, start, _ = self._step_and_state(
            params, feats, sentiment, obj_att_embeds)
        one_z = _sampler_decode_one_z(step, start, init_state, cfg, method,
                                      top_k, top_p, temperature)
        keys = jax.random.split(key, n_z)
        return jax.vmap(one_z)(keys)

    def decode_sample(self, feats, sentiment, obj_att_embeds, key, n_z: int,
                      method: str, top_k: int = 5, top_p: float = 0.9,
                      temperature: float = 1.0, fetch: bool = True):
        """Diverse decoding via the stochastic samplers
        (scripts/inference.py --sampler): ``method`` in
        {"multinomial", "topk", "topp", "gumbel"}. Returns (n_z, B, T)
        token ids. Deterministic for a fixed ``key``."""
        feats = jnp.asarray(feats)
        sentiment = jnp.asarray(sentiment) if sentiment is not None else None
        oae = (jnp.asarray(obj_att_embeds)
               if obj_att_embeds is not None else None)
        if self.mesh is not None:
            feats, sentiment, oae, _, _, key = self._shard_decode_inputs(
                n_z, feats, sentiment, oae, key=key)
        out = self._jit_sample(self.params, feats, sentiment, oae, key,
                               n_z=n_z, method=method, top_k=int(top_k),
                               top_p=float(top_p),
                               temperature=float(temperature))
        if not fetch:
            return out
        return np.asarray(out)

    def decode_beam(self, feats, sentiment, obj_att_embeds, key, n_z: int,
                    fetch: bool = True):
        feats = jnp.asarray(feats)
        sentiment = jnp.asarray(sentiment) if sentiment is not None else None
        oae = (jnp.asarray(obj_att_embeds)
               if obj_att_embeds is not None else None)
        if self.mesh is not None:
            feats, sentiment, oae, _, _, key = self._shard_decode_inputs(
                n_z, feats, sentiment, oae, key=key)
        out = self._jit_beam(self.params, feats, sentiment,
                             oae, key, n_z=n_z)
        if not fetch:
            return out
        return jax.tree_util.tree_map(np.asarray, out)


def _sampler_decode_one_z(step, start, init_state, cfg, method: str,
                          top_k: int, top_p: float, temperature: float):
    """Per-z decode fn for the stochastic samplers (the vendored AllenNLP
    sampler classes, var_updown/.../beam_search.py:88-295, reachable from
    the entry layer via scripts/inference.py --sampler)."""
    from style_seqcvae_tpu.decoding.samplers import (
        gumbel_beam_search, sample_decode)

    if method == "gumbel":
        def one_z(z_key):
            seqs, phi = gumbel_beam_search(
                step, start, init_state, z_key,
                max_steps=cfg.max_caption_length, beam_size=cfg.beam_size,
                end_index=cfg.boundary_index)
            return seqs[:, 0, :]          # highest perturbed-score sample
        return one_z

    tk = top_k if method == "topk" else 0
    tp = top_p if method == "topp" else 0.0

    def one_z(z_key):
        return sample_decode(
            step, start, init_state, z_key,
            max_steps=cfg.max_caption_length, end_index=cfg.boundary_index,
            temperature=temperature, top_k=tk, top_p=tp)

    return one_z


def detokenize(token_ids, vocabulary, boundary_index: int) -> str:
    """Token ids → caption string, truncated at @@BOUNDARY@@
    (inference.py:180-182)."""
    words = []
    for t in np.asarray(token_ids).tolist():
        if t == boundary_index:
            break
        words.append(vocabulary.get_token_from_index(int(t)))
    return " ".join(words)
