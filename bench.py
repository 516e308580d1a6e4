"""Flagship benchmark: CBS beam=5 decode throughput (captions/sec/chip).

Primary metric per BASELINE.json: constrained-beam-search decoding with the
Style-SeqCVAE captioner at the reference run shape (E=600, H=900, z=150,
beam=5, 20 z-samples/image, simple-CBS FSM with 3 constraints → 8 states).

The whole decode grid (images × z-samples × FSM-states × beam) runs as one
compiled program on one chip; the reference processes it as
bs=1 × sequential-z Python loops (var_updown/scripts/inference.py:138).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference *algorithm* executed by
torch on this host's CPU (the CUDA reference hardware is unavailable —
see BASELINE.md); it is reported for tracking, the honest cross-hardware
anchor is the recorded absolute captions/sec/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_tpu_cbs(batch=16, n_z=20, n_states=8, beam=5, vocab=10500, boxes=100,
                  seq=20, dtype="bfloat16", steps=5):
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.decoding.cbs_fast import (
        constrained_beam_search_fast, fsm_to_tables, stack_fsm_tables)
    from style_seqcvae_tpu.decoding.select import select_best_beam_simple_jax
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context,
        make_optimized_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cfg = CaptionerConfig(
        vocab_size=vocab, image_feature_size=2048, embedding_size=600,
        hidden_size=900, attention_projection_size=768, z_space=150,
        sentiment_vae=1, simple_vae=False, max_caption_length=seq,
        beam_size=beam, use_cbs=True)
    params = init_captioner(jax.random.PRNGKey(0), cfg, dtype=jdtype)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, boxes, 2048), jdtype)
    sentiment = jnp.asarray(rng.choice([-1.0, 1.0], (batch, 1)).astype(np.float32))

    # Synthetic simple-CBS FSM: 8 main states, 3 single-word constraints with
    # 2 wordforms each — the exact structure the reference builds for
    # cbs_simple (datasets.py:498-523). One FSM per (image, z-sample).
    fsm = np.zeros((n_states, n_states, vocab), np.uint8)
    for s in range(n_states):
        fsm[s, s, :] = 1
    toks = rng.randint(2, vocab, (3, 2))
    for c in range(3):
        stride = 2 ** c
        for s in range(n_states):
            if not (s & stride) and (s | stride) < n_states:
                for t in toks[c]:
                    fsm[s, s | stride, t] = 1
                    fsm[s, s, t] = 0
    tables_one = stack_fsm_tables([fsm_to_tables(fsm)] * batch)
    # one FSM per (z-sample, image): leading z axis for vmap
    tables = jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t[None], (n_z,) + t.shape), tables_one)

    @jax.jit
    def decode_all(params, feats, sentiment, tables, key):
        ctx = make_decode_context(params, cfg, feats, sentiment=sentiment)
        step = make_optimized_step_fn(params, cfg, ctx, return_raw=True)
        init_state = init_cell_state((batch,), cfg.hidden_size, jdtype)
        start = jnp.full((batch,), cfg.boundary_index)

        def one_z(z_key, fsm_z):
            seqs, lp = constrained_beam_search_fast(
                step, start, init_state, fsm_z, z_key,
                max_steps=seq, beam_size=beam, per_node_beam_size=beam // 2,
                end_index=cfg.boundary_index, raw_step=True)
            best, best_lp = select_best_beam_simple_jax(
                seqs, lp, jnp.full((batch,), 3), cfg.min_constraints_to_satisfy)
            return best, best_lp

        keys = jax.random.split(key, n_z)
        best, best_lp = jax.vmap(one_z)(keys, tables)
        # scalar checksum: fetching it forces full execution — necessary
        # because block_until_ready does not block on the axon tunnel.
        return best, best_lp, jnp.sum(best_lp.astype(jnp.float32))

    # compile
    t0 = time.time()
    out = decode_all(params, feats, sentiment, tables, jax.random.PRNGKey(1))
    float(jax.device_get(out[2]))
    compile_time = time.time() - t0

    times = []
    for i in range(steps):
        t0 = time.time()
        out = decode_all(params, feats, sentiment, tables, jax.random.PRNGKey(2 + i))
        float(jax.device_get(out[2]))
        times.append(time.time() - t0)
    best_t = min(times)
    captions = batch * n_z
    return captions / best_t, compile_time, best_t


def main():
    import jax

    # Persistent compile cache: the full decode program can take minutes to
    # compile cold; cache makes driver re-runs cheap.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    caps_per_sec, compile_time, step_time = bench_tpu_cbs()

    # Baseline anchor measured once on this host (see BASELINE.md); the
    # reference algorithm in torch-CPU delivers ~this many captions/sec at
    # the same shape. Falls back to None-safe 0 if unmeasured.
    baseline = None
    try:
        with open("BASELINE_MEASURED.json") as f:
            baseline = json.load(f).get("reference_captions_per_sec")
    except Exception:
        pass

    result = {
        "metric": "cbs_beam5_captions_per_sec_per_chip",
        "value": round(caps_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps_per_sec / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
