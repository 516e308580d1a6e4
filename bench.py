"""Benchmark suite: the five BASELINE.json configs plus a serving-latency
line, with FLOP/MFU accounting.

Emits one JSON line per config (streamed as each completes), each with the
measured value, an XLA-derived FLOP count per work item, MFU (fraction of
TPU v5e bf16 MXU peak), and an HBM-bandwidth utilization estimate. The
serving line's ``config`` field is the string "serving". The FLAGSHIP
metric — config 3, CBS beam=5 decode throughput (captions/sec/chip) — is
printed LAST so drivers that parse the final JSON line keep recording the
same headline metric as round 1.

Configs (BASELINE.json `configs`):
  1. UpDown LSTM greedy decode on 100 precomputed features (no CBS)
  2. Style-SeqCVAE training step, teacher-forced + Gaussian KL, bs=32
  3. CBS inference: FSM-constrained beam search (beam=5)  ← flagship
  4. Diverse sampling: 20 z-samples/image with mode-2 latent dictionaries
     (SentiGloVe-style obj_att_embeds prior) + oracle-CIDEr re-score
  5. End-to-end: Faster R-CNN res101 extraction → captioner CBS on raw images

Accounting notes:
  * FLOPs for the scan-based configs (1-4) are ANALYTIC matmul counts
    (2·rows·in·out per dot, formulas below), multiplied by the time-step
    trip count. XLA's `compiled.cost_analysis()` counts a while/scan body
    ONCE (verified: a 20-step scanned matmul reports the same flops as one
    matmul), so it understates scan programs ~20×; it is used only for the
    scan-free detector forward in config 5.
  * Backward pass ≈ 2× forward matmul flops (dX and dW per dot).
  * MFU uses the v5e bf16 MXU peak (197 TFLOP/s) for every config; f32
    programs (the train step) are therefore reported conservatively.
  * `weight_stream_gb` = parameter bytes re-read from HBM per dispatch
    (params × time-steps × passes): the roofline that actually binds the
    small-row decode configs.
  * The axon tunnel's `block_until_ready` does not block; every timing
    syncs by fetching a scalar checksum (see CLAUDE.md). Each dispatch
    also carries ~30 ms of tunnel latency (CLAUDE.md "microbenchmark
    rule") — device-only throughput is higher than reported here.

``vs_baseline`` is measured against the reference *algorithm* executed by
torch on this host's CPU (the CUDA reference hardware is unavailable — see
BASELINE.md / bench_baseline.py); anchors live in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

PEAK_FLOPS = 197e12      # TPU v5e bf16 MXU peak, FLOP/s
HBM_BW = 819e9           # TPU v5e HBM bandwidth, bytes/s

V, E, H, P, Z = 10500, 600, 900, 768, 150   # reference run dims
F, BOXES, SEQ = 2048, 100, 20


def _sync(x):
    """Force full execution over the axon tunnel (block_until_ready lies)."""
    import jax
    return float(jax.device_get(x))


def _cost(lowered_compiled):
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


# ---- analytic MXU matmul counts (scan bodies × trip count) ----------------

def _decode_step_flops(G, boxes, mode2=False):
    """One optimized decode step at grid rows G (= B·z·S·K for CBS):
    attn-LSTM dyn [h1,hd,h1]→4H, BUTD attention (query proj + additive
    logits + attend), decoder-LSTM dyn [att,h1,hd,(c),z,hd]→4H, tied output
    head. Matmul-only (elementwise/VPU work excluded)."""
    f = 2 * G * (3 * H) * (4 * H)                       # attn LSTM
    f += 2 * G * H * P                                   # w_query
    f += 2 * G * boxes * P                               # additive logits · w_attend
    f += 2 * G * boxes * F                               # attend einsum
    dec_in = F + 2 * H + Z + H                           # dyn + recurrent
    if mode2:
        f += 2 * G * boxes * Z                           # mode-2 prior attend
        dec_in += Z                                      # cond = prior_mean
    f += 2 * G * dec_in * (4 * H)                        # decoder LSTM
    f += 2 * G * H * E + 2 * G * E * V                   # tied output head
    return f


def _decode_context_flops(batch, boxes, vocab=V):
    """Per-dispatch precompute: image projection + whole-vocab token gate
    table + averaged-feature gates."""
    return (2 * batch * boxes * F * P
            + 2 * vocab * E * (4 * H)
            + 2 * batch * F * (4 * H))


def decode_flops(batch, n_z, n_states, beam, seq, boxes, mode2=False):
    G = batch * n_z * n_states * beam
    return seq * _decode_step_flops(G, boxes, mode2) + _decode_context_flops(batch, boxes)


def greedy_flops(batch, seq, boxes):
    return seq * _decode_step_flops(batch, boxes) + _decode_context_flops(batch, boxes)


def train_flops(batch, seq, boxes):
    """Teacher-forced step: full-width attn/enc/dec LSTMs + posterior heads
    + tied output head per step; backward ≈ 2× forward."""
    f = 2 * batch * (E + F + 2 * H + H) * (4 * H)        # attn LSTM (unfolded)
    f += 2 * batch * H * P + 2 * batch * boxes * P + 2 * batch * boxes * F
    f += 2 * batch * (1 + F + 2 * H + H) * (4 * H)       # encoder LSTM (mode 1)
    f += 2 * 2 * batch * H * Z                           # fc_mean + fc_log_var
    f += 2 * batch * (1 + F + 2 * H + Z + H) * (4 * H)   # decoder LSTM
    f += 2 * batch * H * E + 2 * batch * E * V           # tied output head
    fwd = seq * f + 2 * batch * boxes * F * P
    return 3 * fwd                                       # fwd + backward (2×)


def decode_weight_stream(seq, itemsize=2):
    """Bytes of weights participating in full matmuls per decode step × T:
    attn-LSTM dyn rows, decoder LSTM, attention query proj, output head
    (tied embedding streams as the E×V output matrix). Gather-only tables
    (token gate table, embedding rows) excluded — they read G rows, not the
    matrix."""
    n = (3 * H) * (4 * H) + (F + 2 * H + Z + H) * (4 * H)
    n += H * P + P
    n += H * E + E * V
    return seq * n * itemsize


def train_weight_stream(seq, itemsize=4):
    """fwd + 2 backward passes over the full attn/enc/dec/attention/fc/output
    weight set per step × T."""
    n = (E + F + 3 * H) * (4 * H) + (1 + F + 3 * H) * (4 * H)
    n += (1 + F + 3 * H + Z) * (4 * H)
    n += H * P + P + 2 * H * Z + H * E + E * V
    return 3 * seq * n * itemsize


def _cfg(**kw):
    from style_seqcvae_tpu.models.captioner import CaptionerConfig
    base = dict(vocab_size=V, image_feature_size=F, embedding_size=E,
                hidden_size=H, attention_projection_size=P, z_space=Z,
                sentiment_vae=1, simple_vae=False, max_caption_length=SEQ)
    base.update(kw)
    return CaptionerConfig(**base)


def _simple_fsm_tables(batch, n_z, n_states, vocab, rng):
    """Synthetic simple-CBS FSM: 3 single-word constraints × 2 wordforms —
    the structure the reference builds for cbs_simple (datasets.py:498-523)."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.decoding.cbs_fast import fsm_to_tables, stack_fsm_tables

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
    return jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t[None], (n_z,) + t.shape), tables_one)



def _jit_init(init_fn, cfg, dtype=None):
    """Fused single-program init (see utils/jit_init.py for why)."""
    import jax

    from style_seqcvae_tpu.utils.jit_init import jit_init

    return jit_init(init_fn, cfg, jax.random.PRNGKey(0), dtype=dtype)


def _host_feats(rng, shape, jdtype):
    """Random features staged host-side in float32 (f64→bf16 conversion of
    a 41 MB array measured 18.7 s; f32 transfer + device cast is ~1 s)."""
    import jax.numpy as jnp

    return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jdtype)


_DISPATCH_FLOOR = None


def measure_dispatch_floor(steps=6):
    """Per-dispatch tunnel latency: a trivial jitted op timed through the
    same scalar-fetch sync every bench uses. Subtracting it from a config's
    per-dispatch time gives the device-only number — the honest cross-round
    comparable (VERDICT r2 weak #8): a tunnel regression moves the floor,
    a device regression moves the difference."""
    global _DISPATCH_FLOOR
    if _DISPATCH_FLOOR is not None:
        return _DISPATCH_FLOOR
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    _sync(f(x))
    times = []
    for _ in range(steps):
        t0 = time.time()
        _sync(f(x))
        times.append(time.time() - t0)
    _DISPATCH_FLOOR = min(times)
    return _DISPATCH_FLOOR


def _time_dispatch(fn, args, checksum_index, steps=5, key_index=None):
    """Compile, then time ``steps`` dispatches; returns (best_s, compile_s)."""
    import jax
    t0 = time.time()
    out = fn(*args)
    _sync(out[checksum_index])
    compile_s = time.time() - t0
    times = []
    for i in range(steps):
        a = list(args)
        if key_index is not None:
            a[key_index] = jax.random.PRNGKey(100 + i)
        t0 = time.time()
        out = fn(*a)
        _sync(out[checksum_index])
        times.append(time.time() - t0)
    return min(times), compile_s


# --------------------------------------------------------------------------
# Config 1: greedy decode, 100 precomputed features, no CBS
# --------------------------------------------------------------------------

def build_greedy_decode(batch=100, dtype="bfloat16", chain=10):
    """Construct the config-1 greedy program + args (no timing). Split out
    so its warm-up (compile + first execution — the dispatch that pays the
    wildly variable remote executable-LOAD cost, BASELINE.md "remote load
    variance", 0.1-590 s observed for the same cached binary) can run on a
    background thread overlapped with configs 2-5 (VERDICT r3 weak #1).

    ``chain``: K independent greedy decodes (fresh key each) scanned inside
    ONE dispatch — a single batch-100 decode fits UNDER the ~30 ms tunnel
    floor, leaving ``device_value: null`` every round (VERDICT r4 weak #5);
    chaining puts the dispatch well above the floor so the device-only
    number is measurable (same recipe as config 2's chained train step)."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.decoding.beam_search import greedy_decode
    from style_seqcvae_tpu.models.captioner import (
        init_captioner, make_decode_context, make_optimized_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cfg = _cfg(beam_size=1, use_cbs=False)
    params = _jit_init(init_captioner, cfg, jdtype)
    rng = np.random.RandomState(0)
    feats = _host_feats(rng, (batch, BOXES, F), jdtype)
    sentiment = jnp.asarray(rng.choice([-1.0, 1.0], (batch, 1)).astype(np.float32))

    @jax.jit
    def decode(params, feats, sentiment, key):
        # context/step are scan-invariant (XLA LICM hoists the projection)
        ctx = make_decode_context(params, cfg, feats, sentiment=sentiment)
        step = make_optimized_step_fn(params, cfg, ctx)
        init_state = init_cell_state((batch,), cfg.hidden_size, jdtype)
        start = jnp.full((batch,), cfg.boundary_index)

        def body(checksum, k):
            toks = greedy_decode(step, start, init_state, k,
                                 max_steps=SEQ, end_index=cfg.boundary_index)
            return checksum + jnp.sum(toks), toks

        checksum, toks = jax.lax.scan(body, jnp.int32(0),
                                      jax.random.split(key, chain))
        return toks, checksum

    return decode, (params, feats, sentiment, jax.random.PRNGKey(1))


def bench_greedy(batch=100, dtype="bfloat16", steps=5, chain=10,
                 prewarmed=None):
    """``prewarmed``: dict from the overlapped warm-up thread —
    ``fn_args`` (compiled program + args) and ``warm_s`` (wall seconds the
    warm-up took, overlapped with the other configs, not serialized)."""
    import jax

    if prewarmed and "fn_args" in prewarmed:
        decode, args = prewarmed["fn_args"]
        times = []
        for i in range(steps):
            a = list(args)
            a[3] = jax.random.PRNGKey(100 + i)
            t0 = time.time()
            out = decode(*a)
            _sync(out[1])
            times.append(time.time() - t0)
        best, compile_s = min(times), prewarmed["warm_s"]
        extra = {"overlapped_warm_s": round(prewarmed["warm_s"], 1)}
    else:
        decode, args = build_greedy_decode(batch, dtype, chain)
        best, compile_s = _time_dispatch(decode, args, 1, steps, key_index=3)
        extra = {}
    return dict(metric="greedy_captions_per_sec_per_chip",
                value=round(batch * chain / best, 2), unit="captions/s",
                config=1, items=batch * chain, chained=chain,
                flops=greedy_flops(batch, SEQ, BOXES) * chain,
                bytes=decode_weight_stream(SEQ) * chain,
                seconds=best, compile_s=compile_s, **extra)


# --------------------------------------------------------------------------
# Config 2: training step, teacher-forced + KL, bs=32
# --------------------------------------------------------------------------

def bench_train_step(batch=32, steps=5):
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.models.captioner import init_captioner
    from style_seqcvae_tpu.training.trainer import (
        create_train_state, make_chained_train_step, make_train_step)

    cfg = _cfg()
    params = _jit_init(init_captioner, cfg)
    config = Config()
    state, tx = create_train_state(params, config, cfg, jax.random.PRNGKey(1))
    train_step = make_train_step(tx, cfg, config.MODEL.KLD_WEIGHT)

    rng = np.random.RandomState(0)
    batch_d = {
        "image_features": jnp.asarray(rng.randn(batch, BOXES, F).astype(np.float32)),
        "caption_tokens": jnp.asarray(
            rng.randint(2, V, (batch, SEQ)).astype(np.int32)),
        "sentiment": jnp.asarray(
            rng.choice([-1.0, 1.0], (batch, 1)).astype(np.float32)),
    }

    # donated state: rebuild per call, time includes the device step only
    t0 = time.time()
    state = train_step(state, batch_d)[0]
    _sync(state.opt_state.step)
    compile_s = time.time() - t0
    times = []
    for _ in range(steps):
        t0 = time.time()
        state, metrics = train_step(state, batch_d)
        _sync(metrics["loss"])
        times.append(time.time() - t0)
    best = min(times)

    # production cadence: K=10 optimizer steps per dispatch
    # (make_chained_train_step / train.py --steps-per-dispatch) amortizes
    # the ~30 ms tunnel floor across 10 steps
    K10 = 10
    chained = make_chained_train_step(tx, cfg, config.MODEL.KLD_WEIGHT)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K10,) + x.shape), batch_d)
    t0 = time.time()
    state, mk = chained(state, stacked)
    _sync(mk["loss"][-1])
    chain_compile_s = time.time() - t0
    ctimes = []
    for _ in range(steps):
        t0 = time.time()
        state, mk = chained(state, stacked)
        _sync(mk["loss"][-1])
        ctimes.append(time.time() - t0)
    cbest = min(ctimes) / K10

    # full production recipe: K=10 chained steps with bf16 compute + f32
    # master params (train.py --steps-per-dispatch 10 --bf16-compute)
    chained_bf16 = make_chained_train_step(tx, cfg, config.MODEL.KLD_WEIGHT,
                                           compute_dtype=jnp.bfloat16)
    state, mk = chained_bf16(state, stacked)
    _sync(mk["loss"][-1])
    btimes = []
    for _ in range(steps):
        t0 = time.time()
        state, mk = chained_bf16(state, stacked)
        _sync(mk["loss"][-1])
        btimes.append(time.time() - t0)
    bbest = min(btimes) / K10

    # `value` is the PRODUCTION recipe (chained K=10 + bf16-compute, the
    # train.py --steps-per-dispatch 10 --bf16-compute path users get;
    # VERDICT r3 weak #6) — per-step amortized. The raw single-dispatch f32
    # figure stays as a secondary field with its dispatch-floor caveat
    # (a bs=32 single dispatch mostly measures the ~30 ms tunnel floor).
    return dict(metric="train_step_captions_per_sec_per_chip",
                value=round(batch / bbest, 2), unit="captions/s",
                config=2, items=batch, flops=train_flops(batch, SEQ, BOXES),
                # the headlined recipe streams bf16 weights in fwd/bwd
                # (itemsize 2); the f32 master-param read for the per-step
                # cast adds ~1/6 more, ignored
                bytes=train_weight_stream(SEQ, itemsize=2),
                seconds=bbest, compile_s=compile_s,
                n_dispatches=1.0 / K10,
                recipe="chained10_bf16",
                single_dispatch_f32_value=round(batch / best, 2),
                single_dispatch_f32_seconds=round(best, 4),
                single_dispatch_note="tunnel-floor-bound; see dispatch_floor_ms",
                chained10_value=round(batch / cbest, 2),
                chained10_ms_per_step=round(1000 * cbest, 1),
                chained10_compile_s=round(chain_compile_s, 1),
                chained10_bf16_value=round(batch / bbest, 2),
                chained10_bf16_ms_per_step=round(1000 * bbest, 1))


# --------------------------------------------------------------------------
# Config 3 (FLAGSHIP): CBS beam=5 decode
# --------------------------------------------------------------------------

def build_cbs_decode(batch=16, n_z=20, n_states=8, beam=5, vocab=V,
                     boxes=BOXES, seq=SEQ, dtype="bfloat16", sentiment_vae=1,
                     obj_att_embeds=None, selection="raw"):
    """Construct the jitted CBS decode program + example args (no timing).

    ``selection``: "raw" (default XLA masked-argmax path), "fused"
    (post-matmul Pallas topk_lse — measured slower r2), or "prehead"
    (matmul-fused streaming kernel, ops/pallas/vocab_topk_lse.py)."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.decoding.cbs_fast import constrained_beam_search_fast
    from style_seqcvae_tpu.decoding.select import select_best_beam_simple_jax
    from style_seqcvae_tpu.models.captioner import (
        init_captioner, make_decode_context, make_optimized_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cfg = _cfg(vocab_size=vocab, max_caption_length=seq, beam_size=beam,
               use_cbs=True, sentiment_vae=sentiment_vae,
               simple_vae=False)
    params = _jit_init(init_captioner, cfg, jdtype)

    rng = np.random.RandomState(0)
    feats = _host_feats(rng, (batch, boxes, F), jdtype)
    sentiment = jnp.asarray(rng.choice([-1.0, 1.0], (batch, 1)).astype(np.float32))
    oae = None
    if obj_att_embeds is not None:
        oae = jnp.asarray(obj_att_embeds, jdtype)
    tables = _simple_fsm_tables(batch, n_z, n_states, vocab, rng)

    @jax.jit
    def decode_all(params, feats, sentiment, tables, key):
        ctx = make_decode_context(params, cfg, feats, sentiment=sentiment,
                                  obj_att_embeds=oae)
        prehead = selection == "prehead"
        step = make_optimized_step_fn(params, cfg, ctx,
                                      return_raw=not prehead,
                                      return_prehead=prehead)
        init_state = init_cell_state((batch,), cfg.hidden_size, jdtype)
        start = jnp.full((batch,), cfg.boundary_index)

        def one_z(z_key, fsm_z):
            seqs, lp = constrained_beam_search_fast(
                step, start, init_state, fsm_z, z_key,
                max_steps=seq, beam_size=beam, per_node_beam_size=beam // 2,
                end_index=cfg.boundary_index, raw_step=not prehead,
                prehead_step=prehead,
                embedding=params["embedding"] if prehead else None,
                fused_vocab_topk=(selection == "fused") or None)
            best, best_lp = select_best_beam_simple_jax(
                seqs, lp, jnp.full((batch,), 3), cfg.min_constraints_to_satisfy)
            return best, best_lp

        keys = jax.random.split(key, n_z)
        best, best_lp = jax.vmap(one_z)(keys, tables)
        # scalar checksum: fetching it forces full execution — necessary
        # because block_until_ready does not block on the axon tunnel.
        return best, best_lp, jnp.sum(best_lp.astype(jnp.float32))

    args = (params, feats, sentiment, tables, jax.random.PRNGKey(1))
    return decode_all, args


def bench_tpu_cbs(batch=16, n_z=20, n_states=8, beam=5, vocab=V, boxes=BOXES,
                  seq=SEQ, dtype="bfloat16", steps=5, sentiment_vae=1,
                  obj_att_embeds=None, metric="cbs_beam5_captions_per_sec_per_chip",
                  config_id=3, selection="raw"):
    decode_all, args = build_cbs_decode(
        batch=batch, n_z=n_z, n_states=n_states, beam=beam, vocab=vocab,
        boxes=boxes, seq=seq, dtype=dtype, sentiment_vae=sentiment_vae,
        obj_att_embeds=obj_att_embeds, selection=selection)
    best_t, compile_s = _time_dispatch(decode_all, args, 2, steps, key_index=4)
    rec = dict(metric=metric, value=round(batch * n_z / best_t, 2),
               unit="captions/s", config=config_id, items=batch * n_z,
               flops=decode_flops(batch, n_z, n_states, beam, seq, boxes,
                                  mode2=(sentiment_vae == 2)),
               bytes=decode_weight_stream(seq),
               seconds=best_t, compile_s=compile_s)
    rec["_decode_fn"] = (decode_all, args)
    return rec


# --------------------------------------------------------------------------
# Config 4: mode-2 latent-dictionary diverse sampling + oracle CIDEr
# --------------------------------------------------------------------------

def bench_diverse_oracle(batch=16, n_z=20, steps=3):
    """20 z-samples/image with the mode-2 per-step attention-weighted
    attribute-embedding prior (the SentiGloVe latent-dictionary path,
    updown_captioner.py:76-93,250-258), then the oracle-CIDEr re-score
    (eval.py:350-437) on host. Throughput includes the oracle scoring."""
    import jax

    from style_seqcvae_tpu.evaluation.metrics import Cider

    rng = np.random.RandomState(7)
    oae = rng.randn(batch, BOXES, Z).astype(np.float32)
    rec = bench_tpu_cbs(batch=batch, n_z=n_z, steps=steps, sentiment_vae=2,
                        obj_att_embeds=oae,
                        metric="diverse20z_oracle_captions_per_sec_per_chip",
                        config_id=4)
    decode_all, args = rec.pop("_decode_fn")

    def tok_str(row):
        return " ".join(f"w{t}" for t in row if t > 1) or "w0"

    # synthetic reference corpus: decodes under a DIFFERENT z-noise key, so
    # the oracle has genuinely distinct candidates vs references (a same-key
    # corpus would make z=0 a perfect self-match and the oracle degenerate);
    # the capability (per-image argmax over z, corpus re-score) is what is
    # being timed, not the corpus itself.
    ref_args = args[:-1] + (jax.random.PRNGKey(777),)
    out = decode_all(*ref_args)
    _sync(out[2])
    best = jax.tree_util.tree_map(np.asarray, out[0])   # (n_z, batch, T)
    gts = {i: [tok_str(best[0, i])] for i in range(batch)}

    cider = Cider()
    corpus = cider.make_corpus(gts)   # ref-side state shared across calls

    def score(seqs):
        per_z = []
        for k in range(n_z):
            res_k = {i: [tok_str(seqs[k, i])] for i in range(batch)}
            per_z.append(cider.compute_score(gts, res_k, corpus=corpus)[1])
        arr = np.stack(per_z, axis=1)                    # (imgs, samples)
        argmax = np.argmax(arr, axis=1)
        res_best = {i: [tok_str(seqs[argmax[i], i])] for i in range(batch)}
        return cider.compute_score(gts, res_best, corpus=corpus)[0]

    def round_args(i):
        return args[:-1] + (jax.random.PRNGKey(50 + i),)

    # two-stage software pipeline (same pattern the inference CLI uses,
    # scripts/inference.py): round i+1's decode is in flight on the device
    # while round i's oracle scores on the host — the host CIDEr loop no
    # longer serializes with device work.
    t0 = time.time()
    pending = decode_all(*round_args(0))
    oracle_cider = 0.0
    for i in range(steps):
        nxt = decode_all(*round_args(i + 1)) if i + 1 < steps else None
        _sync(pending[2])
        seqs = np.asarray(pending[0])
        oracle_cider = score(seqs)
        pending = nxt
    total = (time.time() - t0) / steps

    rec.update(value=round(batch * n_z / total, 2), seconds=total,
               oracle_cider=round(float(oracle_cider), 4),
               pipelined_host_scoring=True)
    return rec


# --------------------------------------------------------------------------
# Config 5: end-to-end raw images → detector extraction → CBS captions
# --------------------------------------------------------------------------

def bench_e2e(batch=16, n_z=20, beam=5, steps=3):
    """Device-resident pipeline (round 3): detector forward → on-device
    bbox decode → on-device per-class NMS + global cap → bf16 feature
    stack → CBS decode, in TWO chained dispatches with NO host round-trip
    of the (B, 300, 2048) pooled features (round 2 fetched ~40 MB through
    the tunnel and ran host NMS between the stages — 4.3 img/s; the
    stage-internal device analogues are parity-tested in
    test_extract.py::test_select_detections_device_matches_host)."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.models.detector.extract import (
        decode_boxes_jax, select_detections_device)
    from style_seqcvae_tpu.models.detector.faster_rcnn import (
        DetectorConfig, detector_forward_test, init_detector)
    from style_seqcvae_tpu.models.detector.rpn import RPNConfig

    _C = Config()
    D = _C.DET
    det_cfg = DetectorConfig(
        num_classes=81, num_att_classes=98, pooling_mode=D.POOLING_MODE,
        anchor_scales=tuple(D.ANCHOR_SCALES),
        anchor_ratios=tuple(D.ANCHOR_RATIOS),
        rpn=RPNConfig(anchor_scales=tuple(D.ANCHOR_SCALES)))
    det_params = _jit_init(init_detector, det_cfg)

    canvas_h, canvas_w = 608, 928
    rng = np.random.RandomState(0)
    images = rng.rand(batch, canvas_h, canvas_w, 3).astype(np.float32) * 255
    im_info = np.tile(np.asarray([[600.0, 900.0, 1.5]], np.float32), (batch, 1))

    @jax.jit
    def extract_feats(p, im, info):
        out = detector_forward_test(
            p, det_cfg, im, info, post_nms_top_n=D.TEST.RPN_POST_NMS_TOP_N,
            pre_nms_top_n=D.TEST.RPN_PRE_NMS_TOP_N,
            nms_thresh=D.TEST.RPN_NMS_THRESH)

        def one_image(rois, bbox_pred, cls_prob, pooled, inf):
            pred_boxes = decode_boxes_jax(
                rois[:, 1:5], bbox_pred, inf,
                D.TRAIN.BBOX_NORMALIZE_STDS, D.TRAIN.BBOX_NORMALIZE_MEANS,
                inf[2], det_cfg.num_classes)
            sel = select_detections_device(
                cls_prob, pred_boxes, pooled,
                thresh=0.05, nms_thresh=D.TEST.NMS,
                max_per_image=min(D.TEST.MAX_PER_IMAGE, BOXES))
            return sel["features"]

        feats = jax.vmap(one_image)(out["rois"], out["bbox_pred"],
                                    out["cls_prob"], out["pooled_feat"], info)
        pad = BOXES - feats.shape[1]
        if pad > 0:
            feats = jnp.concatenate(
                [feats, jnp.zeros((batch, pad, F), feats.dtype)], axis=1)
        return feats.astype(jnp.bfloat16)

    dev_images = jnp.asarray(images)
    dev_info = jnp.asarray(im_info)
    det_flops, det_hbm = _cost(
        extract_feats.lower(det_params, dev_images, dev_info).compile())

    # captioner at reference dims, CBS beam=5, bf16 (program only, no
    # throwaway timed dispatches)
    decode_all, cap_args = build_cbs_decode(batch=batch, n_z=n_z, beam=beam)
    cap_flops = decode_flops(batch, n_z, 8, beam, SEQ, BOXES)
    cap_bytes = decode_weight_stream(SEQ)
    cap_params, _, sentiment, tables, _ = cap_args

    def one_round(key):
        feats = extract_feats(det_params, dev_images, dev_info)
        # feats never leaves the device — the decode dispatch chains on it
        dec = decode_all(cap_params, feats, sentiment, tables, key)
        _sync(dec[2])

    t0 = time.time()
    one_round(jax.random.PRNGKey(1))
    compile_s = time.time() - t0
    times = []
    for i in range(steps):
        t0 = time.time()
        one_round(jax.random.PRNGKey(2 + i))
        times.append(time.time() - t0)
    best = min(times)
    return dict(metric="e2e_raw_image_images_per_sec_per_chip",
                value=round(batch / best, 2), unit="images/s",
                config=5, items=batch, n_dispatches=2,
                flops=det_flops + cap_flops, bytes=det_hbm + cap_bytes,
                seconds=best, compile_s=compile_s)


# --------------------------------------------------------------------------
# Serving latency: ONE raw image → 20 diverse CBS captions
# --------------------------------------------------------------------------

def bench_serving_latency(n_z=20, beam=5, steps=5):
    """Single-request serving path (the deployment story): one raw image
    through the fused detector→constraints→CBS program, plus the
    features-only decode for comparison. Reports per-request latency (ms),
    not throughput — batch=1, so the ~30 ms dispatch floor is part of the
    honest number.

    The legacy two-dispatch chain (separate bs=1 extract + decode programs)
    measures ~the same latency as the fused program (83-86 ms, both
    pipelined to one sync) but its extract program pays a wildly variable
    remote executable-load cost over the axon tunnel (15-430 s observed for
    the SAME persistent-cache hit; see BASELINE.md "remote load variance"),
    so it is only measured when SSC_BENCH_SERVING_CHAIN=1 is set."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.models.detector.extract import (
        decode_boxes_jax, select_detections_device)
    from style_seqcvae_tpu.models.detector.faster_rcnn import (
        DetectorConfig, detector_forward_test, init_detector)
    from style_seqcvae_tpu.models.detector.rpn import RPNConfig

    _C = Config()
    D = _C.DET
    det_cfg = DetectorConfig(
        num_classes=81, num_att_classes=98, pooling_mode=D.POOLING_MODE,
        anchor_scales=tuple(D.ANCHOR_SCALES),
        anchor_ratios=tuple(D.ANCHOR_RATIOS),
        rpn=RPNConfig(anchor_scales=tuple(D.ANCHOR_SCALES)))
    det_params = _jit_init(init_detector, det_cfg)

    canvas_h, canvas_w = 608, 928
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, canvas_h, canvas_w, 3).astype(np.float32) * 255)
    info = jnp.asarray(np.asarray([[600.0, 900.0, 1.5]], np.float32))

    decode_all, cap_args = build_cbs_decode(batch=1, n_z=n_z, beam=beam)
    cap_params, _, sentiment, tables, _ = cap_args

    # feats-only decode latency: synthetic features of the production shape
    # (decode latency is shape-, not value-, dependent)
    warm_feats = jnp.asarray(
        rng.rand(1, BOXES, F).astype(np.float32)).astype(jnp.bfloat16)
    feat_times = []
    dec = decode_all(cap_params, warm_feats, sentiment, tables,
                     jax.random.PRNGKey(19))
    _sync(dec[2])                                   # compile/load once
    for i in range(steps):
        t0 = time.time()
        dec = decode_all(cap_params, warm_feats, sentiment, tables,
                         jax.random.PRNGKey(20 + i))
        _sync(dec[2])
        feat_times.append(time.time() - t0)

    compile_s = 0.0
    e2e_times = []
    if os.environ.get("SSC_BENCH_SERVING_CHAIN"):
        @jax.jit
        def extract_one(p, im, inf):
            out = detector_forward_test(
                p, det_cfg, im, inf, post_nms_top_n=D.TEST.RPN_POST_NMS_TOP_N,
                pre_nms_top_n=D.TEST.RPN_PRE_NMS_TOP_N,
                nms_thresh=D.TEST.RPN_NMS_THRESH)
            pred_boxes = decode_boxes_jax(
                out["rois"][0][:, 1:5], out["bbox_pred"][0], inf[0],
                D.TRAIN.BBOX_NORMALIZE_STDS, D.TRAIN.BBOX_NORMALIZE_MEANS,
                inf[0][2], det_cfg.num_classes)
            sel = select_detections_device(
                out["cls_prob"][0], pred_boxes, out["pooled_feat"][0],
                thresh=0.05, nms_thresh=D.TEST.NMS,
                max_per_image=min(D.TEST.MAX_PER_IMAGE, BOXES))
            return sel["features"][None].astype(jnp.bfloat16)   # (1, 100, F)

        def serve(key):
            feats = extract_one(det_params, image, info)
            dec = decode_all(cap_params, feats, sentiment, tables, key)
            _sync(dec[2])

        t0 = time.time()
        serve(jax.random.PRNGKey(1))
        compile_s = time.time() - t0
        for i in range(steps):
            t0 = time.time()
            serve(jax.random.PRNGKey(2 + i))
            e2e_times.append(time.time() - t0)

    # Fused single-program path (round 3, style_seqcvae_tpu/serving.py):
    # detector → on-device constraint selection (device_fsm.py) → FSM
    # tables → CBS decode compiled as ONE program — one tunnel round-trip
    # per request instead of two, and live constraints from THIS image's
    # attribute detections instead of fixed tables.
    from style_seqcvae_tpu.decoding.device_fsm import AttributeWordformTable
    from style_seqcvae_tpu.serving import make_serve_fn

    A = det_cfg.num_att_classes
    wordform_table = AttributeWordformTable(
        tokens=rng.randint(2, V, (A, 5)).astype(np.int32),
        valid=np.ones((A, 5), bool),
        selectable=np.ones((A,), bool),
        canonical=np.arange(A, dtype=np.int32))
    cap_cfg = _cfg(beam_size=beam, use_cbs=True)
    serve_fused = make_serve_fn(
        det_cfg, cap_cfg, wordform_table, n_z=n_z, beam_size=beam,
        max_boxes=BOXES, det_thresh=0.05, det_nms_thresh=D.TEST.NMS,
        rpn_pre_nms_top_n=D.TEST.RPN_PRE_NMS_TOP_N,
        rpn_post_nms_top_n=D.TEST.RPN_POST_NMS_TOP_N,
        rpn_nms_thresh=D.TEST.RPN_NMS_THRESH,
        bbox_normalize_stds=D.TRAIN.BBOX_NORMALIZE_STDS,
        bbox_normalize_means=D.TRAIN.BBOX_NORMALIZE_MEANS)
    sent = jnp.ones((1, 1), jnp.float32)
    t0 = time.time()
    _sync(serve_fused(det_params, cap_params, image, info, sent,
                      jax.random.PRNGKey(1))[3])
    fused_compile_s = time.time() - t0
    # whole-program FLOP/byte accounting: the fused dispatch is dominated by
    # the detector forward at 608x928, so decode-only counts would understate
    # MFU by >10x. XLA cost analysis covers detector + selection + FSM +
    # decode (same methodology as config 5's extract program); the
    # lower().compile() below is a cache hit of the program just executed.
    fused_flops, fused_bytes = _cost(
        serve_fused.lower(det_params, cap_params, image, info, sent,
                          jax.random.PRNGKey(1)).compile())
    fused_times = []
    for i in range(steps):
        t0 = time.time()
        _sync(serve_fused(det_params, cap_params, image, info, sent,
                          jax.random.PRNGKey(40 + i))[3])
        fused_times.append(time.time() - t0)

    # request micro-batching curve (serve.py --batch-requests): the fused
    # program is batch-agnostic, so B requests share one dispatch — the
    # latency/throughput trade-off for B=2..8 (VERDICT r3 weak #3). Each B
    # is its own compiled shape (persistent-cached across runs) AND a
    # Pallas-bearing executable that re-pays the remote Mosaic load per
    # process (~30-100 s observed) — set SSC_BENCH_SERVING_BATCH=0 to skip
    # the curve when only the single-request latency matters.
    batch_curve = {}
    curve_bs = ((2, 4, 8)
                if os.environ.get("SSC_BENCH_SERVING_BATCH", "1") != "0"
                else ())
    for B in curve_bs:
        images_b = jnp.asarray(
            rng.rand(B, canvas_h, canvas_w, 3).astype(np.float32) * 255)
        info_b = jnp.asarray(np.tile([[600.0, 900.0, 1.5]], (B, 1)).astype(np.float32))
        sent_b = jnp.ones((B, 1), jnp.float32)
        t0 = time.time()
        _sync(serve_fused(det_params, cap_params, images_b, info_b, sent_b,
                          jax.random.PRNGKey(60))[3])
        batch_curve[f"batch{B}_compile_s"] = round(time.time() - t0, 1)
        bt = []
        for i in range(steps):
            t0 = time.time()
            _sync(serve_fused(det_params, cap_params, images_b, info_b,
                              sent_b, jax.random.PRNGKey(61 + i))[3])
            bt.append(time.time() - t0)
        batch_curve[f"batch{B}_latency_ms"] = round(1000 * min(bt), 1)
        batch_curve[f"batch{B}_per_image_ms"] = round(1000 * min(bt) / B, 1)
        batch_curve[f"batch{B}_rps"] = round(B / min(bt), 1)

    out = dict(metric="serving_latency_ms_one_image_20_captions",
               value=round(1000 * min(fused_times), 1), unit="ms",
               baseline_note="no reference analogue: the reference's "
                             "serving path is 3 processes + 2 file handoffs "
                             "(trainval/test_net h5 -> inference.py JSON), "
                             "never a live request path",
               config="serving", items=1,
               flops=fused_flops,
               bytes=fused_bytes,
               seconds=min(fused_times),
               compile_s=compile_s + fused_compile_s,
               fused_compile_s=round(fused_compile_s, 1),
               n_dispatches=1,
               feats_only_latency_ms=round(1000 * min(feat_times), 1),
               **batch_curve)
    if e2e_times:
        out["two_dispatch_latency_ms"] = round(1000 * min(e2e_times), 1)
        out["chain_compile_s"] = round(compile_s, 1)
    return out


# --------------------------------------------------------------------------

def _finalize(rec, baselines):
    flops, b = rec.pop("flops"), rec.pop("bytes")
    secs = rec.pop("seconds")
    items = rec.pop("items")
    rec["flops_per_item"] = round(flops / max(items, 1))
    rec["mfu_pct"] = round(100.0 * flops / secs / PEAK_FLOPS, 2)
    rec["weight_stream_pct"] = round(100.0 * b / secs / HBM_BW, 1)
    rec["compile_s"] = round(rec["compile_s"], 1)
    # device-only throughput: per-dispatch time minus the measured tunnel
    # dispatch floor × the config's dispatch count (VERDICT r2 item 10).
    # Skipped when the config's wall time pipelines host work with device
    # dispatches (config 4) — subtracting a floor from a host-bound number
    # would fake a device figure.
    if not rec.pop("pipelined_host_scoring", False):
        try:
            floor = measure_dispatch_floor()
            n_disp = rec.pop("n_dispatches", 1)
            dev_secs = secs - n_disp * floor
            rec["dispatch_floor_ms"] = round(1000.0 * floor, 1)
            if dev_secs <= 0:
                # the whole dispatch fits under the measured tunnel floor —
                # device time is unresolvable from this client (floor
                # variance > device time); a clamped division would print
                # a nonsense 1e11 "throughput"
                rec["device_value"] = None
                rec["device_note"] = "dispatch under tunnel floor"
            else:
                rec["device_seconds"] = round(dev_secs, 4)
                # device_value shadows `value` in the SAME unit so
                # cross-round value-vs-device_value diffs isolate tunnel
                # regressions: a latency metric (unit ms) gets device-only
                # latency, throughput metrics get items/device-second.
                if rec.get("unit") == "ms":
                    rec["device_value"] = round(1000.0 * dev_secs, 1)
                else:
                    rec["device_value"] = round(items / dev_secs, 2)
        except Exception:
            pass
    anchor = baselines.get(rec["metric"])
    rec["vs_baseline"] = round(rec["value"] / anchor, 2) if anchor else None
    return rec


def main():
    import jax

    # Persistent compile cache: the full decode program can take minutes to
    # compile cold; cache makes driver re-runs cheap. The GC pass keeps it
    # bounded across rounds (environment-side key drift re-stores duplicate
    # 24-28 MB entries; BASELINE.md round-3 notes) — report on stderr so
    # stdout stays pure JSON lines.
    import sys

    from style_seqcvae_tpu.utils.cache import (
        enable_compile_cache, prune_compile_cache)
    enable_compile_cache()
    if jax.default_backend() != "cpu":   # CPU = test drive, leave the repo cache alone
        gc = prune_compile_cache()
        if gc["dropped"]:
            print(f"compile-cache GC: dropped {len(gc['dropped'])} entries "
                  f"({gc['dropped_bytes'] / 1e6:.0f} MB), kept "
                  f"{gc['kept_bytes'] / 1e6:.0f} MB", file=sys.stderr)

    baselines = {}
    try:
        with open("BASELINE_MEASURED.json") as f:
            m = json.load(f)
        baselines = {
            "cbs_beam5_captions_per_sec_per_chip": m.get("reference_captions_per_sec"),
            "greedy_captions_per_sec_per_chip": m.get("reference_greedy_captions_per_sec"),
            "train_step_captions_per_sec_per_chip": m.get("reference_train_captions_per_sec"),
            "diverse20z_oracle_captions_per_sec_per_chip": m.get(
                "reference_mode2_oracle_captions_per_sec"),
            "e2e_raw_image_images_per_sec_per_chip": m.get(
                "reference_e2e_images_per_sec"),
        }
    except Exception:
        pass

    # Config-1's first execution pays a wildly variable remote
    # executable-LOAD cost (0.1-590 s for the SAME cached binary; VERDICT
    # r3 weak #1). Warm it on a background thread while configs 2-5 run, so
    # total bench wall ≈ max(load stall, other configs); the timed config-1
    # dispatches run AFTER the other configs (exclusive chip access), and
    # its compile_s reports the overlapped warm-up wall honestly.
    import threading

    prewarm: dict = {}

    def _warm_greedy():
        t0 = time.time()
        try:
            fn, args = build_greedy_decode()
            out = fn(*args)
            _sync(out[1])
            prewarm["fn_args"] = (fn, args)
        except Exception as e:
            prewarm["error"] = e
        prewarm["warm_s"] = time.time() - t0

    warm_thread = threading.Thread(target=_warm_greedy, daemon=True)
    warm_thread.start()

    # each line prints (flushed) the moment its config finishes, so a stall
    # in a later config (environment-side first-exec variance, BASELINE.md)
    # cannot lose the already-measured lines; flagship still prints LAST —
    # drivers parse the final JSON line.
    for fn in (bench_train_step, bench_diverse_oracle,
               bench_e2e, bench_serving_latency):
        warm_alive = warm_thread.is_alive()
        try:
            rec = fn()
            rec.pop("_decode_fn", None)
            rec = _finalize(rec, baselines)
        except Exception as e:  # a secondary config must never kill the flagship line
            rec = {"metric": fn.__name__, "error": repr(e)[:300]}
        if warm_alive or warm_thread.is_alive():
            # measured while config-1's warm-up thread shared the chip and
            # tunnel — the number can be deflated by that self-inflicted
            # contention (ADVICE r4); honest flag instead of a silent skew
            rec["warmup_contention"] = True
        print(json.dumps(rec), flush=True)

    # Bounded join: a stalled remote load (documented up to ~10 min; backend
    # hangs up to ~23 min) must not hold the flagship line hostage — after
    # the timeout config-1 reports the stall as an error and the bench moves
    # on. A warm-up EXCEPTION is reported, then bench_greedy rebuilds fresh.
    warm_thread.join(timeout=900)
    if warm_thread.is_alive():
        rec = {"metric": "greedy_captions_per_sec_per_chip", "value": None,
               "unit": "captions/s", "config": 1,
               "error": "config-1 warm-up still stalled after 900 s "
                        "(environment-side executable-load variance)"}
    else:
        if "error" in prewarm:
            print(f"config-1 overlapped warm-up failed "
                  f"({prewarm['error']!r}); rebuilding serially",
                  file=sys.stderr)
        try:
            rec = _finalize(bench_greedy(prewarmed=prewarm), baselines)
            if "error" in prewarm:
                rec["warm_error"] = repr(prewarm["error"])[:200]
        except Exception as e:
            rec = {"metric": "bench_greedy", "error": repr(e)[:300]}
    print(json.dumps(rec), flush=True)
    # The flagship prints LAST and drivers parse the final JSON line, so a
    # flagship failure must still leave a flagship-metric line (not let the
    # serving-latency line masquerade as the headline) and exit non-zero.
    try:
        rec = bench_tpu_cbs()
        rec.pop("_decode_fn", None)
        rec = _finalize(rec, baselines)
        if warm_thread.is_alive():   # join timed out but the load resolved late
            rec["warmup_contention"] = True
        print(json.dumps(rec), flush=True)
        # end-of-run GC: drift duplicates RE-STORED during this run (the
        # environment-side key drift can land mid-run) must not survive
        # into a committed cache snapshot
        if jax.default_backend() != "cpu":
            gc = prune_compile_cache()
            if gc["dropped"]:
                print(f"compile-cache GC (post-run): dropped "
                      f"{len(gc['dropped'])} entries "
                      f"({gc['dropped_bytes'] / 1e6:.0f} MB)", file=sys.stderr)
    except Exception as e:
        print(json.dumps({"metric": "cbs_beam5_captions_per_sec_per_chip",
                          "value": None, "unit": "captions/s", "config": 3,
                          "error": repr(e)[:300], "vs_baseline": None}),
              flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
