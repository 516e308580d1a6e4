#!/usr/bin/env python
"""Caption inference with diverse z-sampling — CLI mirror of
var_updown/scripts/inference.py:53-191.

For every evaluation image: N_Z_SAMPLES decodes (vectorized on device, not a
Python loop), optional Constrained Beam Search with one FSM per z-sample,
best-beam selection with constraint satisfaction, detokenization truncated
at @@BOUNDARY@@, predictions JSON ``[{"image_id", "caption"}…]`` in the same
image-major / z-minor order the evaluator expects.
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--config", required=True)
parser.add_argument("--config-override", nargs="*", default=[])
parser.add_argument("--checkpoint-path", default="")
parser.add_argument("--checkpoint-name", default="checkpoint_best")
parser.add_argument("--output-path", required=True)
parser.add_argument("--in-memory", action="store_true")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--max-images", type=int, default=0)
parser.add_argument("--model", choices=["cvae", "baseline"], default="cvae",
                    help="cvae = Style-SeqCVAE (var_updown); baseline = "
                         "non-variational UpDown (updown-baseline)")
parser.add_argument("--batch-images", type=int, default=1,
                    help="images per device dispatch (the reference decodes "
                         "strictly one at a time, inference.py:95; batching "
                         "amortizes dispatch latency and fills the MXU)")
parser.add_argument("--num-data", type=int, default=1,
                    help="shard the (z x batch x states x beam) decode grid "
                         "over the first N devices of a data mesh (the "
                         "multi-chip replacement for the reference's "
                         "DataParallel inference, inference.py:108-109); "
                         "captions are identical to the unsharded decode")
parser.add_argument("--sampler", default="",
                    choices=["", "multinomial", "topk", "topp", "gumbel"],
                    help="decode with a stochastic sampler instead of "
                         "beam/CBS (the vendored AllenNLP sampler classes, "
                         "var_updown beam_search.py:88-295): multinomial = "
                         "ancestral sampling, topk/topp = filtered sampling, "
                         "gumbel = stochastic beam search (Kool et al. 2019, "
                         "samples without replacement). CBS constraints are "
                         "ignored under --sampler, matching the reference "
                         "where samplers exist only in the plain BeamSearch "
                         "path. Deterministic for a fixed RANDOM_SEED")
parser.add_argument("--sampler-k", type=int, default=5,
                    help="k for --sampler topk")
parser.add_argument("--sampler-p", type=float, default=0.9,
                    help="p for --sampler topp")
parser.add_argument("--sampler-temperature", type=float, default=1.0,
                    help="softmax temperature for multinomial/topk/topp")
parser.add_argument("--bf16", action="store_true",
                    help="decode with bfloat16 params/activations (f32 score "
                         "accumulators) — ~1.3-1.7x on TPU; log-prob deltas "
                         "vs f32 are ~1e-3")


def main():
    _A = parser.parse_args()
    import jax

    if _A.cpu:
        jax.config.update("jax_platforms", "cpu")
    from style_seqcvae_tpu.parallel.multihost import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()  # no-op unless SSC_MULTIHOST/SSC_COORDINATOR
    from style_seqcvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.data.datasets import (
        EvaluationDataset, EvaluationDatasetWithConstraints)
    from style_seqcvae_tpu.data.latents import LatentDictionary
    from style_seqcvae_tpu.data.vocabulary import (
        Vocabulary, add_constraint_words_to_vocabulary)
    from style_seqcvae_tpu.decoding.harness import DecodeHarness, detokenize
    from style_seqcvae_tpu.decoding.select import select_best_beam_with_constraints
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, hashed_random_embeddings, init_captioner)
    from style_seqcvae_tpu.training.checkpointing import CheckpointManager
    from style_seqcvae_tpu.training.trainer import create_train_state

    _C = Config(_A.config, _A.config_override)
    random.seed(_C.RANDOM_SEED)
    np.random.seed(_C.RANDOM_SEED)

    vocabulary = Vocabulary.from_files(_C.DATA.VOCABULARY)
    if _C.DATA.CBS.WORDFORMS:
        add_constraint_words_to_vocabulary(vocabulary, _C.DATA.CBS.WORDFORMS)
    if _C.DATA.CBS.WORDFORMS_ATTRIBS:
        add_constraint_words_to_vocabulary(vocabulary, _C.DATA.CBS.WORDFORMS_ATTRIBS)

    if _C.MODEL.USE_CBS:
        dataset = EvaluationDatasetWithConstraints.from_config(
            _C, vocabulary=vocabulary, in_memory=_A.in_memory)
    else:
        dataset = EvaluationDataset.from_config(_C, in_memory=_A.in_memory)

    model_cfg = CaptionerConfig.from_config(_C, vocabulary)
    tokens = [vocabulary.get_token_from_index(i)
              for i in range(vocabulary.get_vocab_size())]
    emb = (hashed_random_embeddings(tokens, model_cfg.embedding_size,
                                    model_cfg.pad_index)
           if model_cfg.tie_embeddings else None)
    from style_seqcvae_tpu.utils.jit_init import jit_init

    if _A.model == "baseline":
        from style_seqcvae_tpu.models.baseline import init_baseline

        params = jit_init(init_baseline, model_cfg,
                          jax.random.PRNGKey(_C.RANDOM_SEED), emb)
    else:
        params = jit_init(init_captioner, model_cfg,
                          jax.random.PRNGKey(_C.RANDOM_SEED), emb)

    if _A.checkpoint_path:
        ckpt = CheckpointManager(_A.checkpoint_path)
        state, _ = create_train_state(params, _C, model_cfg,
                                      jax.random.PRNGKey(0))
        state = ckpt.restore(_A.checkpoint_name, state)
        params = state.params

    latent_dict = None
    if model_cfg.sentiment_vae == 2:
        if model_cfg.latent_embedding == "glove" and _C.DATA.SENTIGLOVE:
            latent_dict = LatentDictionary.from_sentiglove(
                _C.DATA.SENTIGLOVE, model_cfg.z_space,
                model_cfg.latent_embedding_multip)
        elif model_cfg.latent_embedding == "senti_word_net" and _C.DATA.SWN_SCORES:
            latent_dict = LatentDictionary.from_swn_scores(
                _C.DATA.SWN_SCORES, model_cfg.z_space,
                model_cfg.latent_embedding_multip)

    if _A.bf16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    mesh = None
    if _A.num_data > 1:
        from style_seqcvae_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if len(devices) < _A.num_data:
            raise SystemExit(
                f"--num-data {_A.num_data} needs {_A.num_data} devices, "
                f"found {len(devices)} ({jax.default_backend()})")
        mesh = make_mesh(num_data=_A.num_data, num_model=1,
                         devices=devices[:_A.num_data])
    harness = DecodeHarness(params, model_cfg, family=_A.model, mesh=mesh)
    sampler_spec = None
    if _A.sampler:
        sampler_spec = dict(method=_A.sampler, top_k=_A.sampler_k,
                            top_p=_A.sampler_p,
                            temperature=_A.sampler_temperature)
        if _C.MODEL.USE_CBS:
            print("--sampler: CBS constraints ignored (the reference's "
                  "samplers exist only in the plain BeamSearch path, "
                  "beam_search.py:88-295)")
    # the baseline is deterministic — z-samples would all be identical
    # (unless a stochastic sampler diversifies the token draws)
    n_z = (max(_C.MODEL.N_Z_SAMPLES, 1)
           if (_A.model != "baseline" or _A.sampler) else 1)
    key = jax.random.PRNGKey(_C.RANDOM_SEED + 7)

    predictions = []
    n_fallbacks = 0
    n_images = len(dataset) if not _A.max_images else min(_A.max_images, len(dataset))
    group_size = max(_A.batch_images, 1)

    def prepare(idx):
        item = dataset[idx]
        batch = dataset.collate_fn([item])
        obj_att_embeds = None
        if latent_dict is not None:
            # images WITHOUT attribute detections still get a (zeros)
            # embedding tensor so group staging can concatenate across a
            # mixed group (zeros = zero prior mean, the reference's
            # behavior for detection-less images)
            obj_att_embeds = latent_dict.translate_obj_atts(
                batch.get("obj_atts") or [[]], _C.DATA.MAX_BOXES)
        return batch, obj_att_embeds

    def decode_single(batch, obj_att_embeds, k):
        """Per-image decode with the reference's counted fallback
        (inference.py:160-170): unconstrained beam when CBS fails."""
        nonlocal n_fallbacks
        feats = batch["image_features"]
        sentiment = batch["sentiment"]
        oae = jnp.asarray(obj_att_embeds) if obj_att_embeds is not None else None
        try:
            return _decode_one(_C, model_cfg, harness, batch, feats,
                               sentiment, oae, k, n_z, sampler=sampler_spec)
        except Exception as e:
            what = ("sampler decode" if sampler_spec is not None else "CBS")
            print(f"image {int(batch['image_id'][0])}: {what} failed ({e}); "
                  "falling back to unconstrained beam search")
            n_fallbacks += 1
            seqs, _ = harness.decode_beam(feats, sentiment, oae, k, n_z)
            return seqs[:, 0, :]

    def emit(batch, captions_tok):
        image_id = int(batch["image_id"][0])
        for z in range(n_z):
            predictions.append({
                "image_id": image_id,
                "caption": detokenize(captions_tok[z], vocabulary,
                                      model_cfg.boundary_index),
            })

    decode_dtype = jnp.bfloat16 if _A.bf16 else jnp.float32

    def group_stream():
        """Host collation + device staging of the NEXT group runs on a
        producer thread, overlapping the current group's decode (the
        host→device feature transfer otherwise serializes with compute)."""
        for start in range(0, n_images, group_size):
            idxs = range(start, min(start + group_size, n_images))
            prepared = [prepare(i) for i in idxs]
            staged = None
            if len(prepared) > 1:
                feats = np.concatenate([b["image_features"]
                                        for b, _ in prepared])
                sents = [b["sentiment"] for b, _ in prepared]
                oaes = [o for _, o in prepared]
                staged = {
                    "feats": jax.device_put(jnp.asarray(feats, decode_dtype)),
                    "sentiment": (jax.device_put(jnp.asarray(np.concatenate(sents)))
                                  if sents[0] is not None else None),
                    "oae": (jax.device_put(jnp.asarray(np.concatenate(oaes)))
                            if oaes[0] is not None else None),
                }
            yield start, prepared, staged

    from style_seqcvae_tpu.data.prefetch import prefetch

    def collect_and_emit(pending):
        """Fetch a dispatched group's device results, select + emit; on any
        (possibly deferred-from-dispatch) failure, retry per image."""
        nonlocal key
        p_start, p_prepared, kind_out = pending
        try:
            per_image = _collect_group(_C, model_cfg, kind_out, p_prepared, n_z)
            for (batch, _), toks in zip(p_prepared, per_image):
                emit(batch, toks)
        except Exception as e:
            print(f"group decode failed ({e}); retrying per image")
            for batch, oae in p_prepared:
                key, k2 = jax.random.split(key)
                emit(batch, decode_single(batch, oae, k2))
        done_n = min(p_start + group_size, n_images)
        if done_n % 50 < group_size and done_n >= 50 or done_n == n_images:
            print(f"{done_n}/{n_images} images decoded")

    # One-deep dispatch pipeline: group N+1's device decode is issued
    # BEFORE group N's results are fetched/selected/detokenized, so the
    # chip never idles on host-side post-processing (the dispatch is
    # asynchronous; only the fetch blocks).
    pending = None
    for start, prepared, staged in prefetch(group_stream(), buffer_size=2):
        key, k = jax.random.split(key)
        cur = None
        if len(prepared) > 1:
            try:
                kind_out = _dispatch_group(_C, model_cfg, harness, prepared,
                                           k, n_z, staged=staged,
                                           sampler=sampler_spec)
                cur = (start, prepared, kind_out)
            except Exception as e:  # trace/shape failures surface here
                if pending is not None:
                    collect_and_emit(pending)
                    pending = None
                print(f"group decode failed ({e}); retrying per image")
                for batch, oae in prepared:
                    key, k2 = jax.random.split(key)
                    emit(batch, decode_single(batch, oae, k2))
                done_n = min(start + group_size, n_images)
                if (done_n % 50 < group_size and done_n >= 50
                        or done_n == n_images):
                    print(f"{done_n}/{n_images} images decoded")
        else:
            if pending is not None:
                collect_and_emit(pending)
                pending = None
            batch, oae = prepared[0]
            emit(batch, decode_single(batch, oae, k))
            done_n = min(start + group_size, n_images)
            if done_n % 50 < group_size and done_n >= 50 or done_n == n_images:
                print(f"{done_n}/{n_images} images decoded")
        if pending is not None:
            collect_and_emit(pending)
        pending = cur
    if pending is not None:
        collect_and_emit(pending)

    os.makedirs(os.path.dirname(os.path.abspath(_A.output_path)), exist_ok=True)
    with open(_A.output_path, "w") as f:
        json.dump(predictions, f)
    if n_fallbacks:
        print(f"{n_fallbacks} images fell back to unconstrained decoding")
    print(f"wrote {len(predictions)} predictions to {_A.output_path}")


def _dispatch_group(_C, model_cfg, harness, prepared, k, n_z, staged=None,
                    sampler=None):
    """Issue ONE asynchronous device dispatch for a group of images (the
    reference forces bs=1, inference.py:95). Returns ``(kind, device_out)``
    for :func:`_collect_group`; ``staged`` carries pre-transferred device
    arrays from the prefetch thread; ``sampler`` switches to the stochastic
    sampler path (--sampler), bypassing CBS/beam."""
    import jax.numpy as jnp
    import numpy as np

    if staged is not None:
        feats, sentiment, obj_att_embeds = (staged["feats"],
                                            staged["sentiment"], staged["oae"])
    else:
        feats = np.concatenate([b["image_features"] for b, _ in prepared])
        sents = [b["sentiment"] for b, _ in prepared]
        sentiment = (np.concatenate(sents) if sents[0] is not None else None)
        oaes = [o for _, o in prepared]
        obj_att_embeds = (None if oaes[0] is None
                          else jnp.asarray(np.concatenate(oaes)))

    if sampler is not None:
        return ("sample", harness.decode_sample(
            feats, sentiment, obj_att_embeds, k, n_z, fetch=False, **sampler))
    if _C.MODEL.USE_CBS:
        tables = [list(b["fsm_tables"]) for b, _ in prepared]
        ncs = np.asarray([int(np.asarray(b["num_constraints"]).reshape(-1)[0])
                          for b, _ in prepared])
        if model_cfg.cbs_simple:
            return ("cbs_simple", harness.decode_cbs(
                feats, sentiment, obj_att_embeds, tables, ncs, k, n_z,
                fetch=False))
        return ("cbs_grounded", harness.decode_cbs(
            feats, sentiment, obj_att_embeds, tables, ncs, k, n_z,
            return_all=True, fetch=False))
    return ("beam", harness.decode_beam(
        feats, sentiment, obj_att_embeds, k, n_z, fetch=False))


def _collect_group(_C, model_cfg, kind_out, prepared, n_z):
    """Fetch a dispatched group's results and run host-side selection.
    Returns a list of (n_z, T) token arrays, one per image, in input
    order."""
    import jax
    import numpy as np

    from style_seqcvae_tpu.decoding.select import select_best_beam_with_constraints

    kind, out = kind_out
    out = jax.tree_util.tree_map(np.asarray, out)
    B = len(prepared)
    if kind == "sample":
        return [out[:, b, :] for b in range(B)]               # (n_z, T) each
    if kind == "cbs_simple":
        best, _ = out
        return [best[:, b, :] for b in range(B)]              # (n_z, T) each
    if kind == "cbs_grounded":
        seqs, lp = out
        grouped = [[] for _ in range(B)]
        for z in range(n_z):
            cands, c2s, per_nc = [], [], []
            for b, _ in prepared:
                ci = min(z, len(b["candidates"]) - 1)
                ni = min(z, len(b["num_constraints"]) - 1)
                cands.append(b["candidates"][ci])
                c2s.append(b["constraint2states"][ci])
                per_nc.append(int(b["num_constraints"][ni]))
            best, _ = select_best_beam_with_constraints(
                seqs[z], lp[z], per_nc, cands, c2s,
                model_cfg.min_constraints_to_satisfy, cbs_simple=False)
            for b in range(B):
                grouped[b].append(best[b])
        return [np.stack(toks) for toks in grouped]
    seqs, _ = out
    return [seqs[:, b, :] for b in range(B)]


def _decode_one(_C, model_cfg, harness, batch, feats, sentiment,
                obj_att_embeds, k, n_z, sampler=None):
    import numpy as np

    from style_seqcvae_tpu.decoding.select import select_best_beam_with_constraints

    if sampler is not None:
        toks = harness.decode_sample(feats, sentiment, obj_att_embeds, k,
                                     n_z, **sampler)
        return toks[:, 0, :]                                  # (n_z, T)
    if _C.MODEL.USE_CBS:
        if model_cfg.cbs_simple:
            best, _ = harness.decode_cbs(
                feats, sentiment, obj_att_embeds, batch["fsm_tables"],
                batch["num_constraints"], k, n_z)
            return best[:, 0, :]                              # (n_z, T)
        seqs, lp = harness.decode_cbs(
            feats, sentiment, obj_att_embeds, batch["fsm_tables"],
            batch["num_constraints"], k, n_z, return_all=True)
        captions_tok = []
        for z in range(n_z):
            ci = min(z, len(batch["candidates"]) - 1)
            ni = min(z, len(batch["num_constraints"]) - 1)
            best, _ = select_best_beam_with_constraints(
                seqs[z], lp[z], [int(batch["num_constraints"][ni])],
                [batch["candidates"][ci]], [batch["constraint2states"][ci]],
                model_cfg.min_constraints_to_satisfy, cbs_simple=False)
            captions_tok.append(best[0])
        return np.stack(captions_tok)
    seqs, _ = harness.decode_beam(feats, sentiment, obj_att_embeds, k, n_z)
    return seqs[:, 0, :]


if __name__ == "__main__":
    main()
