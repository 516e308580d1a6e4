"""Metric tests: exactness on hand-computable cases, known invariants
(perfect match scores, oracle ≥ mean), and pipeline structure."""

import math

import numpy as np
import pytest

from style_seqcvae_tpu.evaluation.eval import (
    eval_style,
    evaluate,
    n_gram_diversity,
    preprocess_coco_annots,
    preprocess_updown_output,
)
from style_seqcvae_tpu.evaluation.metrics import Bleu, Cider, Rouge


def test_bleu_perfect_match():
    gts = {1: ["a dog runs in the park"], 2: ["the cat sleeps on a mat"]}
    res = {1: ["a dog runs in the park"], 2: ["the cat sleeps on a mat"]}
    corpus, per_img = Bleu().compute_score(gts, res)
    for b in corpus:
        assert abs(b - 1.0) < 1e-6
    assert len(per_img[0]) == 2


def test_bleu_unigram_precision_hand_computed():
    # hyp: "the the dog", ref: "the dog barks"
    # clipped unigram correct: the×1 + dog×1 = 2; guess = 3
    # testlen 3 == reflen 3 → no brevity penalty
    gts = {1: ["the dog barks"]}
    res = {1: ["the the dog"]}
    corpus, _ = Bleu().compute_score(gts, res)
    assert abs(corpus[0] - 2.0 / 3.0) < 1e-6


def test_bleu_brevity_penalty():
    gts = {1: ["a b c d e f"]}
    res = {1: ["a b c"]}
    corpus, _ = Bleu().compute_score(gts, res)
    # p1 = 1.0, ratio = 3/6 → bp = exp(1 - 2) = e^-1
    assert abs(corpus[0] - math.exp(-1)) < 1e-4


def test_rouge_hand_computed():
    # hyp "a b c", ref "a x c": lcs=2, p=2/3, r=2/3 → F = 2/3
    gts = {1: ["a x c"]}
    res = {1: ["a b c"]}
    mean, scores = Rouge().compute_score(gts, res)
    assert abs(mean - 2.0 / 3.0) < 1e-6


def test_rouge_separate_max_quirk():
    """ROUGE-L takes max precision and max recall over refs SEPARATELY."""
    gts = {1: ["a b", "a b c d e f g h"]}
    res = {1: ["a b c d"]}
    m, _ = Rouge().compute_score(gts, res)
    # prec per ref: 2/4, 4/4 → max 1.0 ; rec per ref: 2/2, 4/8 → max 1.0
    b2 = 1.2 ** 2
    expected = ((1 + b2) * 1.0 * 1.0) / (1.0 + b2 * 1.0)
    assert abs(m - expected) < 1e-6


def test_cider_identical_is_ten():
    gts = {i: ["a dog runs fast " + str(i)] for i in range(8)}
    res = {i: ["a dog runs fast " + str(i)] for i in range(8)}
    mean, scores = Cider().compute_score(gts, res)
    assert abs(mean - 10.0) < 1e-6


def test_cider_orders_quality():
    gts = {1: ["a brown dog runs in the park", "the dog runs quickly"],
           2: ["a cat sits on the mat", "the cat rests"],
           3: ["a bird flies high", "the bird soars in the sky"]}
    good = {1: ["a brown dog runs in the park"], 2: ["a cat sits on the mat"],
            3: ["a bird flies high"]}
    bad = {1: ["pizza tastes great"], 2: ["pizza tastes great"],
           3: ["pizza tastes great"]}
    g, _ = Cider().compute_score(gts, good)
    b, _ = Cider().compute_score(gts, bad)
    assert g > b


def test_precomputed_corpus_matches_naive():
    """The reusable-corpus paths (oracle/z-loop fast path) must score
    identically to building reference state from scratch each call."""
    import numpy as np

    rng = np.random.RandomState(3)
    gts = {i: [" ".join(f"w{t}" for t in rng.randint(0, 50, 12)),
               " ".join(f"w{t}" for t in rng.randint(0, 50, 8))]
           for i in range(10)}
    bleu, cider = Bleu(), Cider()
    bcorpus = bleu.make_corpus(gts)
    ccorpus = cider.make_corpus(gts)
    for trial in range(3):
        res = {i: [" ".join(f"w{t}" for t in rng.randint(0, 50, 10))]
               for i in range(10)}
        m0, s0 = cider.compute_score(gts, res)
        m1, s1 = cider.compute_score(gts, res, corpus=ccorpus)
        assert m0 == m1
        assert s0 == s1
        bm0, bs0 = bleu.compute_score(gts, res)
        bm1, bs1 = bleu.compute_score(gts, res, corpus=bcorpus)
        assert bm0 == bm1
        assert bs0 == bs1

    # the shared corpus must not grow as hypotheses are scored against it
    # (defaultdict lookup-inserts would leak every hypothesis n-gram)
    df_size = len(ccorpus.doc_freq)
    vec_sizes = [len(v[0][0][k]) for v in ccorpus.ref_vecs.values()
                 for k in range(4)]
    res = {i: [" ".join(f"x{t}" for t in rng.randint(0, 50, 10))]
           for i in range(10)}
    cider.compute_score(gts, res, corpus=ccorpus)
    assert len(ccorpus.doc_freq) == df_size
    assert [len(v[0][0][k]) for v in ccorpus.ref_vecs.values()
            for k in range(4)] == vec_sizes

    # a corpus built from different gts must be rejected loudly
    import pytest
    with pytest.raises(ValueError):
        cider.compute_score({0: ["a b"]}, {0: ["a b"]}, corpus=ccorpus)


def test_diversity():
    caps = [
        {"image_id": 1, "caption": "a dog"},
        {"image_id": 1, "caption": "a dog"},      # duplicate → low diversity
        {"image_id": 2, "caption": "a cat"},
        {"image_id": 2, "caption": "the bird"},   # distinct → high diversity
    ]
    d1 = n_gram_diversity(caps, 1)
    # image 1: 2 unique / 4 words = 0.5; image 2: 4 unique / 4 = 1.0
    assert abs(d1 - 0.75) < 1e-6


def test_eval_style():
    wf = {"pos_adj": ["lovely", "nice"], "neg_adj": ["ugly"]}
    gts = {1: ["a lovely dog", "a nice dog"], 2: ["an ugly cat"]}
    res = [{1: ["a lovely dog"], 2: ["a plain cat"]}]
    p, r, anp = eval_style(gts, res, wf)
    assert p == 1.0                   # "lovely" predicted, in gts
    assert abs(r - 1.0 / 3.0) < 1e-6  # of {lovely, nice, ugly} only lovely hit
    assert anp == 0.5                 # image 2 has no lexicon word predicted


def test_preprocess_and_grouping():
    coco = {"annotations": [
        {"image_id": 7, "caption": "A dog runs."},
        {"image_id": 7, "caption": "The dog is running!"}]}
    gts = preprocess_coco_annots(coco)
    assert gts == {7: ["a dog runs", "the dog is running"]}

    updown = [{"image_id": 7, "caption": "a dog"}, {"image_id": 7, "caption": "the dog"}]
    res, gts2 = preprocess_updown_output(updown, gts)
    assert len(res) == 2 and res[0][7] == ["a dog"] and res[1][7] == ["the dog"]


def test_full_evaluate_oracle_geq_mean():
    rng = np.random.RandomState(0)
    words = "a the dog cat runs sits park mat red blue".split()
    gts = {i: [" ".join(rng.choice(words, 6)) for _ in range(3)] for i in range(6)}
    preds = []
    for i in range(6):
        for k in range(5):
            preds.append({"image_id": i, "caption": " ".join(rng.choice(words, 6))})
    out = evaluate(preds, gts, wordforms={"w": ["red", "blue"]}, do_meteor=False)
    for m in ("B1", "B2", "B3", "B4", "cider", "rouge"):
        assert out[m] >= out[f"mean {m}"] - 1e-9, m
    assert "top5 Div-1" in out and "senti_prec" in out
    assert 0 <= out["Div-1"] <= 1


# ---------------- pure-Python METEOR (MeteorPy) ----------------
# meteor-1.5 en parameters: alpha=0.85, beta=0.2, gamma=0.6, delta=0.75,
# stage weights exact=1.0 / stem=0.6. Expectations hand-computed below.

def _pen(m, chunks=1):
    return 0.6 * (chunks / m) ** 0.2


def test_meteorpy_perfect_match_penalty():
    """Identical 6-word sentences: P=R=Fmean=1, one chunk of m=6 ->
    score = 1 - 0.6*(1/6)^0.2 (the 1.5 penalty is flat but large -- a
    perfect match does NOT score ~1, matching the jar's behavior)."""
    from style_seqcvae_tpu.evaluation.metrics import MeteorPy

    s = MeteorPy.sentence_score("the cat sat on the mat".split(),
                                "the cat sat on the mat".split())
    assert abs(s - (1 - _pen(6))) < 1e-12


def test_meteorpy_fully_fragmented():
    """Same words, scrambled order: all 6 matches are singleton chunks ->
    frag=1, penalty=gamma=0.6, score=0.4."""
    from style_seqcvae_tpu.evaluation.metrics import MeteorPy

    s = MeteorPy.sentence_score("on the mat sat the cat".split(),
                                "the cat sat on the mat".split())
    assert abs(s - 0.4) < 1e-12


def test_meteorpy_stem_stage_weight():
    """cats/cat and running/runs match through the Porter-stem stage at
    weight 0.6; 'the' matches exactly at its function-word weight 0.25:
    P = R = (1*0.25 + 0.6*0.75*2) / (0.25 + 0.75*2) = 1.15/1.75."""
    from style_seqcvae_tpu.evaluation.metrics import MeteorPy

    s = MeteorPy.sentence_score("the cats running".split(),
                                "the cat runs".split())
    pr = (1.0 * 0.25 + 2 * 0.6 * 0.75) / (0.25 + 2 * 0.75)
    assert abs(s - pr * (1 - _pen(3))) < 1e-12


def test_meteorpy_function_word_discount():
    """hyp='the dog' vs ref='the cat sat': the single match is the
    function word 'the' (weight 0.25): P = 0.25/(0.25+0.75) = 0.25,
    R = 0.25/(0.25+2*0.75) = 1/7, frag=1 -> penalty 0.6."""
    from style_seqcvae_tpu.evaluation.metrics import MeteorPy

    p, r = 0.25, 0.25 / 1.75
    fmean = (p * r) / (0.85 * p + 0.15 * r)
    s = MeteorPy.sentence_score("the dog".split(), "the cat sat".split())
    assert abs(s - fmean * 0.4) < 1e-12
    assert MeteorPy.sentence_score(["dog"], ["cat"]) == 0.0


def test_meteorpy_content_match_outscores_function_match():
    """delta=0.75: matching a content word must beat matching a function
    word, all else equal."""
    from style_seqcvae_tpu.evaluation.metrics import MeteorPy

    content = MeteorPy.sentence_score("red dog".split(), "red cat".split())
    function = MeteorPy.sentence_score("the dog".split(), "the cat".split())
    assert content > function


def test_meteorpy_compute_score_protocol_multi_ref_max():
    from style_seqcvae_tpu.evaluation.metrics import Meteor, MeteorPy

    gts = {1: ["a dog runs", "completely unrelated words here"],
           2: ["the cat sat on the mat"]}
    res = {1: ["a dog runs"], 2: ["the cat sat on the mat"]}
    corpus, per_image = MeteorPy().compute_score(gts, res)
    expected1 = 1 - _pen(3)                 # max over refs = the perfect one
    expected2 = 1 - _pen(6)
    assert abs(per_image[0] - expected1) < 1e-12
    assert abs(per_image[1] - expected2) < 1e-12
    assert abs(corpus - (expected1 + expected2) / 2) < 1e-12

    # the Meteor dispatcher serves MeteorPy when no jar is configured
    corpus_d, _ = Meteor().compute_score(gts, res)
    assert abs(corpus_d - corpus) < 1e-12


def test_evaluate_includes_meteor_offline():
    """The eval pipeline's METEOR column (reference eval/eval.py:317-320,
    350-437) now computes without a JVM: mean + oracle keys present."""
    from style_seqcvae_tpu.evaluation.eval import evaluate

    preds = [{"image_id": 1, "caption": "a red dog runs"},
             {"image_id": 1, "caption": "a dog"},
             {"image_id": 2, "caption": "a blue cat sits"},
             {"image_id": 2, "caption": "the cat"}]
    gts = {1: ["a red dog runs fast"], 2: ["a blue cat sits down"]}
    out = evaluate(preds, gts, wordforms={"w": ["red", "blue"]})
    assert "meteor" in out and "mean meteor" in out
    assert 0.0 <= out["mean meteor"] <= 1.0
    assert out["meteor"] >= out["mean meteor"] - 1e-9  # oracle >= mean
