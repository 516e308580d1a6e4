"""Single-dispatch serving program (style_seqcvae_tpu/serving.py): the
detector → on-device constraint selection → device FSM build → CBS decode
chain compiled as ONE XLA program, exercised at tiny dims on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.decoding.device_fsm import build_attribute_wordform_table
from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner
from style_seqcvae_tpu.models.detector.faster_rcnn import (
    DetectorConfig,
    init_detector,
)
from style_seqcvae_tpu.models.detector.rpn import RPNConfig
from style_seqcvae_tpu.serving import make_serve_fn

ATT_NAMES = ["wooden", "red", "blue", "furry", "plastic", "shiny", "tall"]
WORDFORMS = {n: [n] for n in ATT_NAMES}


@pytest.fixture(scope="module")
def setup():
    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "sits",
                        "runs"] + ATT_NAMES)
    table = build_attribute_wordform_table(ATT_NAMES, WORDFORMS, vocab)

    det_cfg = DetectorConfig(
        num_classes=5, num_att_classes=len(ATT_NAMES), depth=50,
        anchor_scales=(2, 4), anchor_ratios=(0.5, 1.0, 2.0),
        rpn=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16,
                      anchor_scales=(2, 4)))
    det_params = init_detector(jax.random.PRNGKey(0), det_cfg)

    cap_cfg = CaptionerConfig(
        vocab_size=vocab.get_vocab_size(), image_feature_size=2048,
        embedding_size=8, hidden_size=6, attention_projection_size=4,
        z_space=4, sentiment_vae=1, simple_vae=False, max_caption_length=6,
        beam_size=2, use_cbs=True)
    cap_params = init_captioner(jax.random.PRNGKey(1), cap_cfg)
    return vocab, table, det_cfg, det_params, cap_cfg, cap_params


def _make(setup, **kw):
    _, table, det_cfg, _, cap_cfg, _ = setup
    kw.setdefault("n_z", 2)
    kw.setdefault("beam_size", 2)
    kw.setdefault("max_boxes", 8)
    kw.setdefault("rpn_pre_nms_top_n", 64)
    kw.setdefault("rpn_post_nms_top_n", 16)
    kw.setdefault("dtype", "float32")
    return make_serve_fn(det_cfg, cap_cfg, table, **kw)


def test_serve_single_program_shapes_and_determinism(setup):
    _, _, _, det_params, cap_cfg, cap_params = setup
    serve = _make(setup)
    rng = np.random.RandomState(0)
    B = 2
    images = jnp.asarray(rng.rand(B, 64, 64, 3).astype(np.float32) * 255)
    info = jnp.asarray(np.tile([64, 64, 1.0], (B, 1)).astype(np.float32))
    sent = jnp.asarray(np.array([[1.0], [-1.0]], np.float32))

    best, lp, num_given, chk = serve(det_params, cap_params, images, info,
                                     sent, jax.random.PRNGKey(3))
    assert best.shape == (2, B, cap_cfg.max_caption_length)
    assert lp.shape == (2, B) and num_given.shape == (B,)
    assert np.all(np.isfinite(np.asarray(lp)))
    assert np.isfinite(float(chk))
    assert np.all((np.asarray(num_given) >= 0) & (np.asarray(num_given) <= 3))

    # explicit-PRNG determinism (README: deterministic decode per key)
    best2, lp2, _, _ = serve(det_params, cap_params, images, info, sent,
                             jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(best), np.asarray(best2))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2))

    # different key → different z draws (lp must move)
    _, lp3, _, _ = serve(det_params, cap_params, images, info, sent,
                         jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(lp), np.asarray(lp3))


def test_serve_shared_fsm_across_z(setup):
    """per_z_fsm=False (STATE_MACHINE_PER_Z_SAMPLE off) broadcasts one FSM
    to every z-sample; the program still compiles and runs."""
    _, _, _, det_params, _, cap_params = setup
    serve = _make(setup, per_z_fsm=False, n_z=3)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    info = jnp.asarray(np.asarray([[64, 64, 1.0]], np.float32))
    sent = jnp.ones((1, 1), np.float32)
    best, lp, _, _ = serve(det_params, cap_params, images, info, sent,
                           jax.random.PRNGKey(0))
    assert best.shape[0] == 3 and np.all(np.isfinite(np.asarray(lp)))


def test_serve_is_one_dispatch(setup):
    """The whole chain must be ONE compiled program (the serving story):
    trace-count the jitted fn via its lowering — it accepts the full
    argument set, i.e. nothing escapes to the host between stages."""
    _, _, _, det_params, _, cap_params = setup
    serve = _make(setup)
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    info = jnp.asarray(np.asarray([[64, 64, 1.0]], np.float32))
    sent = jnp.ones((1, 1), np.float32)
    lowered = serve.lower(det_params, cap_params, images, info, sent,
                          jax.random.PRNGKey(0))
    text = lowered.as_text()
    # one module containing both a conv (detector backbone) and a while
    # (decode scan)
    assert "convolution" in text and "while" in text


def test_attribute_embeds_device_matches_host_translate():
    """attribute_embeds_device == LatentDictionary.translate_obj_atts on the
    equivalent name-form input (updown_captioner.py:509-532 semantics:
    mean over found attribute vectors, missing skipped, zero when none)."""
    from style_seqcvae_tpu.data.latents import LatentDictionary
    from style_seqcvae_tpu.serving import attribute_embeds_device

    rng = np.random.RandomState(7)
    z = 6
    names = ["wooden brown", "red", "blue", "furry", "missing"]
    mean_choice = {n.split(" ")[0]: rng.randn(z).astype(np.float32)
                   for n in names[:4]}          # "missing" has no entry
    ld = LatentDictionary(mean_choice, z, multiplier=1.5)
    table = ld.embed_table(names)
    assert table.table.shape == (5, z)
    assert list(table.has) == [True, True, True, True, False]

    M, A = 4, len(names)
    att_scores = rng.rand(M, A).astype(np.float32)
    valid = np.array([True, True, True, False])
    thresh = 0.5

    out = np.asarray(attribute_embeds_device(
        jnp.asarray(att_scores), jnp.asarray(valid), table, thresh))

    # host mirror: name-form obj_atts of the thresholded detections
    obj_atts = [[["obj", [names[a] for a in range(A)
                          if att_scores[m, a] > thresh]]
                 for m in range(M) if valid[m]]]
    ref = ld.translate_obj_atts(obj_atts, M)[0]
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_serve_mode2_attribute_prior(setup):
    """SENTIMENT_VAE=2 serving wires the latent-dictionary attention prior
    on device; without the table make_serve_fn refuses loudly."""
    from style_seqcvae_tpu.data.latents import LatentDictionary

    vocab, table, det_cfg, det_params, _, _ = setup
    cap_cfg = CaptionerConfig(
        vocab_size=vocab.get_vocab_size(), image_feature_size=2048,
        embedding_size=8, hidden_size=6, attention_projection_size=4,
        z_space=4, sentiment_vae=2, simple_vae=False, max_caption_length=6,
        beam_size=2, use_cbs=True)
    cap_params = init_captioner(jax.random.PRNGKey(1), cap_cfg)

    with pytest.raises(ValueError, match="att_embed_table"):
        make_serve_fn(det_cfg, cap_cfg, table, n_z=2, beam_size=2,
                      max_boxes=8, rpn_pre_nms_top_n=64,
                      rpn_post_nms_top_n=16, dtype="float32")

    rng = np.random.RandomState(3)
    ld = LatentDictionary(
        {n.split(" ")[0]: rng.randn(4).astype(np.float32)
         for n in ATT_NAMES}, 4)
    embeds = ld.embed_table(ATT_NAMES)
    serve = make_serve_fn(det_cfg, cap_cfg, table, n_z=2, beam_size=2,
                          max_boxes=8, rpn_pre_nms_top_n=64,
                          rpn_post_nms_top_n=16,
                          att_embed_table=embeds, dtype="float32")
    images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    info = jnp.asarray(np.asarray([[64, 64, 1.0]], np.float32))
    sent = jnp.ones((1, 1), np.float32)
    best, lp, _, _ = serve(det_params, cap_params, images, info, sent,
                           jax.random.PRNGKey(5))
    assert best.shape == (2, 1, cap_cfg.max_caption_length)
    assert np.all(np.isfinite(np.asarray(lp)))

    # a different dictionary must move the decode (the prior is live).
    # The shift must be enormous: the random-init detector's pooled
    # features have ~1e2-magnitude elements, deeply saturating the decoder
    # LSTM gates, so a moderate prior shift is invisible in the outputs.
    ld2 = LatentDictionary(
        {n.split(" ")[0]: 1e4 * np.ones(4, np.float32)
         for n in ATT_NAMES}, 4)
    serve2 = make_serve_fn(det_cfg, cap_cfg, table, n_z=2, beam_size=2,
                           max_boxes=8, rpn_pre_nms_top_n=64,
                           rpn_post_nms_top_n=16,
                           att_embed_table=ld2.embed_table(ATT_NAMES),
                           dtype="float32")
    _, lp2, _, _ = serve2(det_params, cap_params, images, info, sent,
                          jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(lp), np.asarray(lp2))
