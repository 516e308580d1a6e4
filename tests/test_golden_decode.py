"""Golden-value regression fixture (SURVEY §4 "golden-value parity tests"):
fixed small weights + 10 precomputed feature sets → exact greedy and beam
decode outputs, committed as tests/fixtures/golden_decode.npz. Any change to
the cell math, attention, beam semantics, or RNG layout that alters decode
results fails this test (BASELINE.json config 1 shape, CPU-runnable)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.decoding.beam_search import beam_search, greedy_decode
from style_seqcvae_tpu.models.captioner import (
    CaptionerConfig,
    init_captioner,
    make_decode_context,
    make_step_fn,
)
from style_seqcvae_tpu.models.updown_cell import init_cell_state

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_decode.npz")

CFG = CaptionerConfig(vocab_size=120, image_feature_size=32, embedding_size=300,
                      hidden_size=24, attention_projection_size=16, z_space=8,
                      sentiment_vae=1, simple_vae=False, max_caption_length=12,
                      beam_size=4)


def test_golden_decode_regression():
    data = np.load(FIXTURE)
    params0 = init_captioner(jax.random.PRNGKey(42), CFG)
    flat, treedef = jax.tree_util.tree_flatten(params0)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(data[f"p{i}"]) for i in range(len(flat))])

    ctx = make_decode_context(params, CFG, jnp.asarray(data["feats"]),
                              sentiment=jnp.asarray(data["sent"]))
    step = make_step_fn(params, CFG, ctx)
    st = init_cell_state((10,), CFG.hidden_size)

    greedy = greedy_decode(step, jnp.full((10,), CFG.boundary_index), st,
                           jax.random.PRNGKey(3), max_steps=12,
                           end_index=CFG.boundary_index)
    np.testing.assert_array_equal(np.asarray(greedy), data["greedy"])

    beams, lp = beam_search(step, jnp.full((10,), CFG.boundary_index), st,
                            jax.random.PRNGKey(3), max_steps=12, beam_size=4,
                            per_node_beam_size=2, end_index=CFG.boundary_index)
    np.testing.assert_array_equal(np.asarray(beams), data["beams"])
    np.testing.assert_allclose(np.asarray(lp), data["lp"], atol=1e-5)
