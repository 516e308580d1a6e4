"""On-device cbs_simple FSM construction (decoding/device_fsm.py):
equivalence against the host FiniteStateMachineBuilder and a numpy
transcription of the candidate-selection semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.decoding.cbs_fast import (
    constrained_beam_search_fast,
    stack_fsm_tables,
)
from style_seqcvae_tpu.decoding.device_fsm import (
    build_attribute_wordform_table,
    build_tables_device,
    clean_attribute_name,
    select_attribute_constraints,
)
from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder

END = 1

ATT_NAMES = ["wooden", "shiny metal", "red", "light blue", "blue",
             "furry", "plastic", "striped"]
WORDFORMS = {
    "wooden": ["wooden", "wood"],
    "metal": ["metal", "metallic"],
    "red": ["red"],
    "blue": ["blue"],
    "furry": ["furry", "fuzzy"],
    "plastic": ["plastic"],
    # "striped" deliberately absent (whitelist-pruned attribute)
}


def _vocab():
    words = sorted({w for forms in WORDFORMS.values() for w in forms})
    return Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "sits"] + words)


def _builder(vocab):
    b = FiniteStateMachineBuilder(vocab, max_given_constraints=3,
                                  max_words_per_constraint=2)
    for name, forms in WORDFORMS.items():
        b.add_wordforms(name, forms)
    return b


def _table(vocab):
    return build_attribute_wordform_table(ATT_NAMES, WORDFORMS, vocab)


def _step(V, seed):
    rng = np.random.RandomState(seed)
    logits = rng.randn(V, V).astype(np.float32) * 2
    t = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))

    def step(tokens, state, rng):
        return t[tokens], state

    return step


def _decode(step, tables, B, T=6, K=3):
    return constrained_beam_search_fast(
        step, jnp.asarray(np.zeros((B,), np.int32)), {"d": jnp.zeros((B,))},
        tables, jax.random.PRNGKey(0), max_steps=T, beam_size=K,
        per_node_beam_size=2, end_index=END)


@pytest.mark.parametrize("att_ids", [
    (0, 2, 4),          # wooden, red, blue — three distinct constraints
    (5, 1, -1),         # furry, metal — two constraints + padding
    (2, -1, -1),        # one constraint
    (-1, -1, -1),       # none detected
])
def test_device_tables_match_host_builder(att_ids):
    """Same decode beams + log-probs from build_tables_device as from the
    host FiniteStateMachineBuilder.build_tables, for every constraint
    count."""
    vocab = _vocab()
    table = _table(vocab)
    words = [clean_attribute_name(ATT_NAMES[i]) for i in att_ids if i >= 0]

    host_tables, used, _ = _builder(vocab).build_tables(words, num_states=8)
    dev_tables = build_tables_device(jnp.asarray(att_ids, jnp.int32), table)
    assert used <= 8 and dev_tables.num_states == 8

    step = _step(vocab.get_vocab_size(), seed=7)
    seq_h, lp_h = _decode(step, stack_fsm_tables([host_tables]), B=1)
    seq_d, lp_d = _decode(step, jax.tree_util.tree_map(
        lambda x: jnp.asarray(x)[None], dev_tables), B=1)

    lp_h, lp_d = np.asarray(lp_h), np.asarray(lp_d)
    reachable = lp_h > -1e19
    np.testing.assert_array_equal(lp_d > -1e19, reachable)
    np.testing.assert_allclose(np.where(reachable, lp_d, 0),
                               np.where(reachable, lp_h, 0), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(seq_d)[reachable],
                                  np.asarray(seq_h)[reachable])


def test_device_tables_batched_under_jit():
    """vmapped table build + decode compiles and matches per-image calls."""
    vocab = _vocab()
    table = _table(vocab)
    ids = jnp.asarray([[0, 2, 4], [5, -1, -1]], jnp.int32)

    build = jax.jit(jax.vmap(lambda a: build_tables_device(a, table)))
    batched = build(ids)
    assert batched.default_dest.shape == (2, 8)

    step = _step(vocab.get_vocab_size(), seed=3)
    seq_b, lp_b = _decode(step, batched, B=2)
    for i in range(2):
        one = build_tables_device(ids[i], table)
        seq_1, lp_1 = _decode(step, jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[None], one), B=1)
        np.testing.assert_allclose(np.asarray(lp_b)[i], np.asarray(lp_1)[0],
                                   atol=1e-4)


def test_wordform_table_aliasing_and_pruning():
    vocab = _vocab()
    table = _table(vocab)
    # "light blue" and "blue" share the cleaned name "blue" → same canonical
    assert table.canonical[4] == table.canonical[3] == 3
    assert table.canonical[0] == 0
    # pruned attribute ("striped" has no wordforms) is not selectable
    assert not table.selectable[7]
    assert table.selectable[0] and table.selectable[4]
    # canonical rows carry the alias's wordforms
    blue_tok = vocab.get_token_index("blue")
    assert table.tokens[4, 0] == blue_tok and table.valid[4, 0]
    assert table.valid.sum(axis=1)[0] == 2      # wooden, wood


def test_wordform_table_drops_multitoken_forms():
    vocab = _vocab()
    forms = dict(WORDFORMS)
    forms["red"] = ["red", "bright red"]
    with pytest.warns(UserWarning, match="multi-token"):
        t = build_attribute_wordform_table(ATT_NAMES, forms, vocab)
    assert t.valid[2].sum() == 1


def test_duplicate_word_wires_both_bits():
    """A word picked by two objects (same canonical id in two slots) must
    nondeterministically set either bit from state 0."""
    vocab = _vocab()
    table = _table(vocab)
    t = build_tables_device(jnp.asarray([2, 2, -1], jnp.int32), table)
    red = vocab.get_token_index("red")
    row_tok = np.asarray(t.exc_token)[0]
    row_dest = np.asarray(t.exc_dest)[0]
    row_valid = np.asarray(t.exc_valid)[0]
    dests = {int(d) for tok, d, v in zip(row_tok, row_dest, row_valid)
             if v and tok == red}
    assert dests == {1, 2}


def test_selection_matches_numpy_transcription():
    """Candidate-object ordering, same-class attribute union, canonical
    dedup, and threshold behavior against a straightforward numpy mirror;
    the random pick is only asserted to come from the right candidate
    set."""
    rng = np.random.RandomState(0)
    vocab = _vocab()
    table = _table(vocab)
    M, A = 12, len(ATT_NAMES)
    for trial in range(20):
        class_ids = rng.randint(1, 6, (M,))
        valid = rng.rand(M) > 0.2
        att_scores = rng.rand(M, A).astype(np.float32)
        att_ids, num_given = jax.jit(
            lambda c, v, s, k: select_attribute_constraints(
                c, v, s, table, k))(
            jnp.asarray(class_ids), jnp.asarray(valid),
            jnp.asarray(att_scores), jax.random.PRNGKey(trial))
        att_ids, num_given = np.asarray(att_ids), int(num_given)

        # numpy mirror
        present = (att_scores > 0.3) & valid[:, None] & table.selectable
        present_c = np.zeros_like(present)
        for a in range(A):
            present_c[:, table.canonical[a]] |= present[:, a]
        seen, slots = set(), []
        for m in range(M):
            if not valid[m] or class_ids[m] in seen:
                continue
            seen.add(class_ids[m])
            union = np.zeros((A,), bool)
            for j in range(M):
                if valid[j] and class_ids[j] == class_ids[m]:
                    union |= present_c[j]
            if union.any():
                slots.append(union)
            if len(slots) == 3:
                break
        assert num_given == len(slots)
        for i in range(3):
            if i < len(slots):
                assert att_ids[i] >= 0 and slots[i][att_ids[i]], \
                    f"trial {trial} slot {i}: pick {att_ids[i]} not in set"
                assert table.canonical[att_ids[i]] == att_ids[i]
            else:
                assert att_ids[i] == -1


def test_selection_empty_image():
    vocab = _vocab()
    table = _table(vocab)
    att_ids, num_given = select_attribute_constraints(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4,), bool),
        jnp.zeros((4, len(ATT_NAMES))), table, jax.random.PRNGKey(0))
    assert int(num_given) == 0 and np.all(np.asarray(att_ids) == -1)
