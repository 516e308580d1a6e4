"""FSM builder truth-table tests mirroring the semantics of
updown-baseline/updown/utils/constraints.py:329-478."""

import numpy as np

from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder, pack_fsm, unpack_fsm


def make_vocab():
    return Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "dog", "dogs", "cat", "fire",
                       "hydrant", "hydrants", "salt", "and", "pepper", "red"])


def make_builder(vocab):
    b = FiniteStateMachineBuilder(vocab)
    b.add_wordforms("dog", ["dog", "dogs"])
    b.add_wordforms("cat", ["cat"])
    b.add_wordforms("fire", ["fire"])
    b.add_wordforms("hydrant", ["hydrant", "hydrants"])
    b.add_wordforms("salt", ["salt"])
    b.add_wordforms("and", ["and"])
    b.add_wordforms("pepper", ["pepper"])
    b.add_wordforms("red", ["red"])
    return b


def test_single_constraint_truth_table():
    vocab = make_vocab()
    fsm, used, c2s = make_builder(vocab).build(["dog"])
    dog, dogs, cat = vocab.get_token_index("dog"), vocab.get_token_index("dogs"), vocab.get_token_index("cat")
    # q0 --dog/dogs--> q1; q0 --other--> q0
    assert fsm[0, 1, dog] == 1 and fsm[0, 1, dogs] == 1
    assert fsm[0, 0, dog] == 0 and fsm[0, 0, dogs] == 0
    assert fsm[0, 0, cat] == 1 and fsm[0, 1, cat] == 0
    # q1 self-loops on everything including dog
    assert fsm[1, 1, dog] == 1 and fsm[1, 1, cat] == 1
    assert used == 8  # no sub-states used
    assert c2s["dog"] == [1]


def test_two_constraints_bit_lattice():
    vocab = make_vocab()
    fsm, used, c2s = make_builder(vocab).build(["dog", "cat"])
    dog, cat = vocab.get_token_index("dog"), vocab.get_token_index("cat")
    # 0→1 on dog, 2→3 on dog; 0→2 on cat, 1→3 on cat
    assert fsm[0, 1, dog] == 1 and fsm[2, 3, dog] == 1
    assert fsm[0, 2, cat] == 1 and fsm[1, 3, cat] == 1
    # no cross wiring
    assert fsm[0, 3, dog] == 0 and fsm[0, 3, cat] == 0
    assert c2s["dog"] == [1, 3] and c2s["cat"] == [2, 3]


def test_multiword_constraint_substates():
    vocab = make_vocab()
    fsm, used, _ = make_builder(vocab).build(["fire hydrant"])
    fire, hyd = vocab.get_token_index("fire"), vocab.get_token_index("hydrant")
    cat = vocab.get_token_index("cat")
    # q0 --fire--> q8 (first sub-state); q8 --hydrant--> q1; q8 --other--> q0
    assert fsm[0, 8, fire] == 1 and fsm[0, 0, fire] == 0
    assert fsm[8, 1, hyd] == 1
    assert fsm[8, 0, cat] == 1 and fsm[8, 8, cat] == 0
    # One sub-state chain is allocated per source main state (0,2,4,6):
    # 8 + 4 sub-states. Matches reference _add_nth_constraint looping.
    assert used == 12
    # Chain from main state 2 uses its own sub-state: 2 --fire--> 9 --hydrant--> 3
    assert fsm[2, 9, fire] == 1 and fsm[9, 3, hyd] == 1 and fsm[9, 2, cat] == 1


def test_three_word_constraint_and_trim():
    vocab = make_vocab()
    b = make_builder(vocab)
    b.add_wordforms("salt and pepper", ["unused"])  # class key present but words split
    fsm, used, _ = b.build(["salt and pepper"])
    salt, and_, pep = (vocab.get_token_index(w) for w in ["salt", "and", "pepper"])
    # chain: 0 -salt-> 8 -and-> 9 -pepper-> 1, resets to 0 otherwise
    assert fsm[0, 8, salt] == 1
    assert fsm[8, 9, and_] == 1
    assert fsm[9, 1, pep] == 1
    assert fsm[9, 0, salt] == 1  # reset on non-matching word
    # two sub-states per source main state (0,2,4,6) → 8 + 8
    assert used == 16


def test_pack_unpack_roundtrip_and_nondeterminism():
    vocab = make_vocab()
    # Two constraints sharing wordform "fire": "fire" object and "fire hydrant"
    b = make_builder(vocab)
    fsm, used, _ = b.build(["fire", "fire hydrant"])
    fire = vocab.get_token_index("fire")
    # From q0, "fire" must lead to BOTH q1 (constraint 1) and a sub-state.
    dests = np.where(fsm[0, :, fire])[0]
    assert len(dests) >= 2, f"expected nondeterministic transition, got {dests}"
    packed = pack_fsm(fsm)
    recon = unpack_fsm(packed, fsm.shape[0])
    np.testing.assert_array_equal(recon, fsm)


def test_repeated_constraint_handling():
    """Duplicate constraints go through the state_idxs branch
    (constraints.py:394-401) without crashing and wire a valid FSM."""
    vocab = make_vocab()
    fsm, used, c2s = make_builder(vocab).build(["dog", "dog"])
    assert fsm.shape[0] == 24
    dog = vocab.get_token_index("dog")
    assert fsm[0, 1, dog] == 1


def test_direct_tables_equal_dense_conversion():
    """build_tables (sparse replay, no dense materialization) must produce
    semantically identical exception tables to dense-build + fsm_to_tables."""
    from style_seqcvae_tpu.decoding.cbs_fast import fsm_to_tables

    vocab = make_vocab()
    b = make_builder(vocab)

    cases = [
        ["dog"], ["dog", "cat"], ["fire hydrant"], ["dog", "fire hydrant"],
        ["fire", "fire hydrant"],          # nondeterministic shared wordform
        ["dog", "dog"],                    # repeated constraint
        ["salt and pepper", "dog", "cat"],
    ]
    for constraints in cases:
        dense, used_d, c2s_d = b.build(constraints)
        td = fsm_to_tables(dense[:max(used_d, 8), :max(used_d, 8)])
        ts, used_s, c2s_s = b.build_tables(constraints)
        assert used_s == used_d and c2s_s == c2s_d, constraints

        def triples(t):
            out = set()
            S = t.default_dest.shape[0]
            for s in range(S):
                for j in range(t.exc_token.shape[1]):
                    if t.exc_valid[s, j]:
                        out.add((s, int(t.exc_token[s, j]), int(t.exc_dest[s, j])))
            return out

        S = min(td.default_dest.shape[0], ts.default_dest.shape[0])
        np.testing.assert_array_equal(np.asarray(td.default_dest)[:S],
                                      np.asarray(ts.default_dest)[:S])
        assert triples(td) == triples(ts), constraints


def test_direct_tables_much_faster():
    import time

    from style_seqcvae_tpu.decoding.cbs_fast import fsm_to_tables

    vocab = make_vocab()
    # inflate the vocabulary to realistic size
    big = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN] +
                     [f"w{i}" for i in range(10000)] +
                     ["dog", "dogs", "cat", "fire", "hydrant"])
    b = FiniteStateMachineBuilder(big)
    b.add_wordforms("dog", ["dog", "dogs"])
    b.add_wordforms("cat", ["cat"])
    b.add_wordforms("fire", ["fire"])
    b.add_wordforms("hydrant", ["hydrant"])

    t0 = time.time()
    for _ in range(3):
        dense, used, _ = b.build(["dog", "cat", "fire hydrant"])
        fsm_to_tables(dense[:used, :used])
    dense_t = (time.time() - t0) / 3

    t0 = time.time()
    for _ in range(20):
        b.build_tables(["dog", "cat", "fire hydrant"])
    direct_t = (time.time() - t0) / 20
    # typically >100x; assert a conservative 5x to avoid CI-timing flakes
    assert direct_t < dense_t / 5, (direct_t, dense_t)
