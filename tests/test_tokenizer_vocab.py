from style_seqcvae_tpu.data.tokenizer import tokenize_caption, word_tokenize
from style_seqcvae_tpu.data.vocabulary import (
    BOUNDARY_TOKEN,
    UNK_TOKEN,
    Vocabulary,
    add_constraint_words_to_vocabulary,
    build_caption_vocabulary,
)


def test_tokenize_caption_basic():
    assert tokenize_caption("A man riding a horse.") == ["a", "man", "riding", "a", "horse"]
    assert tokenize_caption("The dog's toy, on the couch!") == \
        ["the", "dog", "'s", "toy", "on", "the", "couch"]


def test_tokenizer_contractions_and_punct():
    assert word_tokenize("don't stop") == ["do", "n't", "stop"]
    # punctuation stripped by tokenize_caption
    assert tokenize_caption("it isn't (really) good...") == ["it", "is", "n't", "really", "good"]


def test_vocabulary_roundtrip(tmp_path):
    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog"])
    vocab.save_to_files(str(tmp_path))
    v2 = Vocabulary.from_files(str(tmp_path))
    assert v2.get_vocab_size() == 4
    assert v2.get_token_index("dog") == 3
    assert v2.get_token_index("zebra") == v2.unk_index == 0
    assert v2.boundary_index == 1
    assert (tmp_path / "non_padded_namespaces.txt").read_text() == "tokens"


def test_constraint_word_expansion(tmp_path):
    tsv = tmp_path / "wf.tsv"
    tsv.write_text("dog\tdog,dogs\nfire hydrant\tfire hydrant,fire hydrants\n")
    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "dog"])
    add_constraint_words_to_vocabulary(vocab, str(tsv))
    # "dog" deduped; "dogs", "fire", "hydrant", "hydrants" added.
    assert vocab.get_token_index("dogs") > 1
    assert vocab.get_token_index("fire") > 1
    assert vocab.get_token_index("hydrants") > 1
    assert vocab.get_token_index("dog") == 2


def test_build_caption_vocabulary_thresholds():
    coco = [{"id": i, "image_id": i, "caption": "a dog runs"} for i in range(5)]
    coco += [{"id": 100, "image_id": 100, "caption": "rare zebra"}]
    senti = [{
        "filename": "COCO_val2014_000000000100.jpg",
        "split": "train",
        "sentences": [{"raw": "lovely zebra", "sentiment": 1}],
    }]
    tokens = build_caption_vocabulary(coco, senti, word_count_threshold=5,
                                      senticap_word_count_threshold=2)
    assert tokens[0] == UNK_TOKEN and tokens[1] == BOUNDARY_TOKEN
    assert "dog" in tokens and "runs" in tokens
    # "zebra": 1 COCO + 1 senticap = 2 ≥ senticap threshold → included
    assert "zebra" in tokens
    # "rare": 1 < 5 and not in senticap → excluded; "lovely": 1 < 2 → excluded
    assert "rare" not in tokens and "lovely" not in tokens


def test_build_caption_vocabulary_gates_on_image_id_not_annotation_id():
    """Regression for the reference's annotation-id/image-id confusion
    (build_vocabulary.py:69 vs :82, documented divergence): senticap words
    must survive when image ids and annotation ids live in DISJOINT ranges
    (as in every synthetic corpus here — round 4's 70k run lost all
    sentiment words to this and its decodes could never emit one)."""
    coco = [{"id": i + 1, "image_id": 100001, "caption": "a dog runs fast"}
            for i in range(5)]
    senti = [{
        "filename": "COCO_train2014_000000100001.jpg",
        "split": "train",
        "sentences": [{"raw": "lovely dog", "sentiment": 1},
                      {"raw": "lovely pup", "sentiment": 1}],
    }]
    tokens = build_caption_vocabulary(coco, senti, word_count_threshold=5,
                                      senticap_word_count_threshold=2)
    assert "lovely" in tokens
