import os

import pytest

from style_seqcvae_tpu.config import Config


def test_defaults_match_reference_tree():
    C = Config()
    # Behavior-defining defaults from updown-baseline/updown/config.py:8-104.
    assert C.MODEL.Z_SPACE == 150
    assert C.MODEL.KLD_WEIGHT == 750
    assert C.MODEL.PRIOR_STD == 1.0
    assert C.DATA.CBS.MAX_GIVEN_CONSTRAINTS == 3
    assert C.DATA.MAX_CAPTION_LENGTH == 20
    assert C.OPTIM.BATCH_SIZE == 150
    assert C.OPTIM.NUM_ITERATIONS == 70000
    assert C.OPTIM.LR == 0.015
    assert C.OPTIM.EPOCH_START_DECODER_TRAINING == 40000
    # Detector tree (frcnn/lib/model/utils/config.py).
    assert C.DET.TRAIN.FG_FRACTION == 0.25
    assert C.DET.POOLING_MODE == "align"
    assert C.DET.TEST.MAX_PER_IMAGE == 100


def test_override_list_and_coercion():
    C = Config(config_override=["MODEL.Z_SPACE", "100", "MODEL.SIMPLE_VAE", "false",
                                "OPTIM.LR", "0.5"])
    assert C.MODEL.Z_SPACE == 100
    assert C.MODEL.SIMPLE_VAE is False
    assert C.OPTIM.LR == 0.5


def test_yaml_merge_of_reference_style_config(tmp_path):
    yml = tmp_path / "cfg.yml"
    yml.write_text(
        "MODEL:\n  EMBEDDING_SIZE: 600\n  HIDDEN_SIZE: 900\n  SENTIMENT_VAE: 1\n"
        "OPTIM:\n  BATCH_SIZE: 150\n"
    )
    C = Config(str(yml))
    assert C.MODEL.EMBEDDING_SIZE == 600
    assert C.MODEL.HIDDEN_SIZE == 900
    assert C.MODEL.SENTIMENT_VAE == 1


def test_frozen():
    C = Config()
    with pytest.raises(AttributeError):
        C.MODEL.Z_SPACE = 10


def test_validation_cbs_requires_glove():
    with pytest.raises(AssertionError):
        Config(config_override=["MODEL.USE_CBS", "true", "MODEL.EMBEDDING_SIZE", "1000"])


def test_dump_roundtrip(tmp_path):
    C = Config(config_override=["MODEL.Z_SPACE", "77"])
    p = os.path.join(tmp_path, "dump.yml")
    C.dump(p)
    C2 = Config(p)
    assert C2.MODEL.Z_SPACE == 77
