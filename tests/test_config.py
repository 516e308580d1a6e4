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


def test_every_reference_captioner_key_exists_with_same_default():
    """Exhaustive key+default parity with the reference yacs tree
    (updown-baseline/updown/config.py:8-104), transcribed below."""
    REF = {
        "LOG_TO_FILE": True, "CHECKPOINT_EVERY_N_EPOCHS": 10,
        "PRINT_EVERY_N_BATCHES": 100, "RANDOM_SEED": 0,
        "DATA.VOCABULARY": "data/vocabulary",
        "DATA.TRAIN_FEATURES": "data/coco_train2017_vg_detector_features_adaptive.h5",
        "DATA.INFER_FEATURES": "data/nocaps_val_vg_detector_features_adaptive.h5",
        "DATA.TRAIN_CAPTIONS": "data/coco/captions_train2017.json",
        "DATA.INFER_CAPTIONS": "data/nocaps/nocaps_val_image_info.json",
        "DATA.SENTICAP_CAPTIONS": "", "DATA.DO_LOAD_COCO": True,
        "DATA.DO_LOAD_SENTICAP": False, "DATA.SENTICAP_SENTIMENT": "",
        "DATA.EXPERT_CAPTIONS": "", "DATA.COCO_ATTRIBS_OBJS": "",
        "DATA.REMOVE_SAMPLES_WITHOUT_ATTRIBS": False,
        "DATA.USE_OBJ_ATT_PREDS": False, "DATA.ATT_PRED_THRESH": 0.3,
        "DATA.MAX_CAPTION_LENGTH": 20,
        "DATA.CBS.INFER_BOXES": "data/nocaps_val_oi_detector_boxes.json",
        "DATA.CBS.CLASS_HIERARCHY": "data/cbs/class_hierarchy.json",
        "DATA.CBS.WORDFORMS": "", "DATA.CBS.WORDFORMS_ATTRIBS": "",
        "DATA.CBS.NMS_THRESHOLD": 0.85, "DATA.CBS.MAX_GIVEN_OBJECTS": 2,
        "DATA.CBS.MAX_GIVEN_CONSTRAINTS": 3,
        "DATA.CBS.MAX_WORDS_PER_CONSTRAINT": 3,
        "MODEL.IMAGE_FEATURE_SIZE": 2048, "MODEL.EMBEDDING_SIZE": 1000,
        "MODEL.HIDDEN_SIZE": 1200, "MODEL.ATTENTION_PROJECTION_SIZE": 768,
        "MODEL.BEAM_SIZE": 5, "MODEL.USE_CBS": False, "MODEL.CBS_SIMPLE": True,
        "MODEL.MIN_CONSTRAINTS_TO_SATISFY": 2, "MODEL.PRIOR_MODE": "AG",
        "MODEL.DO_USE_CLUSTER_VECTOR": True, "MODEL.FC_LAYER_PER_ATTRIB": True,
        "MODEL.NUM_LSTM_LAYERS": 1, "MODEL.LSTM_DROPOUT": 0.1,
        "MODEL.Z_SPACE": 150, "MODEL.SENTIMENT_VAE": 0,
        "MODEL.SENTI_PRIOR_MULTIP": 1.0, "MODEL.LATENT_EMBEDDING_MULTIP": 1.0,
        "MODEL.KLD_WEIGHT": 750, "MODEL.N_Z_SAMPLES": 0,
        "MODEL.STATE_MACHINE_PER_Z_SAMPLE": False,
        "MODEL.LATENT_EMBEDDING": "glove", "MODEL.PRIOR_STD": 1.0,
        "MODEL.SIMPLE_VAE": True, "MODEL.DO_USE_KLD_ANNEALING": False,
        "MODEL.KLD_DECREASING": False, "MODEL.KLD_INITIAL_WEIGHT": 2.0,
        "MODEL.KLD_ANNEALING_PER_EPOCH": 0.25,
        "MODEL.KLD_N_EPOCHS_BEFORE_RESET": 4,
        "OPTIM.BATCH_SIZE": 150, "OPTIM.NUM_ITERATIONS": 70000,
        "OPTIM.LR": 0.015, "OPTIM.MOMENTUM": 0.9, "OPTIM.LR_DECAY_EVERY_N": 7,
        "OPTIM.LR_DECAY": 0.5, "OPTIM.LR_DECAY_START_EPOCH": 10,
        "OPTIM.WEIGHT_DECAY": 0.001, "OPTIM.CLIP_GRADIENTS": 12.5,
        "OPTIM.EPOCH_START_DECODER_TRAINING": 40000,
        "OPTIM.BEFORE_UPDATE_DECODER_EVERY": 30,
    }
    C = Config()
    for path, want in REF.items():
        node = C
        for p in path.split("."):
            node = getattr(node, p)
        assert node == want, f"{path}: {node!r} != reference {want!r}"
