"""ConstraintFilter tests (hierarchy NMS semantics of constraints.py:56-209)."""

import json

import numpy as np
import pytest

from style_seqcvae_tpu.decoding.constraint_filter import ConstraintFilter


@pytest.fixture
def hierarchy(tmp_path):
    h = {
        "LabelName": "entity",
        "Subcategory": [
            {"LabelName": "animal",
             "Subcategory": [{"LabelName": "dog"}, {"LabelName": "cat"}]},
            {"LabelName": "vehicle", "Subcategory": [{"LabelName": "car"}]},
        ],
    }
    p = tmp_path / "hierarchy.json"
    p.write_text(json.dumps(h))
    return str(p)


def test_blacklist_and_topk(hierarchy):
    f = ConstraintFilter(hierarchy, max_given_constraints=2)
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110],
                      [200, 200, 210, 210], [300, 300, 310, 310]], float)
    names = ["dog", "person", "car", "cat"]  # person is blacklisted
    scores = np.array([0.9, 0.99, 0.8, 0.7])
    out = f(boxes, names, scores)
    assert "person" not in out
    assert set(out) <= {"dog", "car", "cat"}
    assert len(out) == 2                      # top-2 by score: dog, car
    assert set(out) == {"dog", "car"}


def test_hierarchy_nms_faithful_reference_semantics(hierarchy):
    """FAITHFUL-DEFECT NOTE: the reference's hierarchy NMS
    (constraints.py:155-209) sorts ascending by height and keeps boxes with
    height >= the current box's height — which is every remaining box, so
    NO suppression ever fires (verified by executing the reference logic).
    We mirror that observable behavior; the docstring's intended
    'dog suppresses mammal' never happens in the reference either."""
    f = ConstraintFilter(hierarchy, nms_threshold=0.85, max_given_constraints=3)
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float)
    out = f(boxes, ["dog", "animal"], np.array([0.5, 0.9]))
    assert set(out) == {"dog", "animal"}
    # non-overlapping boxes: both kept
    boxes2 = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], float)
    out2 = f(boxes2, ["dog", "animal"], np.array([0.5, 0.9]))
    assert set(out2) == {"dog", "animal"}


def test_replacements(hierarchy):
    f = ConstraintFilter(hierarchy, max_given_constraints=3)
    boxes = np.array([[0, 0, 10, 10]], float)
    out = f(boxes, ["kitchen & dining room table"], np.array([0.9]))
    assert out == ["table"]


def test_zero_score_padding_dropped(hierarchy):
    f = ConstraintFilter(hierarchy, max_given_constraints=3)
    boxes = np.array([[0, 0, 10, 10], [0, 0, 0, 0]], float)
    out = f(boxes, ["dog", "cat"], np.array([0.9, 0.0]))
    assert out == ["dog"]
