"""CHORUS keypoint-filter grammar (``config/filtering.py`` ←
``constants/filtering.py:1-76``)."""
import pytest

from coma_tpu.config.filtering import (
    DEFAULT_KEYPOINT_FILTER_NUM,
    KEYPOINT_FILTERS,
    keypoint_filter_passes,
    parse_keypoint_filter,
)


def test_table_matches_reference_shape():
    assert set(KEYPOINT_FILTERS) == set(range(1, 16))
    for num, (coco, wb) in KEYPOINT_FILTERS.items():
        assert coco.count("|") == 1
        assert wb == "|"  # every shipped wholebody member is permissive
        parse_keypoint_filter(coco)  # grammar must parse
    assert DEFAULT_KEYPOINT_FILTER_NUM == 3


def test_filter_3_full_body_semantics():
    """#3: one of shoulders AND one of hips required, nothing banned."""
    assert keypoint_filter_passes(3, {"left_shoulder", "right_hip_extra"})
    assert keypoint_filter_passes(3, {"right_shoulder", "left_hip_extra", "nose"})
    assert not keypoint_filter_passes(3, {"left_shoulder"})  # no hip
    assert not keypoint_filter_passes(3, {"left_hip_extra"})  # no shoulder


def test_filter_1_face_bans_lower_body():
    """#1: all five face points required, lower body banned, hands allowed."""
    face = {"nose", "left_eye", "right_eye", "left_ear", "right_ear"}
    assert keypoint_filter_passes(1, face | {"left_wrist"})
    assert not keypoint_filter_passes(1, face | {"left_knee"})
    assert not keypoint_filter_passes(1, face - {"nose"})


def test_filter_12_side_view_groups():
    """#12 groups eyes (either) and ear-or-nose, so a side view passes."""
    assert keypoint_filter_passes(12, {"left_eye", "left_ear"})
    assert keypoint_filter_passes(12, {"right_eye", "nose"})
    assert not keypoint_filter_passes(12, {"left_ear", "nose"})  # no eye
    assert not keypoint_filter_passes(12, {"left_eye", "left_hip_extra"})


def test_filter_9_left_hand_only():
    assert keypoint_filter_passes(9, {"left_wrist", "left_elbow"})
    assert not keypoint_filter_passes(9, {"left_wrist", "right_wrist"})


def test_filter_15_accepts_everything():
    assert keypoint_filter_passes(15, set())
    assert keypoint_filter_passes(15, {"anything", "at", "all"})


def test_mapping_input_and_wholebody_member():
    vis = {"left_shoulder": True, "left_hip_extra": True, "nose": False}
    assert keypoint_filter_passes(3, vis)
    # the wholebody member of every filter accepts anything
    assert keypoint_filter_passes(1, {"left_knee"}, wholebody=True)


def test_parse_rejects_double_bar():
    with pytest.raises(ValueError):
        parse_keypoint_filter("a | b | c")
