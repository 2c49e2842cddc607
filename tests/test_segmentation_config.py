"""Segmentation config surface (``config/segmentation.py`` ←
``constants/segmentation.py`` + ``segment_human.py:170-182``)."""
import pytest

from coma_tpu.config.segmentation import (
    COCO_CLASS_ID2NAME,
    COCO_CLASS_NAME2ID,
    COCO_THING_CLASSES,
    PERSON_CLASS_ID,
    run_mode_supported,
)


def test_coco_map_shape_and_person_id():
    assert len(COCO_THING_CLASSES) == 80
    assert PERSON_CLASS_ID == 0
    assert COCO_CLASS_ID2NAME[0] == "person"
    assert COCO_CLASS_NAME2ID["backpack"] == 24  # a CHORUS/ComA category
    assert COCO_CLASS_ID2NAME[79] == "toothbrush"


def test_mode_dispatch_mirrors_reference():
    assert run_mode_supported("coco")
    assert not run_mode_supported("lvis")
    assert not run_mode_supported("odise")
    with pytest.raises(AssertionError):
        run_mode_supported("other")


def test_cli_rejects_lvis_mode(tmp_path):
    from coma_tpu.cli import segment_human

    with pytest.raises(NotImplementedError):
        segment_human.main([
            "--inpaint_dir", str(tmp_path), "--save_dir", str(tmp_path),
            "--mode", "lvis",
        ])
