"""Hermetic 2D HOI generation smoke: the full generate_2d_hoi_images
orchestrator (render -> select_mask -> prompts -> inpaint) through the real
CLI mains with tiny random-weight models."""
import glob
import os

import numpy as np
import pytest

from coma_tpu.geometry.mesh import save_obj
from tests.test_geometry import CUBE_F, CUBE_V

SC, CAT = "Chair", "Lounge Chair / Cafe Chair / Office Chair"
SC_STR, CAT_STR = "Chair", "Lounge Chair : Cafe Chair : Office Chair"
ASSET = "0a5a346c-cc3b-4280-b358-ccd1c4d8a865"


@pytest.mark.slow
def test_generate_2d_hoi_images_tiny(tmp_path, monkeypatch):
    from coma_tpu.cli import generate_prompts as cli_prompts
    from coma_tpu.cli import inpaint as cli_inpaint
    from coma_tpu.cli import render_objects as cli_render
    from coma_tpu.cli import select_mask as cli_select

    monkeypatch.chdir(tmp_path)
    obj_pth = str(tmp_path / "asset.obj")
    save_obj(obj_pth, CUBE_V, CUBE_F)

    cli_render.main([
        "--obj_pth", obj_pth, "--supercategory", SC, "--category", CAT,
        "--asset_id", ASSET, "--resolution", "64", "64",
        "--default_view_num", "2", "--default_perturb_sample_num", "1",
        "--default_stride_x", "0.5", "--default_stride_y", "0.5",
    ])
    assert len(glob.glob("results/generation/renders/*/*/*/*.png")) == 2

    # select masks with a permissive band (the synthetic masks don't match
    # the BEHAVE [0.55, 0.59] band on a cube)
    cli_select.main(["--default_min_seg_overlap_ratio", "0.0",
                     "--default_max_seg_overlap_ratio", "1.0"])
    vm = glob.glob("results/generation/valid_masks/*/*/*/*.pickle")
    assert len(vm) == 2

    cli_prompts.main([])
    assert os.path.exists(
        f"results/generation/prompts/{SC_STR}/{CAT_STR}/{ASSET}/prompts.pickle"
    )

    # one mask x one prompt x one seed through the tiny adaptive-mask pipeline
    import pickle

    for p in vm:
        with open(p, "rb") as fh:
            d = pickle.load(fh)
        # Chair's configured overlap band ([0.8, 0.9]) overrides the CLI
        # defaults and rejects the synthetic cube's masks — pick mask 0
        # directly (the smoke tests plumbing, not mask selection quality)
        d["valid_mask_ids"] = (d["valid_mask_ids"] or ["00000"])[:1]
        with open(p, "wb") as fh:
            pickle.dump(d, fh)
    # restrict prompts to one
    pp = f"results/generation/prompts/{SC_STR}/{CAT_STR}/{ASSET}/prompts.pickle"
    with open(pp, "rb") as fh:
        prompts = pickle.load(fh)
    prompts["prompts"] = prompts["prompts"][:1]
    with open(pp, "wb") as fh:
        pickle.dump(prompts, fh)

    cli_inpaint.main([
        "--random_weights", "--tiny", "--num_img_per_combination", "1",
        "--default_ddim_steps", "50", "--batch_size", "4",
    ])
    outs = glob.glob("results/generation/inpaintings/*/*/*/*/*/*/*.png")
    # 2 views x 1 mask x 1 prompt x 2 viewpoint augs x 1 seed
    assert len(outs) == 4
    from PIL import Image

    img = np.asarray(Image.open(outs[0]))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_filter_known_args():
    import argparse

    from coma_tpu.cli._common import filter_known_args

    p = argparse.ArgumentParser()
    p.add_argument("--a", type=str)
    p.add_argument("--flag", action="store_true")
    p.add_argument("--pair", type=int, nargs=2)
    p.add_argument("--many", type=str, nargs="+")
    argv = ["--unknown", "x", "y", "--a", "1", "--flag", "--pair", "2", "3",
            "--many", "m1", "m2", "--other=z", "--a=override"]
    out = filter_known_args(p, argv)
    assert out == ["--a", "1", "--flag", "--pair", "2", "3",
                   "--many", "m1", "m2", "--a=override"]
    # the filtered list must parse cleanly
    ns = p.parse_args(out)
    assert ns.a == "override" and ns.flag and ns.pair == [2, 3]


@pytest.mark.slow
def test_generate_2d_orchestrator_mixed_flags(tmp_path, monkeypatch):
    """The orchestrator forwards one mixed flag list; each stage must read
    only its own flags (regression: select_mask used to crash on render's
    --obj_pth)."""
    from coma_tpu.cli import generate_2d_hoi_images as orch

    monkeypatch.chdir(tmp_path)
    obj_pth = str(tmp_path / "asset.obj")
    save_obj(obj_pth, CUBE_V, CUBE_F)
    orch.main([
        "--skip", "prompts", "inpaint",
        "--obj_pth", obj_pth, "--supercategory", SC, "--category", CAT,
        "--asset_id", ASSET, "--resolution", "64", "64",
        "--default_view_num", "2", "--default_perturb_sample_num", "1",
        "--default_stride_x", "0.5", "--default_stride_y", "0.5",
        "--default_min_seg_overlap_ratio", "0.0",
        "--default_max_seg_overlap_ratio", "1.0",
    ])
    assert len(glob.glob("results/generation/renders/*/*/*/*.png")) == 2
    assert len(glob.glob("results/generation/valid_masks/*/*/*/*.pickle")) == 2
