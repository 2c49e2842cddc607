"""End-to-end stage-3 pipeline test on a synthetic results tree.

Builds the reference's on-disk schema with tiny synthetic meshes, then runs
filter -> downsample (object + human) -> extract -> inference through the
actual CLI mains, checking every artifact the reference pipeline produces.
"""
import json
import os
import pickle

import numpy as np
import pytest

from coma_tpu.cli import downsample_objects as cli_downsample_objects
from coma_tpu.cli import extract_coma as cli_extract
from coma_tpu.cli import filter as cli_filter
from coma_tpu.cli import inference as cli_inference
from coma_tpu.geometry.mesh import save_obj
from coma_tpu.pipelines.downsample import downsample_human_template, save_human_downsample
from coma_tpu.utils.ply import read_ply_pointcloud
from tests.test_geometry import CUBE_F, CUBE_V

SC, CAT, ASSET = "BEHAVE", "backpack", "behave_asset"


def make_human(rng, offset):
    v = CUBE_V * 0.5 + np.asarray(offset) + rng.normal(scale=0.01, size=CUBE_V.shape)
    return v, CUBE_F


@pytest.fixture
def results_tree(tmp_path, rng):
    root = tmp_path / "results"
    constants = tmp_path / "constants" / "mesh"
    constants.mkdir(parents=True)

    # --- object asset ---
    obj_dir = tmp_path / "asset_src"
    obj_dir.mkdir()
    obj_pth = str(obj_dir / f"{ASSET}.obj")
    save_obj(obj_pth, CUBE_V, CUBE_F)

    # --- human samples: 6 good + 1 bad-IoU + 1 sentinel ---
    base = root / "generation" / "human_sample" / SC / CAT / ASSET
    cam_dir = root / "generation" / "cameras" / SC / CAT / ASSET
    cam_dir.mkdir(parents=True)
    prompts = ["a person carrying a backpack", "a person carrying a backpack, full body"]
    n_good = 0
    for view in ("000", "001"):
        with open(cam_dir / f"{view}.pickle", "wb") as fh:
            pickle.dump({"scale": 256.0}, fh)
        for prompt in prompts:
            for inpaint_id in ("00000", "00001"):
                d = base / view / "0" / prompt
                d.mkdir(parents=True, exist_ok=True)
                verts, faces = make_human(rng, offset=[0.2, 0.2, 1.0])
                payload = {
                    "verts": verts,
                    "faces": faces,
                    "IoU": 0.9,
                    "interscetion_ratio": 0.01,
                    "num_inliers": 5,
                }
                with open(d / f"{inpaint_id}.pickle", "wb") as fh:
                    pickle.dump(payload, fh)
                n_good += 1
    # a rejected sample (low IoU) and a sentinel error
    bad_dir = base / "002" / "0" / prompts[0]
    bad_dir.mkdir(parents=True)
    verts, faces = make_human(rng, offset=[0.2, 0.2, 1.0])
    with open(bad_dir / "00000.pickle", "wb") as fh:
        pickle.dump({"verts": verts, "faces": faces, "IoU": 0.1,
                     "interscetion_ratio": 0.01, "num_inliers": 5}, fh)
    with open(bad_dir / "00001.pickle", "wb") as fh:
        pickle.dump("NO HUMANS", fh)
    with open(cam_dir / "002.pickle", "wb") as fh:
        pickle.dump({"scale": 256.0}, fh)

    # --- human downsample metadata (synthetic "SMPL-X" = 8-vert cube) ---
    meta = downsample_human_template(CUBE_V, CUBE_F, num_points=100)  # FULL
    save_human_downsample(meta, 100, str(constants))

    return dict(root=str(root), constants=str(constants), obj_pth=obj_pth,
                tmp=str(tmp_path), n_good=n_good)


HYPER = dict(
    human_res="FULL",
    human_use_downsample_pcd_raw=False,
    object_res="16",
    object_use_downsample_pcd_raw=True,
    principle_vec=[0, 0, 1],
    sub_principle_vec=[0, 1, 0],
    rel_dist_method="dist",
    spatial_grid_size=0.07,
    spatial_grid_thres=0.5,
    normal_gaussian_sigma=0.25,
    normal_res=32,
    spatial_res=0,
    eps=1e-10,
    significant_contact_ratio=0.1,
    enable_postfilter=True,
    standardize_human_scale=False,
    scaler_range=(0.75, 1.25),
    visualize_type="aggr-human-contact",
    vis_example_num=0,
    quant_mode=False,
    quant_keys=[],
)


def run_stage3(results_tree, hyper, monkeypatch):
    from coma_tpu.pipelines.extract import run_affordance_extraction
    from coma_tpu.pipelines.postfilter import run_post_filtering

    monkeypatch.chdir(results_tree["tmp"])

    stats = run_post_filtering(results_root="results")
    cli_downsample_objects.main([
        "--obj_pth", results_tree["obj_pth"],
        "--supercategory", SC, "--category", CAT, "--asset_id", ASSET,
        "--number_of_points", str(hyper["object_res"]),
        "--save_dir", "results/coma/asset_downsample",
    ])
    saved = run_affordance_extraction(
        hyperparams=hyper,
        hyperparams_key="qual:test",
        results_root="results",
        constants_mesh_dir=results_tree["constants"],
    )
    return stats, saved


def test_full_stage3_pipeline(results_tree, monkeypatch):
    stats, saved = run_stage3(results_tree, HYPER, monkeypatch)

    # filter: 8 good survive, 1 rejected by IoU, sentinel skipped entirely
    assert stats["initial"] == results_tree["n_good"] + 1
    assert stats["rejected_iou"] == 1
    assert stats["leftover"] == results_tree["n_good"]

    wl_path = "results/coma/human_postfilterings/BEHAVE/backpack/behave_asset/a person carrying a backpack.json"
    with open(wl_path) as fh:
        assert len(json.load(fh)) == results_tree["n_good"]

    # extract: coma pickle + json + product
    coma_pickle = "results/coma/extracted_coma/BEHAVE/backpack/behave_asset/qual:test:a person carrying a backpack.pickle"
    assert os.path.exists(coma_pickle)
    assert len(saved) == 1
    contact = np.load(saved[0])
    assert contact.shape[0] > 0
    assert np.isclose(contact.max(), 1.0)
    assert (contact >= 0).all()

    # inference CLI re-derives the same product from the pickle
    cli_inference_out = np.load(_run_inference(results_tree, coma_pickle))
    np.testing.assert_allclose(cli_inference_out, contact, rtol=1e-6)


def _run_inference(results_tree, coma_pickle):
    from coma_tpu.pipelines.inference import inference

    out = inference(
        supercategory=SC,
        category=CAT,
        coma_path=coma_pickle,
        smplx_downsample_pth=f"{results_tree['constants']}/smplx_star_downsampled_FULL.pickle",
        asset_downsample_pth=f"results/coma/asset_downsample/{SC}/{CAT}/{ASSET}_16.pickle",
        visualize_type="aggr-human-contact",
        hyperparams=HYPER,
        output_dir="output",
    )
    return out


def test_object_contact_product(results_tree, monkeypatch):
    hyper = dict(HYPER, visualize_type="aggr-object-contact")
    _, saved = run_stage3(results_tree, hyper, monkeypatch)
    points, normals, colors = read_ply_pointcloud(saved[0])
    assert len(points) == len(colors)
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    assert normals is not None


def test_occupancy_product(results_tree, monkeypatch):
    hyper = dict(HYPER, visualize_type="occupancy", spatial_res=8, normal_res=0)
    _, saved = run_stage3(results_tree, hyper, monkeypatch)
    info = np.load(saved[0], allow_pickle=True).item()
    assert info["prob_field"].shape == (8, 8, 8)
    assert np.isclose(info["prob_field"].max(), 0.7)
    assert info["spatial_grid_metadata"]["N_x"] == 8


def test_orientation_product(results_tree, monkeypatch):
    hyper = dict(HYPER, visualize_type="orientation")
    _, saved = run_stage3(results_tree, hyper, monkeypatch)
    score = np.load(saved[0])
    assert np.isclose(score.min(), 0.0) and np.isclose(score.max(), 1.0)


def test_skip_done_reloads_pickle(results_tree, monkeypatch):
    from coma_tpu.pipelines.extract import run_affordance_extraction

    _, saved1 = run_stage3(results_tree, HYPER, monkeypatch)
    # second run with skip_done must reuse the exported state
    saved2 = run_affordance_extraction(
        hyperparams=HYPER,
        hyperparams_key="qual:test",
        results_root="results",
        constants_mesh_dir=results_tree["constants"],
        skip_done=True,
    )
    np.testing.assert_allclose(np.load(saved1[0]), np.load(saved2[0]), rtol=1e-6)
