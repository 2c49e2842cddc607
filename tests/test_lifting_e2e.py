"""End-to-end 3D lifting chain on geometrically consistent synthetic data.

Builds a scene with a known asset + a known 'human' cube, fabricates the
regression outputs (pixel-space verts/joints that are EXACT projections of
the true 3D geometry — what a perfect Hand4Whole would produce), then runs
the real CLI stages:

    render_objects -> [human_preds/human_segs fabricated]
    -> initialize_depth -> optimize_depth -> compute_metrics
    -> filter -> downsample -> extract -> inference

and checks the recovered geometry + affordance products. This exercises the
full multiview correction loop: depth-init deliberately displaces the human
along the camera ray; the multiview optimizer must pull it back.
"""
import glob
import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from coma_tpu.cli import compute_metrics as cli_metrics
from coma_tpu.cli import initialize_depth as cli_init
from coma_tpu.cli import optimize_depth as cli_opt
from coma_tpu.cli import render_objects as cli_render
from coma_tpu.geometry.mesh import save_obj
from coma_tpu.lifting.cameras import OrthoCamera, project_points
from coma_tpu.lifting.rasterizer import render_silhouette
from tests.test_geometry import CUBE_F, CUBE_V

SC, CAT = "Chair", "Lounge Chair / Cafe Chair / Office Chair"
SC_STR, CAT_STR = "Chair", "Lounge Chair : Cafe Chair : Office Chair"
ASSET = "0a5a346c-cc3b-4280-b358-ccd1c4d8a865"
PROMPT = "1 person sits on a chair"
RES = 64


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lifting_e2e")
    os.chdir(tmp)

    # asset obj: unit cube with y-up obj convention -> world z = y in [0, 1]
    obj_pth = str(tmp / "asset.obj")
    save_obj(obj_pth, CUBE_V, CUBE_F)

    cli_render.main([
        "--obj_pth", obj_pth, "--supercategory", SC, "--category", CAT,
        "--asset_id", ASSET, "--resolution", str(RES), str(RES),
        "--default_view_num", "2", "--default_stride_x", "0.5",
        "--default_stride_y", "0.5",
    ])

    cam_pths = sorted(glob.glob(f"results/generation/cameras/*/*/*/*.pickle"))
    assert len(cam_pths) == 2
    cameras = {}
    for p in cam_pths:
        view_id = p.split("/")[-1].rsplit(".", 1)[0]
        with open(p, "rb") as fh:
            d = pickle.load(fh)
        cameras[view_id] = (d, OrthoCamera(
            R=jnp.asarray(d["R"], jnp.float32),
            t=jnp.asarray(d["t"], jnp.float32).reshape(3),
            scale=float(d["scale"]), resolution=tuple(d["resolution"]),
        ))

    # world asset geometry (matches asset_to_world for a no-perturb camera)
    asset_world = CUBE_V @ np.array([[1, 0, 0], [0, 0, 1.0], [0, -1, 0]])
    # the true 'human': small cube next to the asset
    rng = np.random.default_rng(0)
    human_world = CUBE_V * 0.5 + np.array([1.3, -1.5, 0.1])
    joints_world = rng.uniform(size=(137, 3)) * 0.5 + np.array([1.3, -1.5, 0.1])

    # fabricate per-view human_preds (perfect-regressor pixel-space outputs)
    # and human_segs (the true occluded silhouette)
    for view_id, (cam_data, cam) in cameras.items():
        verts_px = np.asarray(project_points(cam, jnp.asarray(human_world, jnp.float32)))
        joints_px = np.asarray(project_points(cam, jnp.asarray(joints_world, jnp.float32)))
        pred = dict(
            verts=verts_px,
            faces=CUBE_F.astype(np.int64),
            pelvis=joints_px[0].copy(),
            smplx_data={},
            joints_proj=joints_px[:, :2].copy(),
            joints_img=joints_px.copy(),
            convert_data=dict(focals=[5000.0, 5000.0], princpt=[32, 32], z_mean=10.0),
        )
        pd = f"results/generation/human_preds/{SC_STR}/{CAT_STR}/{ASSET}/{view_id}/00000/{PROMPT}"
        os.makedirs(pd, exist_ok=True)
        with open(f"{pd}/00000.pickle", "wb") as fh:
            pickle.dump(pred, fh)

        mask = np.asarray(render_silhouette(
            cam, jnp.asarray(human_world, jnp.float32), jnp.asarray(CUBE_F),
            occluder_verts=jnp.asarray(asset_world, jnp.float32),
            occluder_faces=jnp.asarray(CUBE_F),
        ))
        ys, xs = np.nonzero(mask)
        seg = dict(
            pred_masks=mask[None],
            pred_boxes=np.array([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]], np.float32),
            scores=np.array([0.99], np.float32),
            pred_classes=np.zeros(1, np.int64),
            image_size=mask.shape,
        )
        sd = f"results/generation/human_segs/{SC_STR}/{CAT_STR}/{ASSET}/{view_id}/00000/{PROMPT}"
        os.makedirs(sd, exist_ok=True)
        with open(f"{sd}/00000.pickle", "wb") as fh:
            pickle.dump(seg, fh)

    return dict(tmp=str(tmp), obj_pth=obj_pth, human_world=human_world,
                cameras=cameras, asset_world=asset_world)


def test_render_outputs(scene):
    assert len(glob.glob("results/generation/renders/*/*/*/*.png")) == 2
    assert len(glob.glob("results/generation/asset_segs/*/*/*/*.png")) == 2
    assert len(glob.glob("results/generation/asset_masks/*/*/*/*/*.png")) > 4


def test_full_lifting_chain(scene):
    cli_init.main(["--asset_obj_pth", scene["obj_pth"]])
    before = glob.glob("results/generation/human_before_opt/*/*/*/*/*/*/*.pickle")
    assert len(before) == 2
    with open(before[0], "rb") as fh:
        init0 = pickle.load(fh)
    assert not isinstance(init0, str)
    assert init0["IoU"] is not None

    cli_opt.main(["--no_collision", "--minimum_inliers", "1"])
    after = sorted(glob.glob("results/generation/human_after_opt/*/*/*/*/*/*/*.pickle"))
    assert len(after) == 2
    recovered = 0
    for p in after:
        with open(p, "rb") as fh:
            opt = pickle.load(fh)
        if isinstance(opt, str):
            continue
        # the optimizer must pull the depth-init displacement back to truth
        err = np.abs(opt["verts"] - scene["human_world"]).max()
        assert err < 0.15, f"multiview correction failed: max err {err}"
        assert opt["num_inliers"] >= 1
        recovered += 1
    assert recovered == 2

    cli_metrics.main(["--asset_obj_pth", scene["obj_pth"], "--voxel_resolution", "24"])
    samples = sorted(glob.glob("results/generation/human_sample/*/*/*/*/*/*/*.pickle"))
    assert len(samples) == 2
    for p in samples:
        with open(p, "rb") as fh:
            s = pickle.load(fh)
        assert not isinstance(s, str)
        assert s["IoU"] > 0.8                       # re-rendered ≈ GT silhouette
        assert s["interscetion_ratio"] < 0.05       # disjoint human/asset
        assert "z_min" in s


def test_initialize_depth_filter_out_path(scene):
    """`--filter_out` (the closed BVH dead-code path): the collision
    pre-filter must either keep local-minimum candidates (dict output) or
    keep nothing and emit the reference's TOO_SMALL_HUMAN sentinel
    (initialize_depth.py:362-365); kernel_size=5 < 2*retrieval_range+1 so
    the window itself is non-degenerate."""
    from coma_tpu.core.sentinels import TOO_SMALL_HUMAN

    cli_init.main([
        "--asset_obj_pth", scene["obj_pth"], "--filter_out",
        "--kernel_size", "5", "--save_dir",
        "results/generation/human_before_opt_filtered",
    ])
    outs = glob.glob(
        "results/generation/human_before_opt_filtered/*/*/*/*/*/*/*.pickle")
    assert len(outs) == 2
    for p in outs:
        with open(p, "rb") as fh:
            sel = pickle.load(fh)
        if isinstance(sel, str):
            assert sel == TOO_SMALL_HUMAN
        else:
            assert sel["IoU"] is not None
            # kernel 5 over 7 candidates keeps at most 3 centers
            assert 0 <= sel["idx"] < 3


def test_filter_and_extract_consume_lifting_outputs(scene):
    from coma_tpu.pipelines.downsample import (
        downsample_human_template,
        save_human_downsample,
    )
    from coma_tpu.pipelines.extract import run_affordance_extraction
    from coma_tpu.pipelines.postfilter import run_post_filtering
    from coma_tpu.cli import downsample_objects as cli_ds

    stats = run_post_filtering(results_root="results")
    assert stats["leftover"] == 2

    meta = downsample_human_template(CUBE_V, CUBE_F, num_points=100)
    save_human_downsample(meta, 100, "constants/mesh")
    cli_ds.main([
        "--obj_pth", scene["obj_pth"], "--supercategory", SC, "--category", CAT,
        "--asset_id", ASSET, "--number_of_points", "16",
    ])

    hyper = dict(
        human_res="FULL", human_use_downsample_pcd_raw=False,
        object_res="16", object_use_downsample_pcd_raw=True,
        principle_vec=[0, 0, 1], sub_principle_vec=[0, 1, 0],
        rel_dist_method="dist", spatial_grid_size=0.07, spatial_grid_thres=2.0,
        normal_gaussian_sigma=0.25, normal_res=32, spatial_res=0, eps=1e-10,
        significant_contact_ratio=0.1, enable_postfilter=True,
        standardize_human_scale=False, scaler_range=(0.75, 1.25),
        visualize_type="aggr-human-contact", vis_example_num=0,
        quant_mode=False, quant_keys=[],
    )
    saved = run_affordance_extraction(
        hyperparams=hyper, hyperparams_key="qual:e2e", results_root="results",
        constants_mesh_dir="constants/mesh",
    )
    assert len(saved) == 1
    contact = np.load(saved[0])
    assert np.isfinite(contact).all()
    assert abs(contact.max() - 1.0) < 1e-5


def test_generate_3d_orchestrator_mixed_flags(scene):
    """The 3D orchestrator forwards one mixed flag list across init /
    optimize / metrics; each stage must read only its own flags (regression
    for the stage-flag filtering)."""
    from coma_tpu.cli import generate_3d_hoi_samples as orch

    orch.main([
        "--skip", "segment", "predict",
        "--asset_obj_pth", scene["obj_pth"],        # init + metrics flag
        "--no_collision", "--minimum_inliers", "1",  # optimize-only flags
        "--voxel_resolution", "24",                  # metrics-only flag
    ])
    samples = sorted(glob.glob("results/generation/human_sample/*/*/*/*/*/*/*.pickle"))
    assert len(samples) == 2
    with open(samples[0], "rb") as fh:
        s = pickle.load(fh)
    assert not isinstance(s, str) and s["IoU"] > 0.8


def test_learn_coma_orchestrator(scene):
    """learn_coma end to end through the orchestrator: filter ->
    downsample_human -> downsample_objects -> extract, one mixed flag list,
    with a tiny hyperparams key injected into the qual registry."""
    from coma_tpu.cli import generate_3d_hoi_samples as orch3d
    from coma_tpu.cli import learn_coma as orch
    from coma_tpu.config.hyperparams import QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT

    # self-sufficient when run in isolation: produce the lifting outputs
    orch3d.main([
        "--skip", "segment", "predict",
        "--asset_obj_pth", scene["obj_pth"],
        "--no_collision", "--minimum_inliers", "1", "--voxel_resolution", "24",
    ])

    key = "qual:_test_tiny_contact"
    QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT[key] = dict(
        QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT["qual:001"],
        affordance_kind="human_contact",
        human_res="FULL", human_use_downsample_pcd_raw=False,
        object_res="16", object_use_downsample_pcd_raw=True,
        normal_res=16, spatial_res=0,
        standardize_human_scale=False,
    )
    star_pth = os.path.join(scene["tmp"], "smplx_star.obj")
    save_obj(star_pth, CUBE_V, CUBE_F)
    try:
        orch.main([
            "--hyperparams_keys", key,
            "--object_resolutions", "16",
            "--obj_pth", scene["obj_pth"],           # downsample_objects flags
            "--supercategory", SC, "--category", CAT, "--asset_id", ASSET,
            "--smplx_star_pth", star_pth,            # downsample_human flags
            "--num_human_downsample_points_list", "8",
        ])
    finally:
        del QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT[key]
    out = glob.glob("results/coma/extracted_coma/*/*/*/*.pickle")
    assert out, "extracted ComA pickle missing"
