"""Tests for the BEHAVE toolkit + GT evaluation path."""
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from coma_tpu.affordance.contact import contact_update
from coma_tpu.affordance.state import init_coma_state
from coma_tpu.pipelines.behave_eval import (
    KinectCalib,
    evaluate_against_gt,
    prepare_affordance_extraction_inputs_for_behave,
)
from tests.test_geometry import CUBE_F, CUBE_V


def make_calib():
    return KinectCalib.from_json({
        "color": dict(fx=900.0, fy=900.0, cx=1024.0, cy=768.0, width=2048,
                      height=1536, opencv=[0, 0, 0, 0, 0.1, -0.05, 0, 0, 0, 0, 0, 0, 0]),
        "depth": dict(fx=500.0, fy=500.0, cx=256.0, cy=256.0, width=512,
                      height=512, opencv=[0] * 12),
        "depth_to_color": dict(rotation=list(np.eye(3).ravel()), translation=[0, 0, 0]),
        "color_to_depth": dict(rotation=list(np.eye(3).ravel()), translation=[0, 0, 0]),
    })


def test_kinect_projection_center():
    calib = make_calib()
    px = calib.project_points(np.array([[0.0, 0.0, 2.0]]))
    np.testing.assert_allclose(px[0], [1024.0, 768.0], atol=1e-6)
    # off-axis point lands off-center, distortion bends it
    px2 = calib.project_points(np.array([[0.5, 0.0, 2.0]]))
    assert px2[0, 0] > 1024.0


def test_dmap2pc():
    calib = make_calib()
    calib.pc_table = np.ones((4, 4, 2)) * 0.5
    depth = np.full((4, 4), 1000, np.uint16)  # 1 m everywhere
    depth[0, 0] = 0
    pc = calib.dmap2pc(depth)
    assert pc.shape == (15, 3)
    np.testing.assert_allclose(pc[0], [0.5, 0.5, 1.0])


def test_behave_gt_prep(tmp_path, rng):
    # human pickle
    hv = CUBE_V * 0.5 + [1.0, 0.0, 0.0]
    with open(tmp_path / "human.pickle", "wb") as fh:
        pickle.dump(dict(verts=hv, faces=CUBE_F), fh)
    # downsample metadata
    human_meta = dict(downsample_indices=list(range(8)), N=8)
    obj_meta = dict(
        obj_vertices_original=CUBE_V,
        obj_faces_original=CUBE_F,
        obj_vertex_normals_original=rng.normal(size=(8, 3)),
        downsample_indices=list(range(8)),
        N=8, N_raw=8,
        downsampled_pcd_points_raw=CUBE_V.copy(),
        downsampled_pcd_normal_raw=rng.normal(size=(8, 3)),
    )
    # canonicalization pickles
    with open(tmp_path / "center.pickle", "wb") as fh:
        pickle.dump(dict(obj_lowres_center=np.array([0.5, 0.5, 0.5])), fh)
    with open(tmp_path / "r2n.pickle", "wb") as fh:
        pickle.dump(dict(R_raw2normal=np.eye(3), t_raw2normal=np.zeros(3)), fh)
    angle = np.array([0.0, 0.0, np.pi / 2])
    with open(tmp_path / "fit.pickle", "wb") as fh:
        pickle.dump(dict(angle=angle, trans=np.array([1.0, 2.0, 3.0])), fh)

    out = prepare_affordance_extraction_inputs_for_behave(
        human_mesh_pth=str(tmp_path / "human.pickle"),
        human_mesh_pth_type="pickle",
        human_downsample_metadata=human_meta,
        object_downsample_metadata=obj_meta,
        human_use_downsample_pcd_raw=False,
        object_use_downsample_pcd_raw=True,
        lowres_center_pth=str(tmp_path / "center.pickle"),
        raw2normal_pth=str(tmp_path / "r2n.pickle"),
        obj_param_pth=str(tmp_path / "fit.pickle"),
        eps=1e-8,
    )
    assert out["human_verts"].shape == (8, 3)
    assert out["obj_verts"].shape == (8, 3)
    # the centered cube corner (-0.5,-0.5,-0.5) rotated 90° about z -> (0.5,-0.5,-0.5),
    # then translated by (1,2,3)
    np.testing.assert_allclose(out["obj_verts"][0], [1.5, 1.5, 2.5], atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(out["obj_normals"], axis=-1), 1.0, atol=1e-5
    )


def test_evaluate_against_gt(rng):
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)

    def agg(seed):
        state = init_coma_state(8, 6, 16, 0.07, 0.5)
        r = np.random.default_rng(seed)
        return contact_update(
            state,
            jnp.asarray(r.normal(size=(8, 3)) * 0.1, jnp.float32),
            jnp.asarray(unit(r.normal(size=(8, 3))), jnp.float32),
            jnp.asarray(r.normal(size=(6, 3)) * 0.1, jnp.float32),
            jnp.asarray(unit(r.normal(size=(6, 3))), jnp.float32),
        )

    same = evaluate_against_gt(agg(0), agg(0))
    assert abs(same["aggr_human_contact_metrics"]["sim"] - 1.0) < 1e-5
    assert same["aggr_human_contact_metrics"]["mae"] < 1e-8
    diff = evaluate_against_gt(agg(0), agg(1))
    assert diff["aggr_object_contact_metrics"]["sim"] < 1.0


def test_evaluate_cli(tmp_path, rng):
    from coma_tpu.affordance.io import save_coma_state
    from coma_tpu.cli import evaluate as cli_eval

    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    state = init_coma_state(8, 6, 16, 0.07, 0.5)
    state = contact_update(
        state,
        jnp.asarray(rng.normal(size=(8, 3)) * 0.1, jnp.float32),
        jnp.asarray(unit(rng.normal(size=(8, 3))), jnp.float32),
        jnp.asarray(rng.normal(size=(6, 3)) * 0.1, jnp.float32),
        jnp.asarray(unit(rng.normal(size=(6, 3))), jnp.float32),
    )
    p = str(tmp_path / "coma.pickle")
    save_coma_state(state, p)
    out = str(tmp_path / "metrics.json")
    cli_eval.main(["--pred_coma", p, "--gt_coma", p, "--out_json", out])
    import json

    metrics = json.load(open(out))
    assert abs(metrics["aggr_human_contact_metrics"]["sim"] - 1.0) < 1e-5


def test_behave_sequence_reader(tmp_path, rng):
    """Synthetic BEHAVE sequence tree -> BehaveSequence reads frames, fits,
    images, point clouds."""
    import json

    from PIL import Image

    from coma_tpu.pipelines.behave_eval import BehaveSequence, SeqInfo
    from coma_tpu.utils.ply import write_ply_pointcloud

    seq = tmp_path / "Date03_Sub04_chairwood"
    seq.mkdir()
    json.dump(
        dict(cat="chairwood", gender="male", kinects=[0, 1], beta=[0.0] * 10,
             config="calibs/config", empty=None, intrinsic="calibs/intrinsics"),
        open(seq / "info.json", "w"),
    )
    # frames deliberately out of lexicographic order: t0010.000 < t0002.000 lexic.
    for name in ("t0010.000", "t0002.000", "t0002.001"):
        f = seq / name
        f.mkdir()
        for kid in range(2):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(f / f"k{kid}.color.jpg")
            Image.fromarray(np.full((8, 8), 1000, np.uint16)).save(f / f"k{kid}.depth.png")
        (f / "person" / "fit02").mkdir(parents=True)
        pickle.dump(dict(pose=np.zeros(72), betas=np.zeros(10), trans=np.ones(3)),
                    open(f / "person" / "fit02" / "person_fit.pkl", "wb"))
        write_ply_pointcloud(str(f / "person" / "person.ply"),
                             rng.normal(size=(5, 3)).astype(np.float32))
        (f / "chair" / "fit01").mkdir(parents=True)
        pickle.dump(dict(angle=np.array([0.1, 0.2, 0.3]), trans=np.zeros(3)),
                    open(f / "chair" / "fit01" / "chair_fit.pkl", "wb"))

    reader = BehaveSequence(str(seq))
    assert len(reader) == 3
    assert reader.frames == ["t0002.000", "t0002.001", "t0010.000"]  # numeric sort
    assert reader.seq_info.get_obj_name(convert=True) == "chair"
    assert reader.kids == [0, 1]
    assert reader.get_color_image(0, 1).shape == (8, 8, 3)
    assert reader.get_depth_image(0, 0).dtype == np.uint16
    angle, trans = reader.get_objfit_params(0, "fit01")
    np.testing.assert_allclose(angle, [0.1, 0.2, 0.3])
    pose, betas, tr = reader.get_smplfit_params(2, "fit02")
    assert pose.shape == (72,) and np.all(tr == 1.0)
    assert reader.get_person_pointcloud(1).shape == (5, 3)
    assert reader.times2indices(["t0010.000", "t0002.000"]) == [2, 0]
    # missing fit -> graceful Nones
    assert reader.get_objfit_params(0, "nope") == (None, None)


def test_frame_data_reader_surface(tmp_path, rng):
    """The full KinectFrameReader/FrameDataReader surface
    (``behave.py:479-834``): multi-kinect batch access, background-filtered
    depth, timestamps, mocap json, 2D/3D keypoints, mask fallback chain,
    scan pc path schema, and depth->pointcloud through the calibration."""
    import json

    from PIL import Image

    from coma_tpu.pipelines.behave_eval import (
        BehaveSequence,
        KinectCalib,
        remove_background_depth,
        sequence_background_depth,
    )

    seq = tmp_path / "Date01_Sub01_backpack"
    seq.mkdir()
    json.dump(
        dict(cat="backpack", gender="male", kinects=[0, 1], beta=[0.0] * 10,
             config="c", empty=None, intrinsic="i"),
        open(seq / "info.json", "w"),
    )
    empty = tmp_path / "Date01_empty"
    for t, depth_val in (("t0001.000", 2000), ("t0002.000", 2000)):
        f = empty / t
        f.mkdir(parents=True)
        for kid in range(2):
            Image.fromarray(np.full((8, 8), depth_val, np.uint16)).save(
                f / f"k{kid}.depth.png")

    f = seq / "t0003.000"
    f.mkdir()
    for kid in range(2):
        Image.fromarray(np.full((8, 8, 3), 100, np.uint8)).save(
            f / f"k{kid}.color.jpg")
        depth = np.full((8, 8), 2000, np.uint16)
        depth[2:4, 2:4] = 1500   # foreground blob 500mm off the background
        Image.fromarray(depth).save(f / f"k{kid}.depth.png")
    json.dump(dict(pose=list(range(72)), betas=list(range(10))),
              open(f / "k1.mocap.json", "w"))
    json.dump(dict(body_joints=[10.0, 20.0, 0.9, 30.0, 40.0, 0.2]),
              open(f / "k0.color.json", "w"))
    (f / "person").mkdir()
    json.dump(dict(body_joints3d=[1.0, 2.0, 3.0, 0.8]),
              open(f / "person" / "person_J3d.json", "w"))
    mask = np.zeros((8, 8), np.uint8)
    mask[2:4, 2:4] = 255
    Image.fromarray(mask).save(f / "k0.person_mask.jpg")   # jpg fallback
    Image.fromarray(mask).save(f / "k1.obj_mask.png")      # obj_mask fallback

    reader = BehaveSequence(str(seq), empty=str(empty))
    colors, depths = reader[0]
    assert len(colors) == 2 and colors[0].shape == (8, 8, 3)
    # background-filtered: background pixels zeroed, blob kept
    assert depths[0][0, 0] == 0 and depths[0][2, 2] == 1500
    assert reader.get_timestamps() == [3.0]
    assert reader.frame_time(0) == "t0003.000"
    assert reader.get_frame_idx("t0003.000") == 0
    assert reader.get_frame_idx("t9999.000") == -1
    assert reader.cvt_end(None) == 1 and reader.cvt_end(99) == 1

    np.testing.assert_array_equal(reader.get_mocap_pose(0, kid=1),
                                  np.arange(72))
    assert reader.get_mocap_pose(0, kid=0) is None
    kpts = reader.get_body_kpts(0, kid=0, tol=0.5)
    assert kpts.shape == (2, 3)
    assert kpts[1, 2] == 0.0   # below-tolerance confidence zeroed
    np.testing.assert_allclose(reader.get_body_j3d(0), [[1, 2, 3, 0.8]])

    # mask fallback chains: person png->jpg, obj rend_mask->obj_mask
    assert reader.get_mask_file(0, 0, "person").endswith(".jpg")
    assert reader.get_mask(0, 0, "person").sum() == 4
    assert reader.get_mask_file(0, 1, "obj").endswith("obj_mask.png")
    assert reader.get_person_mask(0)[1] is None   # k1 has no person mask

    assert reader.get_pcpath(0, "obj").endswith("backpack/backpack.ply")
    assert not reader.pc_exists(0, "obj")
    assert reader.get_pc(0, "obj") is None
    assert reader.get_pcfiles([0], "person") == [reader.get_pcpath(0, "person")]

    # depth -> pointcloud through the calibration table
    table = rng.normal(size=(8, 8, 2))
    calib = KinectCalib(
        calibration_matrix=np.eye(3), dist_coeffs=np.zeros(4),
        image_size=(8, 8), depth_matrix=np.eye(3),
        depth2color_R=np.eye(3), depth2color_t=np.zeros(3), pc_table=table)
    pc = reader.get_pointcloud(0, 0, calib)
    assert pc.shape == (64, 3)
    np.testing.assert_allclose(pc[0, 2], 2.0)   # 2000mm -> 2m

    # background model averages the empty sequence
    bkg = sequence_background_depth(str(empty), 0)
    np.testing.assert_allclose(bkg, 2000.0)
    filtered = remove_background_depth(np.full((8, 8), 2010, np.uint16),
                                       bkg, tol=30)
    assert filtered.sum() == 0


def test_kinect_calib_depth_color_machinery(rng):
    """pc2color round trips, hole filling, pc2dmap reprojection
    (``behave.py:107-198``)."""
    from coma_tpu.pipelines.behave_eval import KinectCalib

    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    calib = KinectCalib(
        calibration_matrix=K, dist_coeffs=np.zeros(4), image_size=(64, 64),
        depth_matrix=K, depth2color_R=np.eye(3),
        depth2color_t=np.zeros(3), pc_table=None)

    pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.05, 1.5]])
    pix = calib.pc2color(pts)
    np.testing.assert_allclose(pix[0], [32, 32])
    valid_pix, valid_pts = calib.pc2color_valid(
        np.vstack([pts, [[5.0, 5.0, 1.0]]]))   # last point projects far out
    assert len(valid_pts) == 2

    # hole filling: zeros vanish, non-zero values survive untouched
    depth = np.full((4, 4), 7.0)
    depth[1, 1] = 0.0
    filled = calib.interpolate_depth(depth.copy())
    assert filled[1, 1] == 7.0 and (filled == 7.0).all()

    # pc2dmap: nearest-grid reprojection puts each depth at its pixel
    grid = np.stack(np.meshgrid(np.linspace(-0.2, 0.2, 5),
                                np.linspace(-0.2, 0.2, 5)), -1).reshape(-1, 2)
    pts3 = np.concatenate([grid, np.full((25, 1), 2.0)], -1)
    dmap = calib.pc2dmap(pts3)
    assert dmap.shape == (64, 64)
    np.testing.assert_allclose(dmap[32, 32], 2.0)

    # color sampling + weighted lift back to 3D
    color = np.tile(np.arange(64, dtype=np.float64)[None, :, None] * 4,
                    (64, 1, 3))
    cols = calib.get_pc_colors(pts, color)
    assert cols.shape == (2, 3) and (0 <= cols).all() and (cols <= 1).all()
    many = np.concatenate(
        [rng.uniform(-0.2, 0.2, size=(6, 2)), np.full((6, 1), 2.0)], -1)
    lifted = calib.color_to_pc(calib.pc2color(many), many)
    # each pixel's nearest projected point is itself; the k=4 blend pulls
    # toward neighbors, so just check the lift lands near the true points
    assert np.abs(lifted - many).max() < 0.5


def test_prepare_inputs_object_mesh_crosscheck(tmp_path, rng):
    """object_mesh_for_check_pth: the redundant-load assertion
    (utils/coma.py:694-699) passes on a matching OBJ and trips on a
    mismatched one."""
    from coma_tpu.geometry.mesh import save_obj
    from coma_tpu.pipelines.affordance_inputs import (
        prepare_affordance_extraction_inputs,
    )

    hv = CUBE_V * 0.5
    with open(tmp_path / "human.pickle", "wb") as fh:
        pickle.dump(dict(verts=hv, faces=CUBE_F), fh)
    human_meta = dict(downsample_indices=list(range(8)), N=8)
    obj_meta = dict(
        obj_vertices_original=CUBE_V.astype(np.float64),
        obj_faces_original=CUBE_F,
        obj_vertex_normals_original=rng.normal(size=(8, 3)),
        downsample_indices=list(range(8)), N=8,
    )
    good = str(tmp_path / "obj.obj")
    save_obj(good, CUBE_V, CUBE_F)
    out = prepare_affordance_extraction_inputs(
        human_mesh_pth=str(tmp_path / "human.pickle"),
        human_downsample_metadata=human_meta,
        object_downsample_metadata=obj_meta,
        human_use_downsample_pcd_raw=False,
        object_use_downsample_pcd_raw=False,
        eps=1e-8,
        object_mesh_for_check_pth=good,
    )
    assert out["obj_verts"].shape == (8, 3)

    bad = str(tmp_path / "bad.obj")
    save_obj(bad, CUBE_V + 0.5, CUBE_F)
    with pytest.raises(AssertionError):
        prepare_affordance_extraction_inputs(
            human_mesh_pth=str(tmp_path / "human.pickle"),
            human_downsample_metadata=human_meta,
            object_downsample_metadata=obj_meta,
            human_use_downsample_pcd_raw=False,
            object_use_downsample_pcd_raw=False,
            eps=1e-8,
            object_mesh_for_check_pth=bad,
        )
