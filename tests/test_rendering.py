"""Tests for the Blender-free rendering stage + mask selection + postprocess."""
import numpy as np
import jax.numpy as jnp
import pytest

from coma_tpu.pipelines.mask_select import select_valid_masks
from coma_tpu.pipelines.postprocess import (
    intersection_over_maximum,
    intersection_over_union,
    local_to_global_cam,
    process_remove_overlap,
    process_segmentation,
)
from coma_tpu.pipelines.rendering import (
    build_camera_ring,
    candidate_mask_grid,
    euler_xyz_to_matrix,
    render_object_views,
    render_points_px,
    sample_perturbations,
    save_camera_pickle,
    _matrix_to_euler_xyz,
)
from coma_tpu.lifting.cameras import OrthoCamera, project_points
from tests.test_geometry import CUBE_F, CUBE_V


def test_euler_roundtrip(rng):
    for _ in range(10):
        angles = rng.uniform(-1.2, 1.2, size=3)
        R = euler_xyz_to_matrix(*angles)
        back = _matrix_to_euler_xyz(R)
        np.testing.assert_allclose(back, angles, atol=1e-6)


def test_camera_ring_geometry():
    cams = build_camera_ring(length_z=1.0, ortho_scale_world=2.0, view_num=4,
                             elevation_deg=15.0, z_scale=2.0)
    assert len(cams) == 4
    for cam in cams:
        R = np.asarray(cam.R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)  # valid rotation
        # camera looks inward: front vector points toward the asset region
        front = np.asarray(cam.front)
        to_origin = -np.asarray(cam.t)
        assert np.dot(front, to_origin) > 0
    # ring symmetry: camera 0 and 2 are opposite in xy
    np.testing.assert_allclose(
        np.asarray(cams[0].t)[:2], -np.asarray(cams[2].t)[:2], atol=1e-6
    )


def test_camera_pickle_consumable_by_lifting(tmp_path):
    """The render stage's camera pickle must drive the lifting projections."""
    import pickle

    cams = build_camera_ring(1.0, 2.0, view_num=4)
    path = str(tmp_path / "view:00000.pickle")
    save_camera_pickle(path, cams[1], np.eye(3), np.eye(3), np.zeros(3), np.zeros(3))
    with open(path, "rb") as fh:
        data = pickle.load(fh)
    cam = OrthoCamera(R=jnp.asarray(data["R"], jnp.float32),
                      t=jnp.asarray(data["t"], jnp.float32),
                      scale=data["scale"], resolution=tuple(data["resolution"]))
    px = np.asarray(project_points(cam, jnp.zeros((1, 3), jnp.float32)))
    assert np.isfinite(px).all()
    assert set(data.keys()) == {"R", "t", "scale", "resolution", "obj_rotation",
                                "obj_R", "obj_euler", "obj_location", "obj_t"}


def test_perturbations_deterministic_and_in_range():
    cfg = dict(need_perturb=True, rotation_x=[[-5, 5]], rotation_y=[[-5, 5]],
               displacement_z=[[1.73, 1.83]])  # BEHAVE backpack config
    p1 = sample_perturbations(cfg, 10, np.random.default_rng(42))
    p2 = sample_perturbations(cfg, 10, np.random.default_rng(42))
    assert len(p1) == 10
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a["rotation_matrix"], b["rotation_matrix"])
    for p in p1:
        R = p["rotation_matrix"]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert 1.73 <= p["displacement_frac"][2] <= 1.83
        assert p["displacement_frac"][0] == 0.0  # no x displacement configured


def test_no_perturb_identity():
    out = sample_perturbations(dict(need_perturb=False), 10, np.random.default_rng(0))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0]["rotation_matrix"], np.eye(3))


def test_render_points_matches_lifting_projection_square():
    """At square resolution, render_points (per-axis) == lifting (max-axis)."""
    cams = build_camera_ring(1.0, 2.0, view_num=4)
    pts = np.random.default_rng(0).normal(size=(5, 3)) * 0.3
    a = render_points_px(cams[0], pts)
    b = np.asarray(project_points(cams[0], jnp.asarray(pts, jnp.float32)))[:, :2]
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_mask_grid_covers_asset_region():
    cams = build_camera_ring(1.0, ortho_scale_world=4.0, view_num=4)
    bounds = (np.array([0.0, 0.0, 0.0]), np.array([1.0, 1.0, 1.0]))
    masks = candidate_mask_grid(
        cams[0], bounds, bbox_size=(0.45, 0.45, 0.95),
        stride_x=0.5, stride_y=0.5, azimuth_z=np.pi / 2,
    )
    assert masks.shape[0] > 4
    assert masks.dtype == np.uint8
    assert (masks.max(axis=(1, 2)) == 255).all()  # every mask nonempty


def test_render_object_views_shapes():
    cams = build_camera_ring(1.0, ortho_scale_world=4.0, view_num=1)
    seg, rgb = render_object_views(cams[0], CUBE_V - 0.5, CUBE_F)
    assert seg.shape == (512, 512) and seg.dtype == np.uint8
    assert rgb.shape == (512, 512, 3) and rgb.dtype == np.uint8
    assert seg.sum() > 0
    # object pixels darker than the white background on average
    assert rgb[seg > 0].mean() < 250


def test_select_valid_masks_band():
    seg = np.zeros((32, 32), np.uint8)
    seg[8:24, 8:24] = 255          # 256 px object
    full = np.full((32, 32), 255, np.uint8)          # ratio 1.0
    half = np.zeros((32, 32), np.uint8)
    half[8:16, 8:24] = 255                            # ratio 0.5
    none = np.zeros((32, 32), np.uint8)               # ratio 0.0
    valid = select_valid_masks(seg, [full, half, none], 0.4, 0.6)
    assert valid == [1]


def test_process_remove_overlap():
    boxes = [[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 5, 5]]  # xywh
    conf = [0.9, 0.5, 0.7]
    keep = process_remove_overlap(boxes, conf)
    assert keep == [0, 2]  # the 0.5-confidence duplicate of box 0 is dropped


def test_process_remove_overlap_exconf_keeps():
    boxes = [[0, 0, 10, 10], [1, 1, 10, 10]]
    # the >=exconf box survives unconditionally; the 0.9 one still overlaps
    # a kept box and is dropped (ascending-confidence pass)
    keep = process_remove_overlap(boxes, [0.9, 0.99])
    assert keep == [1]
    # two sub-exconf overlapping boxes: only the higher-confidence survives
    keep = process_remove_overlap(boxes, [0.9, 0.8])
    assert keep == [0]


def test_process_segmentation_keeps_persons():
    classes = np.array([0, 0, 5, 5])
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10], [1, 1, 11, 11]], float)
    scores = np.array([0.5, 0.6, 0.9, 0.4])
    keep = process_segmentation(classes, boxes, scores)
    # both persons kept despite overlap; low-conf duplicate object dropped
    np.testing.assert_array_equal(keep, [0, 1, 2])


def test_iou_iom():
    a = np.zeros((8, 8)); a[:4] = 1
    b = np.zeros((8, 8)); b[2:6] = 1
    assert abs(intersection_over_union(a, b) - 16 / 48) < 1e-9
    assert abs(intersection_over_maximum(a, b) - 16 / 32) < 1e-9


def test_local_to_global_cam_shape():
    bboxes = np.array([[10, 20, 110, 120]], float)
    cams = np.array([[1.0, 0.1, -0.1]])
    out = local_to_global_cam(bboxes, cams, L=512)
    assert out.shape == (1, 3)
    assert np.isfinite(out).all()
