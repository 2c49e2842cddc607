"""Tests for the BEHAVE contact visualizer + Kinect scene render
(reference ``utils/behave.py:925-1060``)."""
import numpy as np
import pytest

from coma_tpu.visualization.contact_viz import (
    KinectCamera,
    PART_COLORS,
    PART_NAMES,
    get_contact_spheres,
    part_labels_from_lbs,
    render_contact_scene,
    uv_sphere,
)


def test_part_table_covers_14_parts():
    assert len(PART_NAMES) == 14 and PART_COLORS.shape == (14, 3)


def test_part_labels_from_lbs():
    # three fake vertices dominated by pelvis(0), left_wrist(20), head(15)
    w = np.zeros((3, 55), np.float32)
    w[0, 0] = 1.0
    w[1, 20] = 0.9
    w[2, 15] = 0.8
    labels = part_labels_from_lbs(w)
    assert labels[0] == PART_NAMES.index("hips")
    assert labels[1] == PART_NAMES.index("leftHand")
    assert labels[2] == PART_NAMES.index("head")


def test_uv_sphere_is_closed():
    v, f = uv_sphere(np.array([1.0, 2.0, 3.0]), 0.5)
    # all vertices on the sphere
    r = np.linalg.norm(v - np.array([1.0, 2.0, 3.0]), axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=1e-5)
    # closed: every edge appears in exactly two faces
    edges = {}
    for tri in f:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            edges[(min(a, b), max(a, b))] = edges.get((min(a, b), max(a, b)), 0) + 1
    assert set(edges.values()) == {2}


def _touching_scene():
    """A 'human' sphere at origin and an object cube touching it at +x."""
    hv, hf = uv_sphere(np.zeros(3), 0.5, n_lat=16, n_lon=24)
    c = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ], np.float64) * 0.6 + np.array([0.5, -0.3, -0.3])
    cf = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3],
    ])
    return (hv, hf), (c, cf)


def test_contact_spheres_found_at_interface():
    (hv, hf), (ov, of) = _touching_scene()
    labels = np.full(len(hv), PART_NAMES.index("rightHand"), np.int32)
    spheres = get_contact_spheres(hv, labels, ov, of, thres=0.12, radius=0.05)
    assert list(spheres) == [PART_NAMES.index("rightHand")]
    color, (sv, _) = spheres[PART_NAMES.index("rightHand")]
    np.testing.assert_allclose(color, PART_COLORS[PART_NAMES.index("rightHand")])
    # the sphere centroid sits near the +x interface
    assert sv.mean(axis=0)[0] > 0.2


def test_no_contact_returns_empty():
    (hv, hf), (ov, of) = _touching_scene()
    labels = np.zeros(len(hv), np.int32)
    spheres = get_contact_spheres(hv, labels, ov + 10.0, of, thres=0.04)
    assert spheres == {}


def test_render_contact_scene_kinect():
    (hv, hf), (ov, of) = _touching_scene()
    # place the scene in front of the camera (+z) like BEHAVE frames
    hv = hv + np.array([0, 0, 2.5])
    ov = ov + np.array([0, 0, 2.5])
    labels = np.full(len(hv), PART_NAMES.index("spine"), np.int32)
    img = render_contact_scene(
        [(hv, hf), (ov, of)],
        image_size=(128, 96),
        viz_contact=True,
        part_labels=labels,
        thres=0.12,
    )
    assert img.shape == (96, 128, 3)
    assert np.isfinite(img).all()
    # scene covers some pixels but not all (background remains)
    covered = (np.abs(img - img[0, 0]).max(-1) > 1e-3).mean()
    assert 0.02 < covered < 0.95


def test_camera_projection_geometry():
    cam = KinectCamera((2048, 1536))  # native scale
    # a point on the optical axis lands at the principal point
    p = cam.project(np.array([[0.0, 0.0, 2.0]]))
    np.testing.assert_allclose(p[0, :2], [cam.cx, cam.cy], atol=1e-4)
    assert p[0, 2] == pytest.approx(2.0)
    # +x in camera frame moves LEFT in pixels (pytorch3d R = diag(-1,-1,1))
    q = cam.project(np.array([[0.5, 0.0, 2.0]]))
    assert q[0, 0] < p[0, 0]
