"""Tests for mesh IO, normals, and downsampling."""
import numpy as np
import pytest

from coma_tpu.geometry.mesh import (
    Mesh,
    compute_vertex_normals,
    face_areas,
    load_obj,
    save_obj,
)
from coma_tpu.geometry.sampling import (
    nearest_vertex_indices,
    sample_points_poisson_disk,
    simplify_mesh_and_get_indices,
)

CUBE_V = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float64
)
# 12 triangles, outward-facing
CUBE_F = np.array(
    [[0, 2, 1], [0, 3, 2],          # bottom (z=0), normal -z
     [4, 5, 6], [4, 6, 7],          # top (z=1), normal +z
     [0, 1, 5], [0, 5, 4],          # y=0, normal -y
     [2, 3, 7], [2, 7, 6],          # y=1, normal +y
     [1, 2, 6], [1, 6, 5],          # x=1, normal +x
     [0, 4, 7], [0, 7, 3]], dtype=np.int64  # x=0, normal -x
)


def cube():
    return Mesh(vertices=CUBE_V.copy(), faces=CUBE_F.copy())


def test_obj_roundtrip_preserves_order(tmp_path):
    path = str(tmp_path / "cube.obj")
    save_obj(path, CUBE_V, CUBE_F)
    mesh = load_obj(path)
    np.testing.assert_allclose(mesh.vertices, CUBE_V)
    np.testing.assert_array_equal(mesh.faces, CUBE_F)


def test_obj_parses_slashed_faces_and_quads(tmp_path):
    path = str(tmp_path / "m.obj")
    with open(path, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        fh.write("vn 0 0 1\n")
        fh.write("f 1/1/1 2//1 3/1 4\n")  # quad, mixed index styles
    mesh = load_obj(path)
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])  # fan


def test_face_areas_cube():
    np.testing.assert_allclose(face_areas(CUBE_V, CUBE_F), 0.5)


def test_vertex_normals_unit_and_outward():
    vn = compute_vertex_normals(CUBE_V, CUBE_F)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=-1), 1.0, atol=1e-12)
    centers = CUBE_V - 0.5  # outward direction from cube center
    assert (np.sum(vn * centers, axis=-1) > 0).all()


def test_isolated_vertex_gets_zero_normal():
    v = np.vstack([CUBE_V, [[5.0, 5.0, 5.0]]])
    vn = compute_vertex_normals(v, CUBE_F)
    np.testing.assert_array_equal(vn[-1], 0.0)


def test_poisson_disk_count_and_spread():
    pts, nrm = sample_points_poisson_disk(cube(), 32, seed=0)
    assert pts.shape == (32, 3)
    assert nrm.shape == (32, 3)
    # points on the unit cube surface
    on_face = (
        np.isclose(pts, 0.0, atol=1e-9) | np.isclose(pts, 1.0, atol=1e-9)
    ).any(axis=-1)
    assert on_face.all()
    # poisson-disk: min pairwise distance should be well above random sampling
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    r_max = np.sqrt(6.0 / (2 * np.sqrt(3) * 32))
    assert d.min() > 0.4 * r_max


def test_poisson_disk_deterministic_per_seed():
    a, _ = sample_points_poisson_disk(cube(), 16, seed=7)
    b, _ = sample_points_poisson_disk(cube(), 16, seed=7)
    np.testing.assert_array_equal(a, b)
    c, _ = sample_points_poisson_disk(cube(), 16, seed=8)
    assert not np.array_equal(a, c)


def test_nearest_vertex_indices():
    pts = CUBE_V + 0.01  # near each vertex
    idx = nearest_vertex_indices(pts, CUBE_V)
    np.testing.assert_array_equal(idx, np.arange(8))


def test_simplify_returns_valid_indices():
    indices, pts, nrm = simplify_mesh_and_get_indices(cube(), 16, seed=3)
    assert len(indices) == 16 == len(pts) == len(nrm)
    assert all(0 <= i < 8 for i in indices)
