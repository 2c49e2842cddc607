"""Tests for the visualization subsystem."""
import os

import numpy as np
import pytest

from coma_tpu.visualization import (
    render_mesh_preview,
    save_vertex_colored_mesh,
    visualize_occupancy_slices,
)
from tests.test_geometry import CUBE_F, CUBE_V


def test_vertex_colored_mesh_roundtrippable(tmp_path):
    path = str(tmp_path / "m.ply")
    weights = np.linspace(0, 1, len(CUBE_V))
    save_vertex_colored_mesh(path, CUBE_V, CUBE_F, weights)
    data = open(path, "rb").read()
    assert data.startswith(b"ply")
    assert b"element vertex 8" in data and b"element face 12" in data


def test_mesh_preview_png(tmp_path):
    path = str(tmp_path / "m.png")
    render_mesh_preview(path, CUBE_V, CUBE_F, np.linspace(0, 1, len(CUBE_V)),
                        resolution=128)
    assert os.path.getsize(path) > 500


def test_occupancy_slices_png(tmp_path, rng):
    path = str(tmp_path / "occ.png")
    field = rng.uniform(size=(16, 16, 16)).astype(np.float32)
    visualize_occupancy_slices(path, field)
    assert os.path.getsize(path) > 1000


def test_visualize_cli_human(tmp_path, monkeypatch):
    from coma_tpu.cli import visualize as cli_viz
    from coma_tpu.geometry.mesh import save_obj

    monkeypatch.chdir(tmp_path)
    save_obj("star.obj", CUBE_V, CUBE_F)
    np.save("aff.npy", np.linspace(0, 1, len(CUBE_V)))
    cli_viz.main(["human", "--affordance_npy", "aff.npy",
                  "--smplx_star_pth", "star.obj", "--out", "out"])
    assert os.path.exists("out.ply") and os.path.exists("out.png")


def test_visualize_cli_occupancy(tmp_path, monkeypatch, rng):
    from coma_tpu.cli import visualize as cli_viz

    monkeypatch.chdir(tmp_path)
    info = dict(prob_field=rng.uniform(size=(8, 8, 8)), spatial_grid_metadata={})
    np.save("occ.npy", info)
    # small resolution: the production default (512, num_steps=192) is a
    # ~20 s compile on the CPU CI host; tests/test_volume_render.py covers
    # the volume path's semantics at test scale
    cli_viz.main(["occupancy", "--occupancy_npy", "occ.npy", "--out",
                  "occ.png", "--resolution", "64"])
    assert os.path.exists("occ.png")
    cli_viz.main(["occupancy", "--occupancy_npy", "occ.npy", "--out",
                  "occ_slices.png", "--mode", "slices"])
    assert os.path.exists("occ_slices.png")


def test_write_message_on_img():
    from coma_tpu.visualization.viz import write_message_on_img

    img = np.zeros((64, 64, 3), np.uint8)
    out = write_message_on_img(img, "NO HUMANS")
    assert out.shape == img.shape
    assert (out[..., 0] > 0).any() and not (out[..., 1] > 0).any()  # red stamp
