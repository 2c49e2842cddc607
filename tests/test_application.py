"""Tests for VPoser, COAP backends, and the ComA-driven HOI optimizer."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.affordance.contact import contact_update
from coma_tpu.affordance.io import coma_state_to_dict
from coma_tpu.affordance.state import init_coma_state
from coma_tpu.models.coap import (
    ResnetPointnet,
    capsule_occupancy,
    collision_loss,
    sample_scene_points_bbox,
)
from coma_tpu.models.smplx import random_model
from coma_tpu.models.vposer import (
    VPoserDecoder,
    matrot_to_aa,
    rot6d_decode,
    smplify_angle_prior,
)
from coma_tpu.pipelines.application import (
    chamfer_distance,
    derive_targets_from_coma,
    optimize_smpl,
    vertex_normals_jax,
)
from tests.test_geometry import CUBE_F, CUBE_V


# ------------------------------------------------------------ vposer ----

def test_rot6d_decode_orthonormal(rng):
    x = jnp.asarray(rng.normal(size=(5, 6)), jnp.float32)
    R = np.asarray(rot6d_decode(x))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_matrot_to_aa_roundtrip(rng):
    from coma_tpu.geometry.transforms import rodrigues

    aa = jnp.asarray(rng.normal(size=(6, 3)) * 0.8, jnp.float32)
    R = rodrigues(aa)
    back = matrot_to_aa(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-3)


def test_vposer_decoder_shapes():
    dec = VPoserDecoder()
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((2, 32)))
    aa = dec.apply(params, jnp.zeros((2, 32)))
    assert aa.shape == (2, 63)
    mats = dec.apply(params, jnp.zeros((2, 32)), output_type="matrot")
    assert mats.shape == (2, 21, 3, 3)


def test_angle_prior_bends():
    pose = jnp.zeros((1, 63))
    base = np.asarray(smplify_angle_prior(pose)).sum()
    # bending the left knee the "wrong" way must increase the prior
    bent = pose.at[0, 9 + 0].set(0.0).at[0, 12 - 3].set(1.0)  # idx 9 = knee entry
    worse = np.asarray(smplify_angle_prior(bent)).sum()
    assert worse != base


# -------------------------------------------------------------- coap ----

def test_capsule_occupancy_levels():
    joints = jnp.asarray([[0, 0, 0], [0, 0, 1.0]], jnp.float32)
    parents = (-1, 0)
    pts = jnp.asarray([[0, 0, 0.5], [0.07, 0, 0.5], [0.5, 0, 0.5]], jnp.float32)
    occ = np.asarray(capsule_occupancy(pts, joints, parents))
    assert occ[0] > 0.85         # on the bone axis (sigmoid(30*0.07)=0.89)
    assert abs(occ[1] - 0.5) < 0.02  # exactly at the radius -> level set
    assert occ[2] < 0.01         # far away


def test_collision_loss_zero_outside():
    assert float(collision_loss(jnp.asarray([0.1, 0.4]))) == 0.0
    assert float(collision_loss(jnp.asarray([0.9]))) > 0.0


def test_scene_point_bbox_mask():
    verts = jnp.asarray(CUBE_V, jnp.float32)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [2.0, 0, 0]], jnp.float32)
    w = np.asarray(sample_scene_points_bbox(pts, verts))
    np.testing.assert_array_equal(w, [1.0, 0.0])


def test_resnet_pointnet_permutation_invariant(rng):
    net = ResnetPointnet(out_dim=16, hidden_dim=32)
    pts = jnp.asarray(rng.normal(size=(1, 20, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), pts)
    a = net.apply(params, pts)
    b = net.apply(params, pts[:, ::-1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# -------------------------------------------------------- application ----

def test_vertex_normals_match_geometry():
    from coma_tpu.geometry.mesh import compute_vertex_normals

    got = np.asarray(vertex_normals_jax(jnp.asarray(CUBE_V, jnp.float32), jnp.asarray(CUBE_F)))
    want = compute_vertex_normals(CUBE_V, CUBE_F)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_chamfer_zero_identity(rng):
    a = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    assert float(chamfer_distance(a, a)) < 5e-6  # eps-stabilized sqrt floor


def test_derive_targets(rng):
    state = init_coma_state(8, 6, 16, 0.07, 0.5)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(8, 3)) * 0.1, jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(8, 3))), jnp.float32)
    ov = jnp.asarray(rng.normal(size=(6, 3)) * 0.1, jnp.float32)
    on = jnp.asarray(unit(rng.normal(size=(6, 3))), jnp.float32)
    state = contact_update(state, hv, hn, ov, on)
    d = coma_state_to_dict(state)
    orient_gt, sel_h, corr_o = derive_targets_from_coma(d, 0, contact_threshold=0.1)
    assert orient_gt.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(orient_gt, axis=-1), 1.0, atol=1e-5)
    assert sel_h.ndim == 1 and corr_o.shape == sel_h.shape
    assert (corr_o < 6).all()


@pytest.mark.slow
def test_optimize_smpl_runs_and_descends(rng):
    model = random_model(num_verts=32)
    dec = VPoserDecoder()
    vp_params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))

    # a tiny aggregated coma for targets
    state = init_coma_state(32, 6, 16, 0.07, 0.5)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(32, 3)) * 0.1, jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(32, 3))), jnp.float32)
    ov = rng.normal(size=(6, 3)) * 0.1
    on = unit(rng.normal(size=(6, 3)))
    state = contact_update(state, hv, hn, jnp.asarray(ov, jnp.float32), jnp.asarray(on, jnp.float32))
    coma_dict = coma_state_to_dict(state)

    result = optimize_smpl(
        smplx_model=model,
        vposer_decoder_params=vp_params,
        coma_dict=coma_dict,
        obj_verts=ov,
        obj_normals=on,
        num_iters=30,
        orientation_weight=1e3,
        contact_weight=1e3,
        use_collision=True,
        collision_weight=1e2,
    )
    assert result.vertices.shape == (32, 3)
    assert np.isfinite(result.vertices).all()
    assert all(np.isfinite(v) for v in result.losses.values())


@pytest.mark.slow
def test_optimize_cli(tmp_path, rng):
    """The application CLI end to end on synthetic inputs."""
    import json
    import pickle

    from coma_tpu.affordance.io import save_coma_state
    from coma_tpu.cli import optimize as cli_opt

    state = init_coma_state(32, 6, 16, 0.07, 0.5)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    ov = rng.normal(size=(6, 3)) * 0.1
    on = unit(rng.normal(size=(6, 3)))
    state = contact_update(
        state,
        jnp.asarray(rng.normal(size=(32, 3)) * 0.1, jnp.float32),
        jnp.asarray(unit(rng.normal(size=(32, 3))), jnp.float32),
        jnp.asarray(ov, jnp.float32),
        jnp.asarray(on, jnp.float32),
    )
    coma_pth = str(tmp_path / "coma.pickle")
    save_coma_state(state, coma_pth)
    obj_pth = str(tmp_path / "obj.pickle")
    with open(obj_pth, "wb") as fh:
        pickle.dump(dict(downsampled_pcd_points_raw=ov.astype(np.float32),
                         downsampled_pcd_normal_raw=on.astype(np.float32)), fh)

    out = str(tmp_path / "optimized.obj")
    lj = str(tmp_path / "losses.json")
    cli_opt.main([
        "--coma_pth", coma_pth, "--obj_downsample_pth", obj_pth,
        "--save_pth", out, "--losses_json", lj, "--num_iters", "20",
        "--orientation_weight", "1e3", "--contact_weight", "1e3",
    ])
    assert os.path.getsize(out) > 0
    losses = json.load(open(lj))
    assert all(np.isfinite(v) for v in losses.values())
