"""Tests for the COAP body partitioning."""
import numpy as np
import jax.numpy as jnp
import pytest

from coma_tpu.models.coap_partition import (
    MERGE_BODY_PARTS_SMPLX,
    NUM_BODY_JOINTS_COAP,
    bone_local_frames,
    build_part_mapping,
    build_partition,
    part_bbox_gate,
    partition_vertices,
    to_part_local,
)
from coma_tpu.models.smplx import random_model

SMPLX_PARENTS = (-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                 16, 17, 18, 19)  # first 22 joints of the SMPL-X tree


def full_parents():
    model = random_model(num_verts=32)
    return model.parents, model


def test_part_mapping_merges():
    mapping = build_part_mapping(SMPLX_PARENTS + tuple())
    assert mapping.shape == (22,)
    # merged joints share their parent's part
    for j in MERGE_BODY_PARTS_SMPLX:
        assert mapping[j] == mapping[SMPLX_PARENTS[j]]
    # 22 joints − 7 merges = 15 parts
    assert mapping.max() + 1 == 15


def test_partition_vertices_covers_all(rng):
    parents, model = full_parents()
    parts, num_parts = partition_vertices(np.asarray(model.lbs_weights), parents)
    assert parts.shape == (32,)
    assert parts.min() >= 0 and parts.max() < num_parts


def test_build_partition_selectors():
    parents, model = full_parents()
    p = build_partition(np.asarray(model.lbs_weights), parents)
    # every vertex appears exactly once across the valid selector slots
    seen = []
    for k in range(p.num_parts):
        valid = p.part_vertex_valid[k] > 0
        seen.extend(p.part_vertex_ids[k][valid].tolist())
    assert sorted(seen) == list(range(32))


def test_bone_local_frames_roundtrip(rng):
    """world->local of the part's own world transform must be identity-ish."""
    K = 3
    part_joint = np.array([0, 1, 2])
    rest_joints = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    # random rigid transforms
    from coma_tpu.geometry.transforms import rodrigues

    Rm = rodrigues(jnp.asarray(rng.normal(size=(5, 3)) * 0.5, jnp.float32))
    T = jnp.tile(jnp.eye(4)[None], (5, 1, 1))
    T = T.at[:, :3, :3].set(Rm).at[:, :3, 3].set(
        jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    )
    frames = bone_local_frames(T, rest_joints, part_joint)
    assert frames.shape == (K, 4, 4)
    # a point at the part's world origin maps to the rest joint's negative...
    # verify invertibility: frames @ world == identity
    for k, j in enumerate(part_joint):
        offset = jnp.eye(4).at[:3, 3].set(rest_joints[j])
        world = T[j] @ offset
        prod = np.asarray(frames[k] @ world)
        np.testing.assert_allclose(prod, np.eye(4), atol=1e-5)


def test_to_part_local_shapes(rng):
    frames = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    out = to_part_local(pts, frames)
    assert out.shape == (4, 10, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pts), atol=1e-6)


def test_bbox_gate():
    part_pts = jnp.zeros((1, 4, 3)).at[0, 1].set(jnp.asarray([1.0, 1.0, 1.0]))
    valid = jnp.ones((1, 4))
    queries = jnp.asarray([[[0.5, 0.5, 0.5], [3.0, 0.0, 0.0]]], jnp.float32)
    gate = np.asarray(part_bbox_gate(part_pts, valid, queries))
    np.testing.assert_array_equal(gate[0], [1.0, 0.0])


@pytest.mark.slow
def test_coap_occupancy_world_translation_invariance(rng):
    """Occupancy of (body+d, scene+d) must equal (body, scene): the rigid
    translation folds into the bone frames exactly."""
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.coap import COAPConfig, COAPOccupancy, coap_occupancy_world
    from coma_tpu.models.coap_partition import build_partition
    from coma_tpu.models.smplx import random_model, smplx_forward

    sm = random_model(num_verts=256, num_betas=4, num_expr=2)
    part = build_partition(np.asarray(sm.lbs_weights), tuple(np.asarray(sm.parents)))
    K = part.num_parts
    cfg = COAPConfig(num_parts=K, code_dim=8, hidden_dim=8,
                     query_dims=(64, 64, 64), query_skip=(2,), query_out=8,
                     decoder_dims=(16, 16, 16, 16), decoder_skip=(3,))
    model = COAPOccupancy(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((K, part.max_part_size, 3)),
        jnp.zeros((K, 5, 3)),
        jnp.ones((K, 5)),
    )

    verts, joints = smplx_forward(
        sm,
        betas=jnp.zeros((1, 4)),
        body_pose=jnp.asarray(rng.normal(size=(1, 63)) * 0.1, jnp.float32),
    )
    verts = verts[0]
    J = joints.shape[1]
    eye = jnp.broadcast_to(jnp.eye(4), (J, 4, 4))
    # rest joints as the frame anchors; identity rel transforms (unposed
    # frames) — the invariance property holds for ANY frames
    rest_joints = joints[0]
    q = jnp.asarray(rng.normal(size=(7, 3)) * 0.3, jnp.float32)

    occ0 = coap_occupancy_world(
        model, variables, part, rest_joints, eye, jnp.zeros(3), verts, q
    )
    d = jnp.asarray([0.5, -1.0, 2.0])
    occ1 = coap_occupancy_world(
        model, variables, part, rest_joints, eye, d, verts + d, q + d
    )
    assert occ0.shape == (7,)
    np.testing.assert_allclose(np.asarray(occ0), np.asarray(occ1), atol=1e-5)


@pytest.mark.slow
def test_make_coap_collision_fn_in_depth_optimizer(rng):
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.coap import (
        COAPConfig,
        COAPOccupancy,
        make_coap_collision_fn,
    )
    from coma_tpu.models.coap_partition import build_partition
    from coma_tpu.models.smplx import random_model, smplx_forward

    sm = random_model(num_verts=128, num_betas=4, num_expr=2)
    part = build_partition(np.asarray(sm.lbs_weights), tuple(np.asarray(sm.parents)))
    K = part.num_parts
    cfg = COAPConfig(num_parts=K, code_dim=8, hidden_dim=8,
                     query_dims=(64, 64, 64), query_skip=(2,), query_out=8,
                     decoder_dims=(16, 16, 16, 16), decoder_skip=(3,))
    model = COAPOccupancy(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((K, part.max_part_size, 3)),
        jnp.zeros((K, 4, 3)),
        jnp.ones((K, 4)),
    )
    verts, joints = smplx_forward(sm, betas=jnp.zeros((1, 4)))
    verts = verts[0]
    J = joints.shape[1]
    fn = make_coap_collision_fn(
        model, variables, part, joints[0],
        jnp.broadcast_to(jnp.eye(4), (J, 4, 4)), verts,
        scene_points=jnp.asarray(rng.normal(size=(9, 3)) * 0.2, jnp.float32),
    )
    loss = jax.jit(fn)(verts + jnp.asarray([0.0, 0.0, 0.3]))
    assert np.isfinite(float(loss))
    # differentiable through the displacement (what the optimizer needs)
    g = jax.grad(lambda d: fn(verts + d))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
