"""Tests for the JAX SMPL-X LBS against an independent numpy oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.models.smplx import (
    NUM_BODY_JOINTS,
    lbs,
    random_model,
    smplx_forward,
    star_pose_vertices,
)


def lbs_oracle(betas, pose, v_template, shapedirs, posedirs, J_reg, parents, weights):
    """Independent numpy LBS written from the SMPL equations."""
    B = betas.shape[0]
    J = J_reg.shape[0]
    v_shaped = v_template[None] + np.einsum("bl,vkl->bvk", betas, shapedirs)
    joints = np.einsum("jv,bvk->bjk", J_reg, v_shaped)

    def rod(r):
        angle = np.linalg.norm(r)
        if angle < 1e-9:
            return np.eye(3)
        k = r / angle
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)

    rots = np.stack([
        np.stack([rod(pose[b].reshape(J, 3)[j]) for j in range(J)]) for b in range(B)
    ])
    feat = (rots[:, 1:] - np.eye(3)).reshape(B, -1)
    v_posed = v_shaped + (feat @ posedirs).reshape(B, -1, 3)

    verts = np.zeros_like(v_posed)
    posed_joints = np.zeros((B, J, 3))
    for b in range(B):
        G = np.zeros((J, 4, 4))
        for j in range(J):
            T = np.eye(4)
            T[:3, :3] = rots[b, j]
            T[:3, 3] = joints[b, j] - (joints[b, parents[j]] if parents[j] >= 0 else 0)
            G[j] = T if parents[j] < 0 else G[parents[j]] @ T
        posed_joints[b] = G[:, :3, 3]
        # subtract rest-pose joint contribution
        Grel = G.copy()
        for j in range(J):
            Grel[j, :3, 3] -= G[j, :3, :3] @ joints[b, j]
        T_v = np.einsum("vj,jkl->vkl", weights, Grel)
        vh = np.concatenate([v_posed[b], np.ones((v_posed.shape[1], 1))], axis=1)
        verts[b] = np.einsum("vkl,vl->vk", T_v, vh)[:, :3]
    return verts, posed_joints


def test_lbs_matches_oracle(rng):
    model = random_model(num_verts=32)
    B, J = 2, model.num_joints
    betas = rng.normal(size=(B, 6)).astype(np.float32)  # 4 shape + 2 expr
    pose = (rng.normal(size=(B, J * 3)) * 0.3).astype(np.float32)

    shapedirs = np.concatenate(
        [np.asarray(model.shapedirs), np.asarray(model.expr_dirs)], axis=-1
    )
    got_v, got_j = lbs(
        jnp.asarray(betas), jnp.asarray(pose), model.v_template,
        jnp.asarray(shapedirs), model.posedirs, model.J_regressor,
        model.parents, model.lbs_weights,
    )
    want_v, want_j = lbs_oracle(
        betas.astype(np.float64), pose.astype(np.float64),
        np.asarray(model.v_template, np.float64), shapedirs.astype(np.float64),
        np.asarray(model.posedirs, np.float64),
        np.asarray(model.J_regressor, np.float64),
        np.asarray(model.parents), np.asarray(model.lbs_weights, np.float64),
    )
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_j), want_j, atol=2e-5)


def test_zero_pose_is_shaped_template():
    model = random_model(num_verts=24)
    verts, joints = smplx_forward(model, batch_size=1)
    # zero pose, zero betas: vertices == v_template (posedirs feature is 0)
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5
    )


def test_translation_applied():
    model = random_model(num_verts=24)
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    v0, _ = smplx_forward(model, batch_size=1)
    v1, _ = smplx_forward(model, transl=t, batch_size=1)
    np.testing.assert_allclose(np.asarray(v1 - v0)[0], np.tile([1, 2, 3], (24, 1)), atol=1e-5)


def test_forward_jits_and_batches():
    model = random_model(num_verts=24)
    f = jax.jit(lambda m, bp: smplx_forward(m, body_pose=bp))
    bp = jnp.zeros((3, NUM_BODY_JOINTS * 3))
    verts, joints = f(model, bp)
    assert verts.shape == (3, 24, 3)
    assert joints.shape[1] == model.num_joints


def test_pca_hand_pose():
    model = random_model(num_verts=24)
    pca = jnp.ones((1, 6)) * 0.1
    v_pca, _ = smplx_forward(model, left_hand_pose=pca, right_hand_pose=pca, use_pca=True)
    full_l = pca @ model.left_hand_components
    full_r = pca @ model.right_hand_components
    v_full, _ = smplx_forward(model, left_hand_pose=full_l, right_hand_pose=full_r)
    np.testing.assert_allclose(np.asarray(v_pca), np.asarray(v_full), atol=1e-6)


def test_star_pose_differs_from_template():
    model = random_model(num_verts=24)
    star = star_pose_vertices(model)
    assert star.shape == (24, 3)
    assert float(jnp.abs(star - model.v_template).max()) > 1e-4


def test_vertex_landmarks_appended_in_openpose_order():
    """The OpenPose permutations index joints 55-75: those rows must be the
    21 vertex-picked landmarks in the reference's VertexJointSelector order
    (vertex_joint_selector.py:30-60 + vertex_ids.py 'smplx')."""
    from coma_tpu.models.keypoints import (
        SMPLX_LANDMARK_VERTEX_IDS,
        append_vertex_landmarks,
        smpl_to_openpose,
    )

    V = 12000  # >= all smplx landmark vertex ids, so no clipping
    verts = jnp.asarray(np.random.default_rng(0).normal(size=(2, V, 3)),
                        jnp.float32)
    joints = jnp.zeros((2, 55, 3))
    ext = append_vertex_landmarks(verts, joints)
    assert ext.shape == (2, 76, 3)
    # row 55 is the nose vertex, row 75 the right pinky tip
    np.testing.assert_array_equal(np.asarray(ext[:, 55]),
                                  np.asarray(verts[:, 9120]))
    np.testing.assert_array_equal(np.asarray(ext[:, 75]),
                                  np.asarray(verts[:, 8022]))
    # every triangulation index resolves
    tri = smpl_to_openpose(use_hands=True)
    assert tri.max() < ext.shape[1]
    # tiny synthetic meshes clip rather than crash
    small = append_vertex_landmarks(verts[:, :64], joints)
    assert small.shape == (2, 76, 3)
    assert int(SMPLX_LANDMARK_VERTEX_IDS.max()) == 9929
