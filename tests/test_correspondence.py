"""CPNet-helper parity: coma_tpu.geometry.correspondence vs numpy oracles
that replicate the reference's ``imports/cpnet/utils.py`` semantics
(kNN gaussian laplacian ``pc2lap:76-82``, geodesics ``gen_geo_dists:108``,
keypoint geodesic error ``geo_error_per_cp:108-160``)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.geometry.correspondence import (
    geo_error_per_cp,
    geodesic_distances,
    jitter_point_cloud,
    knn_graph,
    normalize_point_cloud,
    normalized_laplacian,
    pc_to_laplacian,
    point_augment,
    rotate_point_cloud,
)


def _ref_pc2lap(pcd: np.ndarray, knn: int) -> np.ndarray:
    """The reference pc2lap, inlined with sklearn (directed kNN graph)."""
    from sklearn import neighbors

    graph = neighbors.kneighbors_graph(
        pcd, knn, mode="distance", include_self=False).toarray()
    conns = np.sum(graph > 0, axis=-1)
    graph = np.exp(
        -(graph ** 2)
        / (np.sum(graph, axis=-1, keepdims=True) / conns[:, None]) ** 2
    ) * (graph > 0).astype(np.float32)
    rowsum = np.sum(graph, axis=1)
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(rowsum, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    return np.eye(graph.shape[0]) - np.diag(d_inv_sqrt) @ graph @ np.diag(d_inv_sqrt)


def _ref_geo_error(pcds, embeddings, kp_indices, dist_mats=None):
    """The reference geo_error_per_cp loop, KDTree replaced by exact argmin."""
    valid = np.nonzero(kp_indices >= 0)[0]
    pcds, embeddings, kp_indices = pcds[valid], embeddings[valid], kp_indices[valid]
    if dist_mats is not None:
        dist_mats = dist_mats[valid]
    error, cnt = 0.0, 0
    for i in range(pcds.shape[0]):
        kp_emb = embeddings[i][kp_indices[i]]
        for j in range(pcds.shape[0]):
            if i == j:
                continue
            idx = int(np.argmin(np.linalg.norm(embeddings[j] - kp_emb, axis=1)))
            if dist_mats is None:
                dist = np.linalg.norm(pcds[j][idx] - pcds[j][kp_indices[j]])
            else:
                dist = dist_mats[j][idx, kp_indices[j]]
            error += dist
            cnt += 1
    if cnt == 0:
        return 0.0, False
    return error / cnt, True


def test_point_augment_pads_and_trims():
    pc = np.arange(21.0).reshape(7, 3)
    up = point_augment(pc, 30)
    assert up.shape == (30, 3)
    np.testing.assert_array_equal(up[:7], pc)
    np.testing.assert_array_equal(up[7:14], pc)  # doubling preserves order
    assert point_augment(pc, 4).shape == (4, 3)
    np.testing.assert_array_equal(point_augment(pc, 7), pc)


def test_augmentations_jittable_and_bounded():
    key = jax.random.PRNGKey(0)
    pc = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)), jnp.float32)
    jit_jitter = jax.jit(jitter_point_cloud, static_argnums=(2, 3))
    out = jit_jitter(pc, key, 0.5, 0.02)
    assert float(jnp.max(jnp.abs(out - pc))) <= 0.02 + 1e-6
    rot = jax.jit(rotate_point_cloud)(pc, key)
    # rotation preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=1),
        np.linalg.norm(np.asarray(pc), axis=1), rtol=1e-5)
    unit = normalize_point_cloud(pc)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(unit), axis=1), 1.0,
                               rtol=1e-5)


def test_knn_graph_matches_sklearn():
    from sklearn import neighbors

    pc = np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
    dists, idx = jax.device_get(knn_graph(jnp.asarray(pc), 5))
    ref = neighbors.kneighbors_graph(pc, 5, mode="distance",
                                     include_self=False).toarray()
    mine = np.zeros_like(ref)
    mine[np.repeat(np.arange(64), 5), idx.ravel()] = dists.ravel()
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_pc_to_laplacian_matches_reference():
    pc = np.random.default_rng(2).normal(size=(48, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(pc_to_laplacian, static_argnums=1)(
        jnp.asarray(pc), 6))
    ref = _ref_pc2lap(pc, 6)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_normalized_laplacian_isolated_vertex():
    adj = jnp.zeros((4, 4), jnp.float32).at[0, 1].set(1.0).at[1, 0].set(1.0)
    lap = np.asarray(normalized_laplacian(adj))
    assert np.isfinite(lap).all()  # zero-degree rows must not inf/nan
    np.testing.assert_allclose(np.diag(lap), 1.0)


def test_geodesic_distances_chain():
    # 1-D chain: geodesic distance = path length along the chain
    pc = np.stack([np.arange(10.0), np.zeros(10), np.zeros(10)], axis=1)
    geo = geodesic_distances(pc, knn=2)
    np.testing.assert_allclose(
        geo, np.abs(np.arange(10.0)[:, None] - np.arange(10.0)[None, :]),
        atol=1e-5)


@pytest.mark.parametrize("use_geo", [False, True])
def test_geo_error_matches_reference_loop(use_geo):
    rng = np.random.default_rng(3)
    D, P, F = 5, 40, 8
    pcds = rng.normal(size=(D, P, 3)).astype(np.float32)
    emb = rng.normal(size=(D, P, F)).astype(np.float32)
    kp = np.array([3, -1, 7, 12, 0])  # one unannotated cloud
    dm = None
    if use_geo:
        dm = rng.uniform(size=(D, P, P)).astype(np.float32)
        dm = (dm + dm.transpose(0, 2, 1)) / 2
    ours, ok = geo_error_per_cp(pcds, emb, kp, dm)
    ref, ref_ok = _ref_geo_error(pcds, emb, kp, dm)
    assert ok == ref_ok is True
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_geo_error_single_annotation_invalid():
    rng = np.random.default_rng(4)
    err, ok = geo_error_per_cp(
        rng.normal(size=(3, 10, 3)), rng.normal(size=(3, 10, 4)),
        np.array([-1, 5, -1]))
    assert err == 0.0 and ok is False
