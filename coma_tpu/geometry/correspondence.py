"""Point-cloud keypoint-correspondence utilities (CPNet helper parity).

Reference: ``imports/cpnet/utils.py`` — point-cloud augmentation, kNN
graph laplacians, geodesic distance tables, and the cross-instance keypoint
geodesic-error metric (``geo_error_per_cp``, ``:108-160`` there). The
reference never calls these from a main-path script (SURVEY §2.4 marks the
module vestigial), but a user porting CPNet-style keypoint evaluation should
find the same surface here, redesigned TPU-first:

- the dense math (kNN graphs, laplacians, nearest-embedding queries) is
  jittable jax — the all-pairs embedding query in :func:`geo_error_per_cp`
  runs as ONE batched matmul+argmin program on the MXU instead of the
  reference's O(D²) python loop over per-cloud KDTree queries;
- the genuinely sequential graph algorithm (multi-source shortest path for
  geodesics) stays on host via ``scipy.sparse.csgraph`` — data-dependent
  frontier expansion does not map to a systolic array;
- randomized augmentations take explicit ``jax.random`` keys (no hidden
  global RNG state, reproducible under ``jit``/``vmap``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "point_augment",
    "jitter_point_cloud",
    "rotate_point_cloud",
    "normalize_point_cloud",
    "knn_graph",
    "pc_to_laplacian",
    "normalize_adjacency",
    "normalized_laplacian",
    "geodesic_distances",
    "geo_error_per_cp",
]


# --------------------------------------------------------------------- aug

def point_augment(pcd: np.ndarray, num_point: int = 3000) -> np.ndarray:
    """Pad (by tiling) or trim a cloud to exactly ``num_point`` points.

    Same semantics as the reference ``point_augment``: doubling until one
    partial tile suffices, else truncation. Host-side — it changes shape, so
    it must run before ``jit`` boundaries (XLA needs static shapes).
    """
    if pcd.shape[0] < num_point:
        while num_point - pcd.shape[0] > pcd.shape[0]:
            pcd = np.concatenate([pcd, pcd])
        return np.concatenate([pcd, pcd[: num_point - pcd.shape[0]]])
    return pcd[:num_point]


def jitter_point_cloud(pcd: jax.Array, key: jax.Array, sigma: float = 0.01,
                       clip: float = 0.05) -> jax.Array:
    """Gaussian-jitter every coordinate, clipped to ``±clip`` (jittable)."""
    assert clip > 0
    noise = jnp.clip(sigma * jax.random.normal(key, jnp.shape(pcd),
                                               dtype=jnp.result_type(pcd)),
                     -clip, clip)
    return pcd + noise


def rotate_point_cloud(pcd: jax.Array, key: jax.Array,
                       degree: float = np.pi / 60) -> jax.Array:
    """Random small rotation about +Y, angle ~ U[0, degree) (jittable)."""
    angle = jax.random.uniform(key, ()) * degree
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                    dtype=jnp.result_type(pcd))
    return pcd @ rot


def normalize_point_cloud(pts: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Scale each point onto the unit sphere (row-wise L2), jittable."""
    norm = jnp.sqrt(jnp.sum(pts * pts, axis=-1, keepdims=True))
    return pts / jnp.maximum(norm, eps)


# ------------------------------------------------------------------ graphs

def knn_graph(pcd: jax.Array, k: int = 20) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors (self excluded) of every point, jittable.

    Returns ``(dists, idx)`` each ``(N, k)``. One (N, N) distance matrix +
    ``top_k`` — N here is a few thousand, so the dense form is both exact
    and MXU-shaped (the pairwise term is a matmul).
    """
    sq = jnp.sum(pcd * pcd, axis=-1)
    d2 = sq[:, None] - 2.0 * (pcd @ pcd.T) + sq[None, :]
    d2 = jnp.where(jnp.eye(d2.shape[0], dtype=bool), jnp.inf, d2)
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def normalize_adjacency(adj: jax.Array) -> jax.Array:
    """Symmetric normalization D^-1/2 A D^-1/2 (reference ``normalize_adj``)."""
    rowsum = jnp.sum(adj, axis=1)
    d_inv_sqrt = jnp.where(rowsum > 0, rowsum ** -0.5, 0.0)
    return adj * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


def normalized_laplacian(adj: jax.Array) -> jax.Array:
    """I - D^-1/2 A D^-1/2 (reference ``normalized_laplacian``)."""
    return jnp.eye(adj.shape[0], dtype=adj.dtype) - normalize_adjacency(adj)


def pc_to_laplacian(pcd: jax.Array, knn: int = 20) -> jax.Array:
    """Normalized laplacian of the gaussian-weighted kNN graph (jittable).

    Reference ``pc2lap``: edge weight ``exp(-d² / s_i²)`` where ``s_i`` is
    the mean kNN distance of row i (its kNN-distance sum over its neighbor
    count), on the DIRECTED kNN graph (row i holds i's neighbors only —
    ``kneighbors_graph`` is asymmetric and the reference keeps it so).
    The (N, k) edge list scatters into the dense (N, N) adjacency with a
    one-hot matmul — a transposed gather XLA fuses onto the MXU.
    """
    n = pcd.shape[0]
    dists, idx = knn_graph(pcd, knn)
    scale = jnp.mean(dists, axis=1, keepdims=True)          # (N, 1)
    w = jnp.exp(-(dists ** 2) / jnp.maximum(scale, 1e-20) ** 2)
    onehot = jax.nn.one_hot(idx, n, dtype=w.dtype)          # (N, k, N)
    adj = jnp.einsum("nk,nkm->nm", w, onehot)
    return normalized_laplacian(adj)


def geodesic_distances(pcd: np.ndarray, knn: int = 20) -> np.ndarray:
    """All-pairs geodesic distances over the kNN graph (host side).

    Reference ``gen_geo_dists``: shortest paths on the undirected kNN
    distance graph. Frontier-style graph traversal is data-dependent and
    sequential — the one CPNet helper that stays off the accelerator
    (``scipy.sparse.csgraph``; the reference used sklearn's now-removed
    ``graph_shortest_path`` wrapper around the same routine).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import shortest_path

    n = pcd.shape[0]
    dists, idx = jax.device_get(knn_graph(jnp.asarray(pcd, jnp.float32), knn))
    rows = np.repeat(np.arange(n), knn)
    graph = sp.csr_matrix((dists.ravel(), (rows, idx.ravel())), shape=(n, n))
    return shortest_path(graph, directed=False)


# ------------------------------------------------------------------ metric

def _nearest_by_embedding(embeddings: jax.Array, queries: jax.Array) -> jax.Array:
    """idx[j, i] = argmin_p ||embeddings[j, p] - queries[i]|| for ALL pairs.

    One einsum + argmin: (D, P, F) x (D, F) -> (D, P, D) scores on the MXU —
    replaces the reference's D² python-level KDTree queries
    (``geo_error_per_cp``, ``imports/cpnet/utils.py:119-133``).
    """
    sq = jnp.sum(embeddings * embeddings, axis=-1)           # (D, P)
    dots = jnp.einsum("jpf,if->jpi", embeddings, queries)    # (D, P, D)
    return jnp.argmin(sq[:, :, None] - 2.0 * dots, axis=1)   # (D, D)


@jax.jit
def _geo_error_l2(pcds, embeddings, kp_indices):
    d = pcds.shape[0]
    queries = jnp.take_along_axis(
        embeddings, kp_indices[:, None, None], axis=1)[:, 0]  # (D, F)
    idx = _nearest_by_embedding(embeddings, queries)           # (D, D) [j, i]
    p_nearest = jnp.take_along_axis(pcds, idx[..., None], axis=1)      # (D, D, 3)
    p_gt = jnp.take_along_axis(pcds, kp_indices[:, None, None], axis=1)  # (D, 1, 3)
    err = jnp.linalg.norm(p_nearest - p_gt, axis=-1)           # (D, D) [j, i]
    off = 1.0 - jnp.eye(d, dtype=err.dtype)
    return jnp.sum(err * off), jnp.sum(off)


@jax.jit
def _geo_error_geodesic(pcds, embeddings, kp_indices, dist_mats):
    d = pcds.shape[0]
    queries = jnp.take_along_axis(
        embeddings, kp_indices[:, None, None], axis=1)[:, 0]
    idx = _nearest_by_embedding(embeddings, queries)           # (D, D) [j, i]
    row = jnp.take_along_axis(dist_mats, idx[..., None], axis=1)  # (D, D, P)
    err = jnp.take_along_axis(
        row, kp_indices[:, None, None], axis=2)[..., 0]        # (D, D)
    off = 1.0 - jnp.eye(d, dtype=err.dtype)
    return jnp.sum(err * off), jnp.sum(off)


def geo_error_per_cp(
    pcds: np.ndarray,
    embeddings: np.ndarray,
    kp_indices: np.ndarray,
    dist_mats: Optional[np.ndarray] = None,
) -> Tuple[float, bool]:
    """Mean cross-instance keypoint error of one correspondence point.

    For every ordered pair of annotated clouds (i, j), i != j: look up
    cloud i's keypoint embedding in cloud j's embeddings (nearest neighbor
    in feature space) and measure the L2 (or geodesic, when ``dist_mats``
    is given) distance between the retrieved point and cloud j's annotated
    keypoint. Returns ``(mean_error, valid)``; ``valid`` is False when
    fewer than two clouds carry the keypoint (reference returns 0 there).

    Reference ``geo_error_per_cp`` (``imports/cpnet/utils.py:108-160``),
    with the per-pair KDTree loop collapsed into one device program.
    """
    kp_indices = np.asarray(kp_indices)
    valid_inds = np.nonzero(kp_indices >= 0)[0]
    if valid_inds.size < 2:
        return 0.0, False
    pcds = jnp.asarray(np.asarray(pcds)[valid_inds], jnp.float32)
    embeddings = jnp.asarray(np.asarray(embeddings)[valid_inds], jnp.float32)
    kp = jnp.asarray(kp_indices[valid_inds], jnp.int32)
    if dist_mats is None:
        total, cnt = _geo_error_l2(pcds, embeddings, kp)
    else:
        dist_mats = jnp.asarray(np.asarray(dist_mats)[valid_inds], jnp.float32)
        total, cnt = _geo_error_geodesic(pcds, embeddings, kp, dist_mats)
    return float(total) / float(cnt), True
