"""RANSAC inlier mining over multi-view triangulations (vmapped JAX).

Reference parity: ``optimize_depth.py:compute_ransac_inclusives_with_triangulation:143-368``:
for the reference view's regressed 2-D joints, triangulate against every
other view's prediction (DLT), keep candidates whose reference-view
reprojection MSE is under ``triangulation_threshold``, sort by total MSE,
cap at ``maximum_candidates``, then RANSAC: each candidate's triangulation
votes for every candidate whose own-view reprojection error is under
``ransac_threshold``; the triangulation with the most votes defines the
inlier set.

TPU-first: the reference solves a pinv per joint per candidate on CPU; here
every candidate triangulates in one vmapped batch and the RANSAC vote is a
single (C, C) masked matrix.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.lifting.cameras import OrthoCamera, project_points, triangulate_pair


@dataclasses.dataclass
class RansacResult:
    inlier_indices: np.ndarray      # indices into the candidate list, MSE-sorted
    best_candidate: int             # index of the winning triangulation
    num_inliers: int
    triangulations: np.ndarray      # (C, J, 3)
    mses: np.ndarray                # (C,) total (ref + own) reprojection MSE


def mine_ransac_inliers(
    ref_camera: OrthoCamera,
    ref_joints_2d: jax.Array,          # (J, 2) selected joints, reference view
    cand_cameras: List[OrthoCamera],   # C other-view cameras
    cand_joints_2d: jax.Array,         # (C, J, 2) other views' regressed joints
    maximum_candidates: int = 400,
    ransac_threshold: float = 200.0,
    triangulation_threshold: float = 10.0,
) -> Optional[RansacResult]:
    """Returns the winning inlier set, or None if no candidate survives."""
    C = len(cand_cameras)
    if C == 0:
        return None
    Rs = jnp.stack([c.R for c in cand_cameras])
    ts = jnp.stack([c.t for c in cand_cameras])
    scale = cand_cameras[0].scale
    resolution = cand_cameras[0].resolution

    def tri_one(Rc, tc, joints_c):
        cam = OrthoCamera(R=Rc, t=tc, scale=scale, resolution=resolution)
        X = triangulate_pair(ref_camera, cam, ref_joints_2d, joints_c)  # (J, 3)
        ref_mse = jnp.mean(
            jnp.sum((project_points(ref_camera, X)[:, :2] - ref_joints_2d) ** 2, -1)
        )
        own_mse = jnp.mean(
            jnp.sum((project_points(cam, X)[:, :2] - joints_c) ** 2, -1)
        )
        return X, ref_mse, own_mse

    tri, ref_mse, own_mse = jax.vmap(tri_one)(Rs, ts, cand_joints_2d)  # (C,J,3),(C,),(C,)
    total_mse = np.asarray(ref_mse + own_mse)
    ref_mse = np.asarray(ref_mse)

    # keep candidates under the triangulation threshold, sorted by total MSE
    keep = np.flatnonzero(ref_mse < triangulation_threshold)
    if keep.size == 0:
        return None
    keep = keep[np.argsort(total_mse[keep])][:maximum_candidates]
    K = keep.size

    # RANSAC vote: reproject candidate i's triangulation into candidate j's
    # view, compare against j's own 2-D joints
    keep_j = jnp.asarray(keep)
    tri_keep = tri[keep_j]           # (K, J, 3)
    Rs_keep = Rs[keep_j]
    ts_keep = ts[keep_j]
    joints_keep = cand_joints_2d[keep_j]

    def vote_row(X):
        def err_j(Rc, tc, joints_c):
            cam = OrthoCamera(R=Rc, t=tc, scale=scale, resolution=resolution)
            return jnp.mean(
                jnp.sum((project_points(cam, X)[:, :2] - joints_c) ** 2, -1)
            )

        return jax.vmap(err_j)(Rs_keep, ts_keep, joints_keep)

    errors = jax.vmap(vote_row)(tri_keep)             # (K, K)
    votes = np.asarray(errors) < ransac_threshold     # (K, K) bool
    counts = votes.sum(axis=1)
    best = int(np.argmax(counts))
    inlier_local = np.flatnonzero(votes[best])
    # sort inliers by their vote error (reference sorts by joints_MSE)
    inlier_local = inlier_local[np.argsort(np.asarray(errors)[best, inlier_local])]
    return RansacResult(
        inlier_indices=keep[inlier_local],
        best_candidate=int(keep[best]),
        num_inliers=int(counts[best]),
        triangulations=np.asarray(tri),
        mses=total_mse,
    )
