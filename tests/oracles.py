"""Independent numpy oracle implementations of the ComA math.

Written from the mathematical spec (rotate normal `a` by the rotation taking
normal `b` onto the principal axis `p`; Gaussian-of-geodesic splatting onto a
Fibonacci sphere grid; proximity expectation; voxel occupancy) — NOT from
either the reference code or the JAX implementation — so the tests are a
genuine cross-check.
"""
import numpy as np


def unit(v, eps=1e-12):
    return v / max(np.linalg.norm(v), eps)


def rotation_taking_u_to_v(u, v, sub_axis, eps=1e-7):
    """3x3 rotation R with R u = v (u, v unit). At u = -v, rotate 180° about
    sub_axis (which must be orthogonal to v)."""
    c = float(np.dot(u, v))
    if 1.0 + c < eps:
        q = unit(np.asarray(sub_axis, dtype=np.float64))
        return 2.0 * np.outer(q, q) - np.eye(3)
    axis = np.cross(u, v)
    s = np.linalg.norm(axis)
    if s < 1e-12:
        return np.eye(3)
    k = axis / s
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    angle = np.arctan2(s, c)
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def canonicalize_oracle(a, b, p, sub_p):
    """(A,B,3): rotate each a_i by R(b_j -> p), per-pair loop."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    p = unit(np.asarray(p, dtype=np.float64))
    sub_p = unit(np.asarray(sub_p, dtype=np.float64))
    A, B = len(a), len(b)
    out = np.zeros((A, B, 3))
    for j in range(B):
        R = rotation_taking_u_to_v(unit(b[j]), p, sub_p)
        for i in range(A):
            out[i, j] = unit(R @ unit(a[i]))
    return out


def fibonacci_sphere_oracle(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + np.sqrt(5)) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], -1
    )


def splat_oracle(grid, dirs, sigma, eps):
    """(..., N): exp(-arccos(clip(d·g))² / σ²) per direction/grid pair."""
    cos = np.clip(dirs @ grid.T, -1 + eps, 1 - eps)
    return np.exp(-np.arccos(cos) ** 2 / sigma**2)


def contact_update_oracle(acc, hv, hn, ov, on, p, sub_p, grid, sigma, grid_size, thres, eps):
    """Apply one sample to an accumulator dict (all float64 numpy)."""
    H, O = len(hv), len(ov)
    d = np.linalg.norm(hv[:, None, :] - ov[None, :, :], axis=-1)  # H,O
    acc["sig"] = acc["sig"] + (d < thres).astype(np.float64)
    acc["nom"] = acc["nom"] + np.exp(-d / grid_size)
    acc["denom"] = acc["denom"] + 1.0
    canon_h = canonicalize_oracle(hn, on, p, sub_p)               # H,O,3
    canon_o = canonicalize_oracle(on, hn, p, sub_p).transpose(1, 0, 2)  # H,O,3
    acc["ph"] = acc["ph"] + splat_oracle(grid, canon_h, sigma, eps)
    acc["po"] = acc["po"] + splat_oracle(grid, canon_o, sigma, eps)
    acc["count"] = acc["count"] + 1
    return acc


def occupancy_update_oracle(grid_centers, hv, anchor, thres):
    """(H, R, R, R) boolean hits: |human_vert - anchor - center| < thres."""
    x = hv - anchor[None, :]                                  # H,3
    diff = grid_centers[None] - x[:, :, None, None, None]     # H,3,R,R,R
    d = np.sqrt((diff**2).sum(axis=1))
    return (d < thres).astype(np.float64)
