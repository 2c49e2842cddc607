"""Triangle-collision counting vs an independent numpy oracle.

The JAX path (`ops/collision.py`) decides each pair by a 6-way segment-vs-
triangle Möller–Trumbore battery; the oracle here uses Möller's interval
method (plane-distance signs + projected-interval overlap) in float64 — two
different algorithms agreeing on random soups is the correctness evidence.
Reference semantics under test: ``initialize_depth.py:compute_collision:74-89``
and ``extract_candidates:96-125``.
"""
import numpy as np
import pytest

from coma_tpu.ops.collision import (
    collision_curve, count_cross_collisions, count_self_collisions,
    filter_candidate_indices)


# ---------------------------------------------------------------- oracle --

def _interval(proj, dist):
    s = np.sign(dist)
    if np.any(s == 0) or abs(s.sum()) == 3:
        return None
    lone = int(np.flatnonzero(s == -np.sign(s.sum()))[0])
    others = [i for i in range(3) if i != lone]
    ts = [proj[lone] + (proj[o] - proj[lone])
          * dist[lone] / (dist[lone] - dist[o]) for o in others]
    return min(ts), max(ts)


def oracle_pair(t1, t2, eps=1e-12):
    t1 = np.asarray(t1, np.float64)
    t2 = np.asarray(t2, np.float64)
    n2 = np.cross(t2[1] - t2[0], t2[2] - t2[0])
    da = t1 @ n2 - n2 @ t2[0]
    if np.all(da > eps) or np.all(da < -eps):
        return False
    n1 = np.cross(t1[1] - t1[0], t1[2] - t1[0])
    db = t2 @ n1 - n1 @ t1[0]
    if np.all(db > eps) or np.all(db < -eps):
        return False
    line = np.cross(n1, n2)
    if np.max(np.abs(line)) < eps:     # coplanar: counted as non-intersecting
        return False
    axis = int(np.argmax(np.abs(line)))
    i1 = _interval(t1[:, axis], da)
    i2 = _interval(t2[:, axis], db)
    if i1 is None or i2 is None:
        return False
    return max(i1[0], i2[0]) <= min(i1[1], i2[1])


def oracle_cross(va, fa, vb, fb):
    ta, tb = va[fa], vb[fb]
    return sum(oracle_pair(x, y) for x in ta for y in tb)


def oracle_self(v, f):
    t = v[f]
    n = 0
    for i in range(len(f)):
        for j in range(i + 1, len(f)):
            if set(f[i]) & set(f[j]):
                continue
            n += oracle_pair(t[i], t[j])
    return n


def _soup(rng, n):
    """Random triangle soup: verts iid in the unit cube, no shared vertices."""
    v = rng.uniform(size=(3 * n, 3)).astype(np.float32)
    f = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return v, f


# ----------------------------------------------------------------- tests --

def test_known_crossing_and_separated_pairs():
    # T2 is perpendicular to T1's plane and pierces its interior
    t1v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    t2v = np.array([[0, 0, -1], [0.2, 0, 1], [-0.2, 0.1, 1]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    assert count_cross_collisions(t1v, f, t2v, f) == 1
    assert count_cross_collisions(t1v, f, t2v + 5.0, f) == 0
    assert oracle_pair(t1v, t2v) and not oracle_pair(t1v, t2v + 5.0)


def test_cross_count_matches_interval_oracle():
    rng = np.random.default_rng(7)
    va, fa = _soup(rng, 23)
    vb, fb = _soup(rng, 17)
    want = oracle_cross(va, fa, vb, fb)
    assert want > 0            # unit-cube soups overlap a lot
    got = count_cross_collisions(va, fa, vb, fb, max_collisions=10_000,
                                 block_a=8, block_b=16)
    assert got == want


def test_self_count_matches_oracle_and_excludes_adjacency():
    # a tetrahedron: every face pair shares an edge -> excluded -> 0
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    assert count_self_collisions(v, f) == 0
    # one mesh holding two independent random soups -> oracle count
    rng = np.random.default_rng(3)
    va, fa = _soup(rng, 19)
    vb, fb = _soup(rng, 13)
    v = np.concatenate([va, vb])
    f = np.concatenate([fa, fb + len(va)])
    want = oracle_self(v, f)
    assert want > 0
    assert count_self_collisions(v, f, max_collisions=10_000,
                                 block_a=8, block_b=32) == want


@pytest.mark.slow
def test_blocking_invariance_and_ragged_padding():
    rng = np.random.default_rng(11)
    va, fa = _soup(rng, 21)     # not a multiple of any block size used
    vb, fb = _soup(rng, 13)
    ref = count_cross_collisions(va, fa, vb, fb, max_collisions=10_000,
                                 block_a=128, block_b=1024)
    for ba, bb in [(4, 8), (16, 8), (8, 1024)]:
        assert count_cross_collisions(va, fa, vb, fb, max_collisions=10_000,
                                      block_a=ba, block_b=bb) == ref


def test_max_collisions_caps_like_the_bvh_buffer():
    rng = np.random.default_rng(5)
    va, fa = _soup(rng, 23)
    vb, fb = _soup(rng, 17)
    full = count_cross_collisions(va, fa, vb, fb, max_collisions=10_000)
    assert count_cross_collisions(va, fa, vb, fb, max_collisions=3) == 3
    assert full > 3


def test_collision_curve_matches_pointwise_counts():
    rng = np.random.default_rng(2)
    hv, hf = _soup(rng, 15)
    av, af = _soup(rng, 11)
    av = av + np.array([2.5, 0, 0], np.float32)   # start separated
    direction = np.array([1.0, 0.0, 0.0], np.float32)
    disps = np.linspace(0.0, 3.0, 7).astype(np.float32)
    curve = np.asarray(collision_curve(hv, hf, av, af, disps, direction,
                                       block_a=8, block_b=16))
    for d, c in zip(disps, curve):
        want = count_cross_collisions(hv + d * direction, hf, av, af,
                                      max_collisions=10_000,
                                      block_a=8, block_b=16)
        assert int(c) == want
    assert curve[0] == 0 and curve.max() > 0   # sweep actually collides


def _reference_filter(collisions, kernel_size):
    """Direct port of extract_candidates:118-125's loop, returning the
    CENTER index (idx + kernel_size//2) of each kept candidate."""
    collisions = list(collisions)
    half = kernel_size // 2
    kept = []
    for idx, center in enumerate(collisions[half:-half]):
        if collisions[idx + (half - 1)] == 0.0 and collisions[idx + (half + 1)] == 0.0:
            continue
        surrounding = (collisions[idx:idx + (half - 1)]
                       + collisions[idx + (half + 1):idx + half * 2])
        if center <= min(surrounding):
            kept.append(idx + half)
    return kept


@pytest.mark.parametrize("kernel_size", [5, 9])
def test_filter_candidate_indices_matches_reference_loop(kernel_size):
    rng = np.random.default_rng(9)
    for _ in range(20):
        d = 2 * kernel_size + 1
        curve = rng.integers(0, 4, size=d).astype(float)
        curve[rng.integers(0, d, size=3)] = 0.0    # force zero plateaus
        got = filter_candidate_indices(curve, kernel_size).tolist()
        assert got == _reference_filter(curve, kernel_size)
