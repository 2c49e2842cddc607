"""ComA contact/orientation aggregation and derivation (pure JAX).

Reference parity: the math of ``utils/coma.py:ComA`` —
``aggregate_single_sample_for_contact:279-323``, ``compute_contact_map:333``,
``significant_contact_pairs:369``, ``aggregate_contact_for_significant_pairs:385``,
``compute_nonphysical_response_sphere:441`` (+``_v2:529``) — re-designed as
pure functions over :class:`coma_tpu.affordance.state.ComAState` so that

- the per-sample update jits into one fused XLA program,
- a batch of samples is a ``lax.scan`` (accumulators are associative sums),
- multi-chip runs shard the H axis and/or scan disjoint sample shards and
  ``psum`` the accumulators once at the end.
"""
from __future__ import annotations

import dataclasses

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from coma_tpu.affordance.canonicalize import canonicalize_pairwise
from coma_tpu.affordance.sphere import geodesic_gaussian
from coma_tpu.affordance.state import ComAState


# ---------------------------------------------------------------------------
# Aggregation (the hot path)
# ---------------------------------------------------------------------------

def contact_contribution(
    state: ComAState,
    human_verts: jax.Array,    # (H, 3)
    human_normals: jax.Array,  # (H, 3)
    obj_verts: jax.Array,      # (O, 3)
    obj_normals: jax.Array,    # (O, 3)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One sample's additive contribution to the accumulators.

    Returns ``(splat_h_wrt_o, splat_o_wrt_h, proximity, significant)`` with
    shapes ``(H,O,N), (H,O,N), (H,O), (H,O)``. Kept separate from the state
    add so the same code serves the scan path, the vmap-batch path, and the
    Pallas-fused path's correctness oracle.
    """
    eps = state.eps
    # Pairwise Euclidean distances (H, O). H·O·3 is small relative to H·O·N;
    # XLA fuses the subtract/square/sum into one pass.
    diff = human_verts[:, None, :] - obj_verts[None, :, :]
    rel_dists = jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    significant = (rel_dists < state.spatial_grid_thres).astype(rel_dists.dtype)
    proximity = jnp.exp(-rel_dists / state.spatial_grid_size)

    canon_h_wrt_o = canonicalize_pairwise(
        human_normals, obj_normals, state.principle_vec, state.sub_principle_vec, eps
    )  # (H, O, 3)
    canon_o_wrt_h = canonicalize_pairwise(
        obj_normals, human_normals, state.principle_vec, state.sub_principle_vec, eps
    )  # (O, H, 3)
    canon_o_wrt_h = jnp.swapaxes(canon_o_wrt_h, 0, 1)  # (H, O, 3)

    sigma = state.normal_gaussian_sigma
    splat_h = geodesic_gaussian(state.canon_normal_grid, canon_h_wrt_o, sigma, eps)
    splat_o = geodesic_gaussian(state.canon_normal_grid, canon_o_wrt_h, sigma, eps)
    return splat_h, splat_o, proximity, significant


def contact_update(
    state: ComAState,
    human_verts: jax.Array,
    human_normals: jax.Array,
    obj_verts: jax.Array,
    obj_normals: jax.Array,
) -> ComAState:
    """Aggregate one HOI sample (reference: ``aggregate_single_sample_for_contact``)."""
    splat_h, splat_o, proximity, significant = contact_contribution(
        state, human_verts, human_normals, obj_verts, obj_normals
    )
    return _add_contribution(state, splat_h, splat_o, proximity, significant, 1.0)


def _add_contribution(state, splat_h, splat_o, proximity, significant, count):
    return dataclasses.replace(
        state,
        prob_grid_canon_human_wrt_obj=state.prob_grid_canon_human_wrt_obj + splat_h,
        prob_grid_canon_obj_wrt_human=state.prob_grid_canon_obj_wrt_human + splat_o,
        contact_dist_expectation_grid_nom=state.contact_dist_expectation_grid_nom + proximity,
        contact_dist_expectation_grid_denom=state.contact_dist_expectation_grid_denom + count,
        significant_contact_count=state.significant_contact_count + significant,
        used_count=state.used_count + count,
    )


def contact_update_batch(
    state: ComAState,
    human_verts: jax.Array,    # (B, H, 3)
    human_normals: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,      # (B, O, 3)
    obj_normals: jax.Array,    # (B, O, 3)
    valid: Optional[jax.Array] = None,  # (B,) 1/0 — padding mask for ragged shards
) -> ComAState:
    """Aggregate a batch of samples with ``lax.scan`` (sequential in B).

    Sequential-in-B keeps peak memory at one (H,O,N) contribution regardless
    of batch size — the reference's scale limit was exactly this activation
    (SURVEY.md §6). ``valid`` lets multi-chip shards pad to equal length: a
    padded slot contributes zeros (matching the reference semantics where the
    sample simply doesn't exist).
    """
    if valid is None:
        valid = jnp.ones(human_verts.shape[0], dtype=human_verts.dtype)

    def step(s, batch):
        hv, hn, ov, on, v = batch
        splat_h, splat_o, proximity, significant = contact_contribution(s, hv, hn, ov, on)
        # Mask with `where`, not multiply: a padded slot may contain
        # non-finite garbage and 0 * nan = nan would poison the accumulators.
        keep = v > 0
        s = _add_contribution(
            s,
            jnp.where(keep, splat_h, 0.0),
            jnp.where(keep, splat_o, 0.0),
            jnp.where(keep, proximity, 0.0),
            jnp.where(keep, significant, 0.0),
            v,
        )
        return s, None

    state, _ = jax.lax.scan(
        step, state, (human_verts, human_normals, obj_verts, obj_normals, valid)
    )
    return state


def merge_states(*states: ComAState) -> ComAState:
    """Merge independently aggregated accumulators (associative sum).

    This is the cross-chip/cross-host reduction: shard the sample list, run
    :func:`contact_update_batch` per shard, then one ``psum`` — the TPU-native
    replacement for the reference's never-communicating
    ``--parallel_idx/--parallel_num`` processes.
    """
    first = states[0]
    if len(states) == 1:
        return first
    summed = {
        f: sum(getattr(s, f) for s in states)
        for f in (
            "prob_grid_canon_human_wrt_obj",
            "prob_grid_canon_obj_wrt_human",
            "contact_dist_expectation_grid_nom",
            "contact_dist_expectation_grid_denom",
            "significant_contact_count",
            "used_count",
        )
    }
    return dataclasses.replace(first, **summed)


# ---------------------------------------------------------------------------
# Derivations (pure functions of the accumulators)
# ---------------------------------------------------------------------------

def normalized_prob_grids(state: ComAState) -> Tuple[jax.Array, jax.Array]:
    """Normalize the relative-normal distributions over the sphere axis.

    Reference: ``normalize_prob_grid_for_normals:328-330`` (note the
    reference mutates in place; we return copies).
    """
    ph = state.prob_grid_canon_human_wrt_obj
    po = state.prob_grid_canon_obj_wrt_human
    ph = ph / (jnp.sum(ph, axis=-1, keepdims=True) + state.eps)
    po = po / (jnp.sum(po, axis=-1, keepdims=True) + state.eps)
    return ph, po


def expected_proximity(state: ComAState) -> jax.Array:
    """E[exp(-d / grid_size)] per (human, obj) vertex pair. (H, O)."""
    return (
        state.contact_dist_expectation_grid_nom
        / state.contact_dist_expectation_grid_denom
    )


def contact_map(state: ComAState, which: str = "both") -> Dict[str, Optional[jax.Array]]:
    """Per vertex-pair contact scores (reference: ``compute_contact_map:333-366``).

    contact(h, o) = Σ_n p(n | h,o) · (1 - n·p̂)/2 · E[proximity](h, o)
    """
    assert which in ("human", "obj", "both")
    ph, po = normalized_prob_grids(state)
    anti_align = (
        1.0 - jnp.sum(state.canon_normal_grid * state.principle_vec[None, :], axis=-1)
    ) / 2.0  # (N,)
    prox = expected_proximity(state)
    out: Dict[str, Optional[jax.Array]] = {"human": None, "obj": None}
    if which in ("human", "both"):
        out["human"] = jnp.sum(ph * anti_align[None, None, :], axis=-1) * prox
    if which in ("obj", "both"):
        out["obj"] = jnp.sum(po * anti_align[None, None, :], axis=-1) * prox
    return out


def significant_contact_pairs(state: ComAState, significant_contact_ratio: float) -> jax.Array:
    """(H, O) boolean: pairs in contact in ≥ ratio·num_samples samples.

    Reference: ``significant_contact_pairs:369-382``.
    """
    threshold = significant_contact_ratio * state.used_count
    return state.significant_contact_count >= threshold


def aggregate_contact(
    state: ComAState,
    which: str,                       # 'human' or 'obj'
    significant_contact_ratio: float,
) -> Tuple[jax.Array, jax.Array]:
    """Aggregated 1-D contact map + the significant-vertex indicator.

    Reference: ``aggregate_contact_for_significant_pairs:385-438`` +
    ``get_aggregated_contact:614-641``. For 'human': max over object vertices
    that have significant contact with any human vertex; zeros if none.
    Returns ``(aggregated, vertex_indicator)`` with shapes ``(H,), (H,)`` for
    'human' (or ``(O,), (O,)`` for 'obj'); the indicator marks vertices
    participating in at least one significant pair (reference returns their
    indices — do ``np.flatnonzero`` on the indicator outside jit).
    """
    assert which in ("human", "obj")
    pairs = significant_contact_pairs(state, significant_contact_ratio)  # (H, O)
    cmap = contact_map(state, which)[which]                              # (H, O)
    if which == "human":
        col_mask = jnp.any(pairs, axis=0)        # (O,) objects w/ significant contact
        masked = jnp.where(col_mask[None, :], cmap, -jnp.inf)
        agg = jnp.where(jnp.any(col_mask), jnp.max(masked, axis=-1), 0.0)  # (H,)
        indicator = jnp.any(pairs, axis=1)       # (H,)
    else:
        row_mask = jnp.any(pairs, axis=1)        # (H,)
        masked = jnp.where(row_mask[:, None], cmap, -jnp.inf)
        agg = jnp.where(jnp.any(row_mask), jnp.max(masked, axis=0), 0.0)   # (O,)
        indicator = jnp.any(pairs, axis=0)       # (O,)
    return agg, indicator


def nonphysical_response(
    state: ComAState, n_bin: float, which: str = "human", v2: bool = False
) -> jax.Array:
    """Orientational-tendency score in [0, 1] per (H, O) pair.

    1 + (negated normalized Shannon entropy) of the discretized sphere
    distribution. Reference: ``compute_nonphysical_response_sphere:441-487``
    (v1) and ``:529-579`` (v2, principal-alignment weighted).
    """
    assert which in ("human", "obj")
    ph, po = normalized_prob_grids(state)
    p = ph if which == "human" else po
    p = jnp.round(p * n_bin) / n_bin
    plogp = jnp.where(p == 0.0, 0.0, p * jnp.log(p))  # (H, O, N)
    if not v2:
        return jnp.sum(plogp, axis=-1) / jnp.log(n_bin) + 1.0
    align = jnp.sum(state.canon_normal_grid * state.principle_vec[None, :], axis=-1)  # (N,)
    per_bin = plogp / jnp.log(n_bin) + 1.0
    return jnp.sum(per_bin * align[None, None, :], axis=-1)


def orientational_tendency(state: ComAState, obj_index: int = 0, n_bin: float = 1e6) -> jax.Array:
    """The shipped orientation product: min-max normalized v1 score for one
    object vertex (reference: ``src/coma/extract_coma.py:459-471``)."""
    score = nonphysical_response(state, n_bin=n_bin, which="human")[:, obj_index]  # (H,)
    return (score - jnp.min(score)) / (jnp.max(score) - jnp.min(score))
