"""Pallas TPU kernel: fused geodesic-Gaussian splat + accumulate.

The hot op of ComA extraction (reference hot loop:
``utils/coma.py:aggregate_single_sample_for_contact:279-323``): for each
(human-vertex, object-vertex) pair and both canonicalization directions,
splat the pair's canonicalized normal onto the N-point sphere grid with a
Gaussian-of-geodesic kernel and add into the (H, O, N) probability grids.

Why a kernel: at reference scale (H=10475, O=180, N=250) each sample touches
2 x 943M f32 accumulator elements. The XLA version materializes the
cos/arccos/exp intermediates in HBM, making the update ~4x memory traffic;
here the accumulator tile is read and written exactly ONCE per batch of S
samples, with all S splats computed in VMEM — turning the op from
HBM-bound into VPU-bound (measured: vreg-working-set bound, not
transcendental — see docs/KERNELS.md v3).

Layout: the (H, O) pairwise geometry (distances, canonicalized normal
components) is cheap and stays in XLA where it fuses fine; the kernel
receives the canonicalized components as three (S, H, O) planes per
direction and owns only the (H, O, N) splat+accumulate.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coma_tpu.affordance.state import ComAState
from coma_tpu.geometry.transforms import normalize_vectors


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# fdlibm-style f32 arccos from sqrt + rational polynomial (Mosaic lowers no
# acos/asin/atan primitives — only exp/log/sqrt/rsqrt). ~2 ulp over [-1, 1].
_PS0, _PS1, _PS2 = 1.6666586697e-01, -4.2743422091e-02, -8.6563630030e-03
_QS1 = -7.0662963390e-01
_PI, _PI_2 = 3.14159265358979, 1.5707963267948966


def _asin_core(x):
    """arcsin for |x| <= ~0.707: x + x·R(x²), fdlibm rational R."""
    z = x * x
    p = z * (_PS0 + z * (_PS1 + z * _PS2))
    q = 1.0 + z * _QS1
    return x + x * (p / q)


def acos_f32(x):
    """Branch-free f32 arccos for Pallas TPU kernels."""
    ax = jnp.abs(x)
    small = ax <= 0.5
    s = jnp.sqrt(jnp.maximum(0.5 * (1.0 - ax), 0.0))
    asin_s = _asin_core(jnp.where(small, 0.0, s))  # guard: only used when !small
    r_small = _PI_2 - _asin_core(jnp.where(small, x, 0.0))
    r_pos = 2.0 * asin_s           # x > 0.5
    r_neg = _PI - 2.0 * asin_s     # x < -0.5
    return jnp.where(small, r_small, jnp.where(x > 0, r_pos, r_neg))


def _fit_geo2_poly(sigma: float, cutoff: float = 1e-8, degree: int = 6):
    """Trace-time polynomial fit of θ² = arccos(1-t)² over the t-range where
    exp(-θ²/σ²) > cutoff.

    θ²(t) is analytic at t=0 (θ ≈ √(2t) ⇒ θ² ≈ 2t), so a low-degree poly is
    accurate on [0, t_max] — and everything past t_max contributes less
    than ``cutoff`` to the accumulators (invisible at f32, whose ulp near
    O(1) accumulator values is ~6e-8; degree 6 at cutoff 1e-8 keeps the
    splat-value error at 1.8e-7, identical to degree 8 at 1e-14). Returns
    (coeffs ascending, t_max), or None when the cutoff never bites
    (σ ≳ 0.55 ⇒ fall back to the exact arccos path).
    """
    import numpy as _np

    theta2_max = -sigma * sigma * _np.log(cutoff)
    theta_max = _np.sqrt(theta2_max)
    if theta_max >= _np.pi * 0.98:
        return None
    t_max = float(1.0 - _np.cos(theta_max))
    t = _np.linspace(0.0, t_max, 2048)
    theta2 = _np.arccos(_np.clip(1.0 - t, -1.0, 1.0)) ** 2
    coeffs = _np.polynomial.polynomial.polyfit(t, theta2, degree)
    return [float(c) for c in coeffs], t_max


def _geo2_gauss_fast(cos, poly, t_max, inv_s2, eps):
    """exp(-arccos(cos)²/σ²) via the fitted θ²(t) polynomial + cutoff.

    Measured dead end (don't retry): fitting the WHOLE splat value
    f(t) = exp(-θ²(t)/σ²) directly (degree 14, eliminating the exp) is
    perf-NEUTRAL on v5e — the VPU's exp costs about the same as the 6 extra
    Horner madds — and loses 4.6e-3 absolute accuracy to f32 Horner
    cancellation on the wider-range fit. θ²-poly + exact exp is the optimum.
    """
    t = jnp.maximum(1.0 - cos, eps)          # eps-clip matches the reference's
    inside = t <= t_max                      # arccos clip at cos -> 1
    tc = jnp.minimum(t, t_max)
    acc = poly[-1]
    for c in reversed(poly[:-1]):            # Horner, ~degree madds
        acc = acc * tc + c
    return jnp.where(inside, jnp.exp(-acc * inv_s2), 0.0)


def fused_contact_update_batch(
    state: ComAState,
    human_verts: jax.Array,    # (B, H, 3)
    human_normals: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,      # (B, O, 3)
    obj_normals: jax.Array,    # (B, O, 3)
    valid=None,
    slab: int = 8,
    lane_block=None,
) -> ComAState:
    """Drop-in replacement for ``contact_update_batch`` with the splat fused.

    Processes the batch in slabs of ``slab`` samples: the (S, H, O) canon
    planes for a slab are computed by XLA, then one kernel pass accumulates
    all S splats. The scalar accumulators (proximity, significance) are
    cheap and stay in XLA.
    """
    B, H, _ = human_verts.shape
    O = obj_verts.shape[1]
    if valid is None:
        valid = jnp.ones(B, human_verts.dtype)
    Bp = _round_up(B, slab)
    pad = Bp - B
    if pad:
        z = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        human_verts, human_normals = z(human_verts), z(human_normals)
        obj_verts, obj_normals = z(obj_verts), z(obj_normals)
        valid = jnp.pad(valid, (0, pad))

    # pad + transpose the multi-GB grids ONCE into the kernel's (H, N, O)
    # layout; the scan carries these and each slab's kernel accumulates in
    # place (aliased) with zero copies.
    tile_h = 8
    N = state.normal_res
    Hp, Np = _round_up(H, tile_h), _round_up(N, 8)
    # very large O (quant:full O=2048) must tile the lane dim or the
    # (TH, Np, Op) block overflows VMEM; O<=1536 keeps the full-dim block
    # (measured: Op=1504 compiles and the 1-D grid is faster than tiling).
    # Wide-O shapes additionally lane-block INSIDE the kernel (v4): the
    # per-slab canon rows at TO>512 spill the vreg file (see
    # _canon_splat_kernel); padding O to the lane-block multiple costs the
    # same physical vregs (1500 -> 1536 either way). CO=512 measures ~2%
    # faster than 256 at both production wide-O shapes (v4 sweep, see
    # docs/KERNELS.md); auto-pick prefers it when the 256-padded width
    # divides by 512 so narrower O never over-pads just to enable it.
    if O > 1536:
        tile_o = 512
        Op = _round_up(O, tile_o)
        if lane_block is None:
            lane_block = 512
    elif O > 512:
        if lane_block is None:
            lane_block = 512 if _round_up(O, 256) % 512 == 0 else 256
        Op = _round_up(O, lane_block) if lane_block else _round_up(O, 8)
        tile_o = Op
    else:
        Op = _round_up(O, 8)
        tile_o = Op
        if lane_block is None:
            lane_block = 0
    to_t = lambda a: jnp.pad(
        jnp.swapaxes(a, 1, 2), ((0, Hp - H), (0, Np - N), (0, Op - O))
    )
    ph_p = to_t(state.prob_grid_canon_human_wrt_obj)
    po_p = to_t(state.prob_grid_canon_obj_wrt_human)

    def slab_step(carry, slabs):
        ph_p, po_p, nom, den, sig_acc, used = carry
        hv, hn, ov, on, v = slabs
        s = state  # static config + constants (grids are carried separately)
        # (H, O) geometry in XLA (fuses fine, tiny vs the splat)
        diff = hv[:, :, None, :] - ov[:, None, :, :]
        dists = jnp.sqrt(jnp.sum(diff * diff, axis=-1))             # (S, H, O)
        keep = (v > 0)[:, None, None]
        sig = jnp.where(keep, (dists < s.spatial_grid_thres).astype(dists.dtype), 0.0)
        prox = jnp.where(keep, jnp.exp(-dists / s.spatial_grid_size), 0.0)

        # canonicalization happens INSIDE the kernel (v2): only the raw
        # normals ship in — no (S, H, O, 3) canon tensors, no component
        # relayouts (they cost as much as the splat at wide-O shapes)
        ph_p, po_p = canon_splat_accumulate_padded(
            ph_p, po_p, hn, on, s.canon_normal_grid, v,
            normalize_vectors(s.principle_vec[None], s.eps)[0],
            normalize_vectors(s.sub_principle_vec[None], s.eps)[0],
            sigma=s.normal_gaussian_sigma, eps=s.eps, tile_h=tile_h,
            tile_o=tile_o, lane_block=lane_block,
        )
        return (
            ph_p,
            po_p,
            nom + jnp.sum(prox, axis=0),
            den + jnp.sum(v),
            sig_acc + jnp.sum(sig, axis=0),
            used + jnp.sum(v),
        ), None

    reshape = lambda a: a.reshape((Bp // slab, slab) + a.shape[1:])
    carry = (
        ph_p,
        po_p,
        state.contact_dist_expectation_grid_nom,
        state.contact_dist_expectation_grid_denom,
        state.significant_contact_count,
        state.used_count,
    )
    (ph_p, po_p, nom, den, sig, used), _ = jax.lax.scan(
        slab_step,
        carry,
        (
            reshape(human_verts),
            reshape(human_normals),
            reshape(obj_verts),
            reshape(obj_normals),
            reshape(valid),
        ),
    )
    from_t = lambda a: jnp.swapaxes(a[:H, :N, :O], 1, 2)
    return dataclasses.replace(
        state,
        prob_grid_canon_human_wrt_obj=from_t(ph_p),
        prob_grid_canon_obj_wrt_human=from_t(po_p),
        contact_dist_expectation_grid_nom=nom,
        contact_dist_expectation_grid_denom=den,
        significant_contact_count=sig,
        used_count=used,
    )


# --------------------------------------------------------------------------
# v2: canonicalization fused INTO the kernel
# --------------------------------------------------------------------------
#
# The XLA-side canonicalize + (Hp, S8, Op) relayout of six component planes
# costs as much as the splat itself at wide-O shapes (measured ~30-60 ms per
# slab). The canonicalization is per-PAIR (h, o) — independent of N — so it
# is a (1, TO) lane-row epilogue inside the kernel (<7% of the splat work),
# and the kernel inputs collapse to the raw normals.

def _pick_n_blocks(Np: int, target: int = 8) -> int:
    """Largest block count ≤ target whose chunk stays sublane-aligned."""
    for nb in range(target, 0, -1):
        if Np % nb == 0 and (Np // nb) % 8 == 0:
            return nb
    return 1


def _canon_splat_kernel(
    ox_ref, oy_ref, oz_ref,   # (S8, TO) object normal components (VMEM)
    hx_ref, hy_ref, hz_ref,   # (TH, S8) human normal components (SMEM)
    g_ref,                    # (Np, 8): sphere grid xyz in cols 0..2 (VMEM)
    pq_ref,                   # (8, 1) SMEM: p (rows 0-2), sub_p (rows 3-5)
    v_ref,                    # (S, 1) SMEM validity
    ph_in, po_in, ph_out, po_out,   # aliased accumulators (TH, Np, TO)
    *, S: int, TH: int, sigma: float, eps: float, geo2_poly=None,
    lane_block: int = 0,
):
    # Register-pressure blocking (v3): the (Np, TO) accumulator pair alone
    # is ~128 vregs — holding both plus the splat temporaries live spills
    # to VMEM every inner step, and the spill traffic (not ALU, not exp:
    # deleting the exp measures 0% faster) bounds the kernel. Splatting the
    # N axis in sublane-aligned chunks keeps the live set inside the vreg
    # file: NB=8 × slab=8 measures 71 -> 98 samples/s at the qual config.
    NB = _pick_n_blocks(g_ref.shape[0])
    CH = g_ref.shape[0] // NB
    # Lane blocking (v4): at wide TO the per-s canon rows alone (6 comps ×
    # S slabs × TO/128 vregs — 576 vregs at TO=1536) exceed the vreg file,
    # and the spill round-trips halve the per-element rate vs the qual
    # shape (TO=256). The canon epilogue is per-LANE work, so chunking the
    # lane axis costs nothing extra: only the lane-INDEPENDENT human-normal
    # scalars are hoisted and shared across chunks.
    TO = ox_ref.shape[1]
    CO = TO
    if lane_block and lane_block % 128 == 0 and TO % lane_block == 0:
        CO = min(lane_block, TO)
    OB = TO // CO
    px, py, pz = pq_ref[0, 0], pq_ref[1, 0], pq_ref[2, 0]
    qx, qy, qz = pq_ref[3, 0], pq_ref[4, 0], pq_ref[5, 0]
    inv_s2 = 1.0 / (sigma * sigma)

    def gauss(cos):
        if geo2_poly is not None:
            poly, t_max = geo2_poly
            return _geo2_gauss_fast(cos, poly, t_max, inv_s2, eps)
        geo = acos_f32(jnp.clip(cos, -1.0 + eps, 1.0 - eps))
        return jnp.exp(-(geo * geo) * inv_s2)

    def h_body(h, _):
        # lane-independent scalars per (h, s): normalized human normal and
        # its p/q dots — computed once per pair, shared across lane chunks
        h_scal = []
        for s in range(S):
            v = v_ref[s, 0]
            # --- normalized inputs (matches canonicalize_pairwise's
            # normalize_first + x/max(norm, eps) semantics) ---
            hx0, hy0, hz0 = hx_ref[h, s], hy_ref[h, s], hz_ref[h, s]
            hn_n = jnp.maximum(jnp.sqrt(hx0 * hx0 + hy0 * hy0 + hz0 * hz0), eps)
            hx, hy, hz = hx0 / hn_n, hy0 / hn_n, hz0 / hn_n
            h_dot_p = hx * px + hy * py + hz * pz          # scalar
            h_dot_q = hx * qx + hy * qy + hz * qz
            h_scal.append((v, hx, hy, hz, h_dot_p, h_dot_q))

        _splat_lane_chunks(
            h, h_scal, ox_ref, oy_ref, oz_ref, g_ref,
            ph_in, po_in, ph_out, po_out,
            S=S, NB=NB, CH=CH, CO=CO, OB=OB, eps=eps, gauss=gauss,
            p=(px, py, pz), q=(qx, qy, qz),
        )
        return 0

    jax.lax.fori_loop(0, TH, h_body, 0)


def _splat_lane_chunks(h, h_scal, ox_ref, oy_ref, oz_ref, g_ref,
                       ph_in, po_in, ph_out, po_out,
                       *, S, NB, CH, CO, OB, eps, gauss, p, q):
    """Canon epilogue + splat for one h row, one CO-wide lane chunk at a
    time (v4): keeps the (1, CO) canon rows + (CH, CO) accumulator blocks
    inside the vreg file at wide-O shapes."""
    px, py, pz = p
    qx, qy, qz = q
    for ob in range(OB):
        olo = ob * CO
        # canon epilogue per (h, s, chunk) — N-independent
        canon_rows = []
        for s in range(S):
            v, hx, hy, hz, h_dot_p, h_dot_q = h_scal[s]
            ox0 = ox_ref[s, olo:olo + CO][None, :]          # (1, CO)
            oy0 = oy_ref[s, olo:olo + CO][None, :]
            oz0 = oz_ref[s, olo:olo + CO][None, :]
            on_n = jnp.maximum(jnp.sqrt(ox0 * ox0 + oy0 * oy0 + oz0 * oz0), eps)
            ox, oy, oz = ox0 / on_n, oy0 / on_n, oz0 / on_n

            # shared pair terms
            a_dot_b = hx * ox + hy * oy + hz * oz          # (1, CO) h·o
            o_dot_p = ox * px + oy * py + oz * pz          # (1, CO)
            o_dot_q = ox * qx + oy * qy + oz * qz

            def canon(aw, wk, inv, sing, c, ak, apk, bk, flipk):
                """out_k = a·w w_k inv + c a_k + (a·b) p_k - (a·p) b_k,
                flipped to 2(a·q)q_k - a_k on the singular branch."""
                pk = (px, py, pz)
                out = [
                    aw * wk[k] * inv + c * ak[k] + a_dot_b * pk[k] - apk * bk[k]
                    for k in range(3)
                ]
                out = [jnp.where(sing, flipk[k], out[k]) for k in range(3)]
                n = jnp.sqrt(out[0] * out[0] + out[1] * out[1] + out[2] * out[2])
                n = jnp.maximum(n, eps)
                return out[0] / n, out[1] / n, out[2] / n

            # direction 1: canon(a=human, b=object) -> human-wrt-obj grid
            w1 = (oy * pz - oz * py, oz * px - ox * pz, ox * py - oy * px)
            a_dot_w1 = hx * w1[0] + hy * w1[1] + hz * w1[2]
            sing1 = (1.0 + o_dot_p) < eps
            inv1 = jnp.where(sing1, 0.0, 1.0 / jnp.where(sing1, 1.0, 1.0 + o_dot_p))
            flip1 = (2.0 * h_dot_q * qx - hx, 2.0 * h_dot_q * qy - hy,
                     2.0 * h_dot_q * qz - hz)
            cxh, cyh, czh = canon(a_dot_w1, w1, inv1, sing1, o_dot_p,
                                  (hx, hy, hz), h_dot_p, (ox, oy, oz), flip1)

            # direction 2: canon(a=object, b=human) -> obj-wrt-human grid
            w2 = (hy * pz - hz * py, hz * px - hx * pz, hx * py - hy * px)
            a_dot_w2 = ox * w2[0] + oy * w2[1] + oz * w2[2]
            sing2 = (1.0 + h_dot_p) < eps
            inv2 = jnp.where(sing2, 0.0, 1.0 / jnp.where(sing2, 1.0, 1.0 + h_dot_p))
            flip2 = (2.0 * o_dot_q * qx - ox, 2.0 * o_dot_q * qy - oy,
                     2.0 * o_dot_q * qz - oz)
            cxo, cyo, czo = canon(a_dot_w2, w2, inv2, sing2, h_dot_p,
                                  (ox, oy, oz), o_dot_p, (hx, hy, hz), flip2)
            canon_rows.append((v, (cxh, cyh, czh), (cxo, cyo, czo)))

        for nb in range(NB):
            lo, hi = nb * CH, (nb + 1) * CH
            gx = g_ref[lo:hi, 0][:, None]
            gy = g_ref[lo:hi, 1][:, None]
            gz = g_ref[lo:hi, 2][:, None]
            if OB == 1:
                acc_h = ph_in[h, lo:hi]
                acc_o = po_in[h, lo:hi]
            else:
                acc_h = ph_in[h, lo:hi, olo:olo + CO]
                acc_o = po_in[h, lo:hi, olo:olo + CO]
            for s in range(S):
                v, (cxh, cyh, czh), (cxo, cyo, czo) = canon_rows[s]
                acc_h = acc_h + v * gauss(gx * cxh + gy * cyh + gz * czh)
                acc_o = acc_o + v * gauss(gx * cxo + gy * cyo + gz * czo)
            if OB == 1:
                ph_out[h, lo:hi] = acc_h
                po_out[h, lo:hi] = acc_o
            else:
                ph_out[h, lo:hi, olo:olo + CO] = acc_h
                po_out[h, lo:hi, olo:olo + CO] = acc_o


def canon_splat_accumulate_padded(
    ph_p: jax.Array,          # (Hp, Np, Op) padded transposed accumulator
    po_p: jax.Array,
    human_normals: jax.Array,  # (S, H, 3)
    obj_normals: jax.Array,    # (S, O, 3)
    grid: jax.Array,           # (N, 3)
    valid: jax.Array,          # (S,)
    p: jax.Array,              # (3,) principal axis (normalized)
    sub_p: jax.Array,          # (3,)
    sigma: float,
    eps: float,
    tile_h: int = 8,
    tile_o: int = 0,
    lane_block: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """v2 entry: canonicalize + splat + accumulate, one HBM pass per slab."""
    S, H, _ = human_normals.shape
    O = obj_normals.shape[1]
    N = grid.shape[0]
    Hp, Np, Op = ph_p.shape
    if tile_o <= 0:
        tile_o = Op
    assert Hp % tile_h == 0 and Np % 8 == 0 and Op % tile_o == 0

    S8 = _round_up(S, 8)
    hcomp = lambda k: jnp.pad(
        jnp.swapaxes(human_normals[..., k], 0, 1), ((0, Hp - H), (0, S8 - S))
    )                                                           # (Hp, S8)
    ocomp = lambda k: jnp.pad(obj_normals[..., k], ((0, S8 - S), (0, Op - O)))
    g = jnp.zeros((Np, 8), dtype=grid.dtype).at[:N, :3].set(grid)
    pq = jnp.concatenate([p, sub_p, jnp.zeros(2, p.dtype)]).reshape(8, 1)
    v = valid.reshape(S, 1).astype(ph_p.dtype)

    if tile_o == Op:
        grid_dims = (Hp // tile_h,)
        o_idx = lambda i: (0, 0)
        h_idx = lambda i: (i, 0)
        acc_idx = lambda i: (i, 0, 0)
        const_idx = lambda i: (0, 0)
    else:
        grid_dims = (Hp // tile_h, Op // tile_o)
        o_idx = lambda i, j: (0, j)
        h_idx = lambda i, j: (i, 0)
        acc_idx = lambda i, j: (i, 0, j)
        const_idx = lambda i, j: (0, 0)

    o_spec = pl.BlockSpec((S8, tile_o), o_idx, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((tile_h, S8), h_idx, memory_space=pltpu.SMEM)
    acc_spec = pl.BlockSpec((tile_h, Np, tile_o), acc_idx, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _canon_splat_kernel, S=S, TH=tile_h, sigma=float(sigma), eps=float(eps),
        geo2_poly=_fit_geo2_poly(float(sigma)), lane_block=int(lane_block),
    )
    return pl.pallas_call(
        kernel,
        grid=grid_dims,
        in_specs=[o_spec] * 3
        + [h_spec] * 3
        + [
            pl.BlockSpec((Np, 8), const_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((S, 1), const_idx, memory_space=pltpu.SMEM),
            acc_spec,
            acc_spec,
        ],
        out_specs=[acc_spec, acc_spec],
        out_shape=[
            jax.ShapeDtypeStruct(ph_p.shape, ph_p.dtype, vma=jax.typeof(ph_p).vma),
            jax.ShapeDtypeStruct(po_p.shape, po_p.dtype, vma=jax.typeof(po_p).vma),
        ],
        input_output_aliases={9: 0, 10: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Hp * Op * Np * 10,
            bytes_accessed=2 * 2 * Hp * Op * Np * 4 + 3 * S * (Hp + Op) * 4,
            transcendentals=2 * S * Hp * Op * Np * 2,
        ),
    )(
        ocomp(0), ocomp(1), ocomp(2), hcomp(0), hcomp(1), hcomp(2),
        g, pq, v, ph_p, po_p,
    )
