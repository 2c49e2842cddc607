"""Multi-device sharded aggregation tests (8-device virtual CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.affordance.contact import aggregate_contact, contact_update_batch
from coma_tpu.affordance.occupancy import aggregated_occupancy, occupancy_update_batch
from coma_tpu.affordance.state import init_coma_state, init_occupancy_state
from coma_tpu.parallel import (
    default_mesh,
    pad_batch,
    sharded_contact_aggregate,
    sharded_occupancy_aggregate,
)

H, O, N = 16, 12, 32


def make_batch(rng, B):
    hv = jnp.asarray(rng.normal(size=(B, H, 3)) * 0.3, dtype=jnp.float32)
    hn = jnp.asarray(rng.normal(size=(B, H, 3)), dtype=jnp.float32)
    ov = jnp.asarray(rng.normal(size=(B, O, 3)) * 0.3, dtype=jnp.float32)
    on = jnp.asarray(rng.normal(size=(B, O, 3)), dtype=jnp.float32)
    return hv, hn, ov, on


def test_mesh_has_8_devices():
    assert default_mesh().shape["data"] == 8


@pytest.mark.parametrize("B", [
    8,
    pytest.param(13, marks=pytest.mark.slow),  # ragged, exercises padding
    pytest.param(16, marks=pytest.mark.slow),
])  # B=8 is the fast-lane representative
def test_sharded_contact_matches_sequential(rng, B):
    hv, hn, ov, on = make_batch(rng, B)
    state0 = init_coma_state(H, O, N, 0.07, 0.24)
    sharded = sharded_contact_aggregate(state0, hv, hn, ov, on)
    joint = contact_update_batch(state0, hv, hn, ov, on)
    assert float(sharded.used_count) == B
    # constants must survive the psum un-scaled
    np.testing.assert_array_equal(
        np.asarray(sharded.canon_normal_grid), np.asarray(state0.canon_normal_grid)
    )
    a, _ = aggregate_contact(sharded, "human", 0.1)
    b, _ = aggregate_contact(joint, "human", 0.1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert np.isfinite(np.asarray(sharded.prob_grid_canon_human_wrt_obj)).all()


def test_sharded_occupancy_matches_sequential(rng):
    B = 11
    hv, _, ov, _ = make_batch(rng, B)
    ov = jnp.tile(ov[:1], (B, 1, 1))  # one object across samples, like real data
    occ0 = init_occupancy_state(H, O, spatial_res=8, scale_tolerance=3.0)
    sharded = sharded_occupancy_aggregate(occ0, hv, ov)
    joint = occupancy_update_batch(occ0, hv, ov)
    assert float(sharded.used_count) == B
    np.testing.assert_allclose(
        np.asarray(aggregated_occupancy(sharded)),
        np.asarray(aggregated_occupancy(joint)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.anchor_vert), np.asarray(ov[0, 0]), rtol=1e-6
    )


@pytest.mark.parametrize("B_total,bs", [
    (16, 8),  # fast-lane representative: the B=8 shard program is already
              # compiled by test_sharded_contact_matches_sequential[8], so
              # this only adds the joint-16 compile; 2 chained calls are
              # enough to catch the compounding (it multiplied on EVERY call)
    pytest.param(13, 4, marks=pytest.mark.slow),  # ragged chain: 4,4,4,1
])
def test_sharded_contact_chains_batch_over_batch(rng, B_total, bs):
    """Regression (round 5): psum-ing the updated REPLICATED state multiplied
    the carried-in accumulators by the device count on every chained call —
    the streaming extraction aggregates batch-over-batch exactly like this.
    Correct semantics: state_in + sum of per-shard deltas."""
    hv, hn, ov, on = make_batch(rng, B_total)
    state0 = init_coma_state(H, O, N, 0.07, 0.24)
    state = state0
    for k in range(0, B_total, bs):
        state = sharded_contact_aggregate(
            state, hv[k:k + bs], hn[k:k + bs], ov[k:k + bs], on[k:k + bs])
    joint = contact_update_batch(state0, hv, hn, ov, on)
    assert float(state.used_count) == B_total  # was 8x-compounded pre-fix
    for f in ("prob_grid_canon_human_wrt_obj", "prob_grid_canon_obj_wrt_human",
              "contact_dist_expectation_grid_nom", "significant_contact_count"):
        np.testing.assert_allclose(
            np.asarray(getattr(state, f)), np.asarray(getattr(joint, f)),
            rtol=1e-5, atol=1e-6, err_msg=f)


@pytest.mark.slow
def test_sharded_occupancy_chains_batch_over_batch(rng):
    B_total, bs = 13, 4
    hv, _, ov, _ = make_batch(rng, B_total)
    ov = jnp.tile(ov[:1], (B_total, 1, 1))  # one object, like real data
    occ0 = init_occupancy_state(H, O, spatial_res=8, scale_tolerance=3.0)
    occ = occ0
    for k in range(0, B_total, bs):
        occ = sharded_occupancy_aggregate(occ, hv[k:k + bs], ov[k:k + bs])
    joint = occupancy_update_batch(occ0, hv, ov)
    assert float(occ.used_count) == B_total
    np.testing.assert_allclose(
        np.asarray(occ.spatial_occupancy_grids),
        np.asarray(joint.spatial_occupancy_grids), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(occ.anchor_vert), np.asarray(joint.anchor_vert))


def test_pad_batch_mask():
    a = jnp.ones((3, 4))
    (padded,), mask = pad_batch([a], 8)
    assert padded.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(mask), [1, 1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(padded[3:]), 0.0)


def test_sharded_with_explicit_valid_mask(rng):
    """Caller-provided valid mask composes with the padding mask."""
    B = 10
    hv, hn, ov, on = make_batch(rng, B)
    valid = jnp.array([1.0] * 7 + [0.0] * 3)
    state0 = init_coma_state(H, O, N, 0.07, 0.24)
    sharded = sharded_contact_aggregate(state0, hv, hn, ov, on, valid=valid)
    joint = contact_update_batch(state0, hv[:7], hn[:7], ov[:7], on[:7])
    assert float(sharded.used_count) == 7
    np.testing.assert_allclose(
        np.asarray(sharded.prob_grid_canon_human_wrt_obj),
        np.asarray(joint.prob_grid_canon_human_wrt_obj),
        rtol=1e-4, atol=1e-6,
    )


# ------------------------------------------------- flagship dp-sharding ----


def _tiny_flagship():
    """Tiny adaptive-mask pipeline with params-threading (generate_p)."""
    from coma_tpu.models.diffusion.pipeline import (
        AdaptiveMaskConfig,
        AdaptiveMaskInpaintPipeline,
    )
    from coma_tpu.models.diffusion.unet import UNet2DCondition, tiny_unet_config
    from coma_tpu.models.diffusion.vae import Decoder, Encoder, tiny_vae_config

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    unet = UNet2DCondition(ucfg)
    enc, dec = Encoder(vcfg), Decoder(vcfg)
    R = 64
    k = jax.random.PRNGKey(0)
    params = dict(
        unet=unet.init(k, jnp.zeros((1, 8, 8, 9)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim))),
        vae_encoder=enc.init(k, jnp.zeros((1, R, R, 3))),
        vae_decoder=dec.init(k, jnp.zeros((1, 8, 8, 4))),
    )
    pipe = AdaptiveMaskInpaintPipeline(
        unet_fn=lambda p, lat, t, ctx: unet.apply(p["unet"], lat, t, ctx),
        vae_encode_fn=lambda p, img: enc.apply(p["vae_encoder"], img),
        vae_decode_fn=lambda p, lat: dec.apply(p["vae_decoder"], lat),
        # stub person segmenter: bright-region threshold (per-pixel -> dp-safe)
        segment_fn=lambda p, images: (images.mean(-1) > 0.6).astype(jnp.float32),
        config=AdaptiveMaskConfig(num_inference_steps=50),
    )
    return pipe, params, R


@pytest.mark.slow
def test_flagship_dp_sharded_matches_single_device(rng):
    """The FULL adaptive-mask scan (UNet+CFG+DDIM+segment+re-encode) under a
    data mesh must reproduce the single-device result (VERDICT r2 task 2:
    the in-program successor of inpaint.sh's process-per-GPU fan-out)."""
    from coma_tpu.parallel.flagship import data_parallel_generate, pad_ragged_batch

    pipe, params, R = _tiny_flagship()
    B = 6  # ragged: pads to 8 over the mesh
    img = jnp.asarray(rng.uniform(-1, 1, size=(B, R, R, 3)), jnp.float32)
    mask = jnp.zeros((B, R, R)).at[:, 8:40, 8:40].set(1.0)
    ctx = jnp.asarray(rng.normal(size=(B, 7, 32)), jnp.float32)
    neg = jnp.zeros_like(ctx)
    key = jax.random.PRNGKey(3)

    single = jax.jit(pipe.generate_p)(params, key, img, mask, ctx, neg)

    mesh = default_mesh()
    n_dev = mesh.shape["data"]
    (pimg, pmask, pctx, pneg), B_real = pad_ragged_batch([img, mask, ctx, neg], n_dev)
    assert B_real == B and pimg.shape[0] == 8
    gen = data_parallel_generate(pipe, mesh)
    sharded = gen(params, key, pimg, pmask, pctx, pneg)

    # the pipeline's RNG draws are batch-shaped from one replicated key, so
    # the partitioned program computes the same noise on every shard
    np.testing.assert_allclose(
        np.asarray(sharded)[:B], np.asarray(single), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_flagship_dp_sharded_pointrend_loop(rng):
    """The reference-faithful in-loop segmenter family (PointRend,
    ``adaptive_mask_inpainting.py:1182-1243``) inside the full adaptive-mask
    scan under the data mesh: sharded == single-device."""
    from coma_tpu.models.pointrend import (
        PointRendConfig,
        PointRendModel,
        make_pointrend_segment_fn,
    )
    from coma_tpu.parallel.flagship import data_parallel_generate, pad_ragged_batch

    pipe, params, R = _tiny_flagship()
    pr_cfg = PointRendConfig(test_size=R, pre_nms_topk=32, post_nms_topk=16,
                             box_candidates=8, max_detections=2)
    pr_model = PointRendModel(pr_cfg)
    params = dict(params,
                  pointrend=pr_model.init(jax.random.PRNGKey(5),
                                          jnp.zeros((R, R, 3))))
    pipe.segment_fn = make_pointrend_segment_fn(pr_model, score_thresh=0.0)

    B = 3  # ragged: pads to 8 over the mesh
    img = jnp.asarray(rng.uniform(-1, 1, size=(B, R, R, 3)), jnp.float32)
    mask = jnp.zeros((B, R, R)).at[:, 8:40, 8:40].set(1.0)
    ctx = jnp.asarray(rng.normal(size=(B, 7, 32)), jnp.float32)
    neg = jnp.zeros_like(ctx)
    key = jax.random.PRNGKey(3)

    single = jax.jit(pipe.generate_p)(params, key, img, mask, ctx, neg)

    mesh = default_mesh()
    (pimg, pmask, pctx, pneg), B_real = pad_ragged_batch(
        [img, mask, ctx, neg], mesh.shape["data"])
    assert B_real == B
    sharded = data_parallel_generate(pipe, mesh)(
        params, key, pimg, pmask, pctx, pneg)
    np.testing.assert_allclose(
        np.asarray(sharded)[:B], np.asarray(single), atol=2e-5, rtol=1e-5
    )


def test_resolve_mesh_specs():
    from coma_tpu.parallel.flagship import resolve_mesh

    assert resolve_mesh(None) is None
    assert resolve_mesh("1") is None
    m = resolve_mesh("all")
    assert m is not None and m.shape["data"] == len(jax.devices())
    assert resolve_mesh("4").shape["data"] == 4
    with pytest.raises(SystemExit):
        resolve_mesh("1024")
