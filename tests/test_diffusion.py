"""Tests for the Flax SD stack: DDIM oracle, UNet/VAE/CLIP shapes, and the
full adaptive-mask pipeline on tiny configs."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.models.diffusion.clip_text import CLIPTextEncoder, tiny_clip_config
from coma_tpu.models.diffusion.ddim import (
    add_noise,
    ddim_step,
    ddim_step_traced,
    inpaint_timesteps,
    make_ddim_schedule,
)
from coma_tpu.models.diffusion.pipeline import (
    AdaptiveMaskConfig,
    AdaptiveMaskInpaintPipeline,
    default_dilate_schedule,
    default_provoke_schedule,
    dilate_mask,
)
from coma_tpu.models.diffusion.unet import UNet2DCondition, tiny_unet_config
from coma_tpu.models.diffusion.vae import Decoder, Encoder, sample_latents, tiny_vae_config


# ---------------------------------------------------------------- DDIM ----

def test_ddim_schedule_tables():
    s = make_ddim_schedule(50)
    assert list(s.timesteps[:3]) == [980, 960, 940] and s.timesteps[-1] == 0
    # scaled_linear: betas = linspace(sqrt(b0), sqrt(b1), 1000)^2
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    np.testing.assert_allclose(s.alphas_cumprod, np.cumprod(1 - betas), rtol=1e-5)
    assert abs(s.final_alpha_cumprod - (1 - betas[0])) < 1e-6  # f32 table


def test_ddim_step_oracle(rng):
    s = make_ddim_schedule(50)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    prev, x0 = ddim_step(s, 0, eps, x)
    t, t_prev = 980, 960
    a_t, a_prev = s.alphas_cumprod[t], s.alphas_cumprod[t_prev]
    want_x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    want_prev = np.sqrt(a_prev) * want_x0 + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x0), want_x0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(prev), want_prev, rtol=1e-4)
    # traced variant agrees
    prev_t, x0_t = ddim_step_traced(s, jnp.asarray(0), eps, x)
    np.testing.assert_allclose(np.asarray(prev_t), np.asarray(prev), rtol=1e-5)


def test_ddim_last_step_uses_final_alpha(rng):
    s = make_ddim_schedule(50)
    x = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros((1, 2, 2, 4))
    prev, x0 = ddim_step(s, 49, eps, x)  # t=0, prev_t=-20 -> final_alpha
    a0 = s.alphas_cumprod[0]
    np.testing.assert_allclose(np.asarray(prev), np.asarray(x0) * np.sqrt(a0), rtol=1e-5)


def test_ddim_denoises_toward_x0(rng):
    """Running all 50 steps with a perfect eps-oracle recovers x0."""
    s = make_ddim_schedule(50)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    x = add_noise(s, x0, noise, int(s.timesteps[0]))
    for i in range(50):
        t = int(s.timesteps[i])
        a_t = s.alphas_cumprod[t]
        eps = (x - np.sqrt(a_t) * x0) / np.sqrt(1 - a_t)  # oracle eps at x_t
        x, _ = ddim_step(s, i, eps, x)
    # set_alpha_to_one=False: the final sample sits at ᾱ_final = ᾱ_0, i.e.
    # sqrt(ᾱ_0)·x0 + sqrt(1-ᾱ_0)·ε — not exactly x0 (diffusers parity)
    a_fin = s.final_alpha_cumprod
    want = np.sqrt(a_fin) * np.asarray(x0) + np.sqrt(1 - a_fin) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-4)


def test_inpaint_timesteps_strength():
    s = make_ddim_schedule(50)
    full, start = inpaint_timesteps(s, 1.0)
    assert len(full) == 50 and start == 0
    part, start = inpaint_timesteps(s, 0.5)
    assert len(part) == 25 and start == 25 and part[0] == 480


# ------------------------------------------------------------- schedules ----

def test_reference_schedules():
    d = default_dilate_schedule(50)
    assert d == [20] * 5 + [10] * 5 + [5] * 5 + [4] * 5 + [3] * 5 + [2] * 5 + [1] * 5 + [0] * 15
    p = default_provoke_schedule(50)
    assert p == [2, 4, 6, 8, 10] + list(range(12, 41, 2)) + [45]
    assert len(p) == 21  # ~21 in-loop segmentations per image (SURVEY §6)


def test_dilate_mask_radius():
    m = jnp.zeros((1, 9, 9)).at[0, 4, 4].set(1.0)
    out = np.asarray(dilate_mask(m, jnp.asarray(2)))
    ys, xs = np.nonzero(out[0])
    assert ys.min() == 2 and ys.max() == 6 and xs.min() == 2 and xs.max() == 6
    out0 = np.asarray(dilate_mask(m, jnp.asarray(0)))
    np.testing.assert_array_equal(out0, np.asarray(m))


# ------------------------------------------------------------ models ----

@pytest.mark.slow
def test_unet_shapes(rng):
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    lat = jnp.asarray(rng.normal(size=(2, 16, 16, 9)), dtype=jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.asarray(rng.normal(size=(2, 7, cfg.cross_attention_dim)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lat, t, ctx)
    out = jax.jit(model.apply)(params, lat, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vae_roundtrip_shapes(rng):
    cfg = tiny_vae_config()
    enc, dec = Encoder(cfg), Decoder(cfg)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), dtype=jnp.float32)
    ep = enc.init(jax.random.PRNGKey(0), img)
    moments = enc.apply(ep, img)
    assert moments.shape == (1, 4, 4, 8)  # 32 / 2^3, 2*latent_channels
    lat = sample_latents(moments, jax.random.PRNGKey(1), cfg.scaling_factor)
    dp = dec.init(jax.random.PRNGKey(2), lat / cfg.scaling_factor)
    out = dec.apply(dp, lat / cfg.scaling_factor)
    assert out.shape == (1, 32, 32, 3)


def test_clip_shapes():
    cfg = tiny_clip_config()
    model = CLIPTextEncoder(cfg)
    ids = jnp.asarray([[1, 5, 9, 2, 0, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (1, 7, cfg.hidden_size)


def test_clip_causality():
    """Changing a later token must not affect earlier positions."""
    cfg = tiny_clip_config()
    model = CLIPTextEncoder(cfg)
    ids_a = jnp.asarray([[1, 5, 9, 2]], dtype=jnp.int32)
    ids_b = jnp.asarray([[1, 5, 9, 7]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids_a)
    out_a = np.asarray(model.apply(params, ids_a))
    out_b = np.asarray(model.apply(params, ids_b))
    np.testing.assert_allclose(out_a[:, :3], out_b[:, :3], atol=1e-5)
    assert np.abs(out_a[:, 3] - out_b[:, 3]).max() > 1e-4


# ----------------------------------------------------------- pipeline ----

@pytest.fixture(scope="module")
def tiny_pipeline():
    ucfg = tiny_unet_config()
    vcfg = tiny_vae_config()
    unet = UNet2DCondition(ucfg)
    enc, dec = Encoder(vcfg), Decoder(vcfg)
    H = 64  # latent 8x8: smallest size whose skips align through 3 downsamples
    h = H // 8
    k = jax.random.PRNGKey(0)
    # jit the inits: one whole-graph compile (persistently cached across
    # runs) instead of hundreds of op-by-op CPU compiles — the dominant
    # cost of this module-scoped fixture on the single-core CI host.
    up = jax.jit(unet.init)(k, jnp.zeros((1, h, h, 9)), jnp.zeros((1,)),
                            jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    ep = jax.jit(enc.init)(k, jnp.zeros((1, H, H, 3)))
    dp = jax.jit(dec.init)(k, jnp.zeros((1, h, h, 4)))

    def segment_fn(images):  # stub person segmenter: bright-region threshold
        return (images.mean(-1) > 0.6).astype(jnp.float32)

    def build(segment, steps=50):
        return AdaptiveMaskInpaintPipeline(
            unet_fn=lambda lat, t, ctx: unet.apply(up, lat, t, ctx),
            vae_encode_fn=lambda img: enc.apply(ep, img),
            vae_decode_fn=lambda lat: dec.apply(dp, lat),
            segment_fn=segment,
            config=AdaptiveMaskConfig(num_inference_steps=steps),
        )

    return build, segment_fn, H


@pytest.mark.slow
def test_pipeline_end_to_end(tiny_pipeline, rng):
    build, segment_fn, H = tiny_pipeline
    pipe = build(segment_fn)
    B = 2
    init_image = jnp.asarray(rng.uniform(-1, 1, size=(B, H, H, 3)), dtype=jnp.float32)
    mask = jnp.zeros((B, H, H)).at[:, 8:24, 8:24].set(1.0)
    ctx = jnp.asarray(rng.normal(size=(B, 7, 32)), dtype=jnp.float32)
    neg = jnp.zeros_like(ctx)
    out = jax.jit(pipe.generate)(jax.random.PRNGKey(1), init_image, mask, ctx, neg)
    assert out.shape == (B, H, H, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0


@pytest.mark.slow
def test_pipeline_baseline_differs_from_adaptive(tiny_pipeline, rng):
    build, segment_fn, H = tiny_pipeline
    init_image = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), dtype=jnp.float32)
    mask = jnp.ones((1, H, H))
    ctx = jnp.asarray(rng.normal(size=(1, 7, 32)), dtype=jnp.float32)
    neg = jnp.zeros_like(ctx)
    key = jax.random.PRNGKey(1)
    adaptive = build(segment_fn).generate(key, init_image, mask, ctx, neg)
    baseline = build(None).generate(key, init_image, mask, ctx, neg)
    # the adaptive path re-encodes mask latents mid-loop -> different output
    assert np.abs(np.asarray(adaptive) - np.asarray(baseline)).max() > 1e-4


@pytest.mark.slow
def test_pipeline_deterministic_per_seed(tiny_pipeline, rng):
    build, segment_fn, H = tiny_pipeline
    pipe = build(segment_fn)
    init_image = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), dtype=jnp.float32)
    mask = jnp.ones((1, H, H))
    ctx = jnp.asarray(rng.normal(size=(1, 7, 32)), dtype=jnp.float32)
    a = pipe.generate(jax.random.PRNGKey(7), init_image, mask, ctx, jnp.zeros_like(ctx))
    b = pipe.generate(jax.random.PRNGKey(7), init_image, mask, ctx, jnp.zeros_like(ctx))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = pipe.generate(jax.random.PRNGKey(8), init_image, mask, ctx, jnp.zeros_like(ctx))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-5


@pytest.mark.slow
def test_pipeline_intermediates_and_video(tiny_pipeline, rng, tmp_path):
    """return_intermediates + the per-step mask/image GIF writer
    (the reference's visualize_video equivalent)."""
    import os

    from coma_tpu.visualization.video import write_adaptive_mask_video

    build, segment_fn, H = tiny_pipeline
    pipe = build(segment_fn)
    init_image = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), dtype=jnp.float32)
    mask = jnp.ones((1, H, H))
    ctx = jnp.asarray(rng.normal(size=(1, 7, 32)), dtype=jnp.float32)
    out, inter = pipe.generate_p(
        None, jax.random.PRNGKey(1), init_image, mask, ctx,
        jnp.zeros_like(ctx), return_intermediates=True,
    )
    h = H // 8
    assert inter["mask_lat"].shape == (50, 1, h, h, 1)
    assert inter["pred_x0"].shape == (50, 1, h, h, 4)
    # intermediates must not change the generated image
    plain = pipe.generate(jax.random.PRNGKey(1), init_image, mask, ctx, jnp.zeros_like(ctx))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))

    gif = str(tmp_path / "steps.gif")
    frames = write_adaptive_mask_video(
        inter, pipe.vae_decode_fn, gif, sample=0, every=10
    )
    assert frames.shape == (5, H, 2 * H, 3)
    assert os.path.getsize(gif) > 0


@pytest.mark.slow
def test_pipeline_provoke_decode_factor(tiny_pipeline, rng):
    """f=2 provoke decodes: valid output, in range, and the adaptive path
    still differs from baseline (the mask machinery remains live)."""
    build, segment_fn, H = tiny_pipeline
    pipe = build(segment_fn)
    pipe2 = AdaptiveMaskInpaintPipeline(
        unet_fn=pipe.unet_fn,
        vae_encode_fn=pipe.vae_encode_fn,
        vae_decode_fn=pipe.vae_decode_fn,
        segment_fn=pipe.segment_fn,
        config=dataclasses.replace(pipe.config, provoke_decode_factor=2),
    )
    init_image = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), dtype=jnp.float32)
    mask = jnp.ones((1, H, H))
    ctx = jnp.asarray(rng.normal(size=(1, 7, 32)), dtype=jnp.float32)
    neg = jnp.zeros_like(ctx)
    out = pipe2.generate(jax.random.PRNGKey(3), init_image, mask, ctx, neg)
    o = np.asarray(out)
    assert o.shape == (1, H, H, 3)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    base = build(None).generate(jax.random.PRNGKey(3), init_image, mask, ctx, neg)
    assert np.abs(o - np.asarray(base)).max() > 1e-4


@pytest.mark.slow
def test_provoke_decode_factor_mask_fidelity(tiny_pipeline, rng):
    """The f=2 provoke path must produce essentially the same adapted-mask
    trajectory as the exact f=1 reference path (the decoded image feeds only
    the segmenter, so halving its resolution should not flip masks)."""
    build, segment_fn, H = tiny_pipeline
    init_image = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), dtype=jnp.float32)
    mask = jnp.ones((1, H, H))
    ctx = jnp.asarray(rng.normal(size=(1, 7, 32)), dtype=jnp.float32)
    neg = jnp.zeros_like(ctx)

    def run(f):
        pipe = build(segment_fn)
        pipe = AdaptiveMaskInpaintPipeline(
            unet_fn=pipe.unet_fn,
            vae_encode_fn=pipe.vae_encode_fn,
            vae_decode_fn=pipe.vae_decode_fn,
            segment_fn=pipe.segment_fn,
            config=dataclasses.replace(pipe.config, provoke_decode_factor=f),
        )
        _, inter = pipe.generate_p(
            None, jax.random.PRNGKey(5), init_image, mask, ctx, neg,
            return_intermediates=True,
        )
        return np.asarray(inter["mask_lat"])  # (steps, B, h, w, 1)

    m1, m2 = run(1), run(2)
    # per-step IoU of the latent masks. On this RANDOM-weight tiny pipeline
    # (8x8 latent masks, untrained VAE, threshold-stub segmenter) the f=2
    # trajectory measures ~0.67 mean IoU — random VAEs do not commute with
    # downsampling the way trained ones approximately do, and single-cell
    # flips compound through the loop. The floor below is a regression
    # guard, not a fidelity claim; f=2 stays OPT-IN (--provoke_decode_factor).
    inter_ = np.logical_and(m1 > 0.5, m2 > 0.5).sum(axis=(1, 2, 3, 4))
    union = np.logical_or(m1 > 0.5, m2 > 0.5).sum(axis=(1, 2, 3, 4))
    iou = inter_ / np.maximum(union, 1)
    assert float(iou.mean()) >= 0.5, f"mean latent-mask IoU {iou.mean():.3f}"


# ------------------------------------------- cropped provoke rounds ----


def test_mask_bbox_center_and_crop_offsets():
    from coma_tpu.models.diffusion.pipeline import crop_offsets, mask_bbox_center

    m = jnp.zeros((64, 64)).at[10:30, 40:60].set(1.0)
    cy, cx = np.asarray(mask_bbox_center(m))
    assert cy == 20 and cx == 50
    # empty mask falls back to the frame center
    cy0, cx0 = np.asarray(mask_bbox_center(jnp.zeros((64, 64))))
    assert cy0 == 32 and cx0 == 32
    offs = np.asarray(crop_offsets(m[None], crop_lat=4, vae_scale=8))
    # latent center (2, 6); window clamped in [0, 8-4]
    assert offs.tolist() == [[0, 4]]


def test_choose_crop_latent_buckets():
    from coma_tpu.models.diffusion.pipeline import choose_crop_latent

    masks = np.zeros((2, 512, 512), np.float32)
    masks[0, 100:300, 150:350] = 1  # 200px -> 25 latent + 2*6 halo = 37
    masks[1, 50:200, 50:180] = 1
    assert choose_crop_latent(masks) == 40
    # a bbox too large for any bucket disables the crop
    big = np.ones((1, 512, 512), np.float32)
    assert choose_crop_latent(big) == 0
    # empty masks -> smallest bucket (halo only)
    assert choose_crop_latent(np.zeros((1, 512, 512), np.float32)) == 24
    # marginal-savings guard: a near-full-frame bbox would land in bucket 56
    # ((56/64)^2 = 77% of the latent area) — auto declines the crop rather
    # than pay the approximation for ~nothing...
    near_full = np.zeros((1, 512, 512), np.float32)
    near_full[0, 80:430, 70:420] = 1  # 350px -> 44 latent + 12 halo = 56
    assert choose_crop_latent(near_full) == 0
    # ...but explicit validation (max_area_ratio=1.0) still reports the fit
    assert choose_crop_latent(near_full, max_area_ratio=1.0) == 56


def test_crop_rejects_decode_factor_combo(rng):
    """The config validation fires before any model math, so stub model
    fns suffice — keeping the expensive tiny_pipeline fixture out of the
    fast lane (its only other consumers are slow-lane tests)."""
    H = 64
    pipe = AdaptiveMaskInpaintPipeline(
        unet_fn=lambda lat, t, ctx: lat[..., :4],
        vae_encode_fn=lambda img: jnp.zeros(
            (img.shape[0], H // 8, H // 8, 8), img.dtype),
        vae_decode_fn=lambda lat: jnp.zeros(
            (lat.shape[0], H, H, 3), lat.dtype),
        segment_fn=lambda images: (images.mean(-1) > 0.6).astype(jnp.float32),
        config=AdaptiveMaskConfig(
            num_inference_steps=50, provoke_decode_factor=2,
            provoke_crop_latent=6,
        ),
    )
    img = jnp.zeros((1, H, H, 3))
    with pytest.raises(ValueError):
        pipe.generate_p(
            None, jax.random.PRNGKey(0), img, jnp.ones((1, H, H)),
            jnp.zeros((1, 7, 32)), jnp.zeros((1, 7, 32)),
        )


@pytest.mark.slow
def test_provoke_crop_mask_fidelity(tiny_pipeline, rng):
    """Cropped provoke rounds (decode/segment/re-encode only the default-mask
    bbox window) vs the full-frame path: the adapted-mask trajectories must
    agree except at VAE boundary cells. Two approximation sources, both
    documented on AdaptiveMaskConfig: the VAE mid-block attention couples the
    frame globally (cropped decode/encode ≠ windowed full decode/encode), and
    the pasted re-encode keeps the step-0 sample outside the window. At this
    TINY scale (8x8 latents, crop 6 => halo is most of the window) the
    measured agreement is ~0.97-0.99 of mask-latent cells; full scale (64
    latents, crop 40, halo 6) is proportionally gentler — measured on-chip in
    bench extras."""
    build, segment_fn, H = tiny_pipeline

    def run(crop):
        pipe = build(segment_fn)
        pipe = AdaptiveMaskInpaintPipeline(
            unet_fn=pipe.unet_fn,
            vae_encode_fn=pipe.vae_encode_fn,
            vae_decode_fn=pipe.vae_decode_fn,
            segment_fn=pipe.segment_fn,
            config=dataclasses.replace(pipe.config, provoke_crop_latent=crop),
        )
        img = jnp.asarray(rng.uniform(-1, 1, size=(2, H, H, 3)), jnp.float32)
        mask = jnp.zeros((2, H, H))
        mask = mask.at[0, 10:38, 14:34].set(1.0)
        mask = mask.at[1, 22:54, 28:52].set(1.0)
        _, inter = jax.jit(
            lambda *a: pipe.generate_p(*a, return_intermediates=True)
        )(None, jax.random.PRNGKey(5), img, mask,
          jnp.asarray(rng.normal(size=(2, 7, 32)), jnp.float32),
          jnp.zeros((2, 7, 32)))
        return np.asarray(inter["mask_lat"])

    m_full, m_crop = run(0), run(6)
    agree = (m_full == m_crop).mean()
    assert agree >= 0.95, f"mask-latent agreement {agree:.4f}"
    # outside every default-mask bbox both paths must be exactly zero
    assert (m_crop[:, 0, :1, :1] == 0).all()


@pytest.mark.slow
def test_crop_divergence_second_person_outside_window(tiny_pipeline, rng):
    """The documented crop-mode approximation boundary, made executable
    (AdaptiveMaskConfig notes; reference semantics:
    ``adaptive_mask_inpainting.py:1130-1137``): the too-small-human fallback
    compares detected-person pixels against an ABSOLUTE full-frame threshold
    (H·W·thres). The cropped path can only count pixels inside its window, so
    a second person decoded OUTSIDE the window can tip a borderline frame
    into the default-mask fallback where the full-frame path keeps the
    adapted mask. Constructed here with a geometry-driven segmenter: person A
    (64 px) inside the window, person B (192 px) outside; threshold at 100 px
    sits between A and A+B."""
    build, _, H = tiny_pipeline

    def two_person_segmenter(images):
        B, S = images.shape[0], images.shape[1]
        m = jnp.zeros((B, S, S))
        m = m.at[:, 8:16, 8:16].set(1.0)  # person A: inside window & default bbox
        if S == H:  # full frame also sees person B in the far corner
            m = m.at[:, 48:60, 44:60].set(1.0)
        return m

    def run(crop):
        pipe = build(two_person_segmenter)
        pipe = AdaptiveMaskInpaintPipeline(
            unet_fn=pipe.unet_fn,
            vae_encode_fn=pipe.vae_encode_fn,
            vae_decode_fn=pipe.vae_decode_fn,
            segment_fn=pipe.segment_fn,
            config=dataclasses.replace(
                pipe.config,
                provoke_crop_latent=crop,
                human_detection_thres=100.0 / (H * H),  # between A and A+B
            ),
        )
        img = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), jnp.float32)
        mask = jnp.zeros((1, H, H)).at[0, 0:32, 0:32].set(1.0)  # window anchors here
        _, inter = jax.jit(
            lambda *a: pipe.generate_p(*a, return_intermediates=True)
        )(None, jax.random.PRNGKey(7), img, mask,
          jnp.asarray(rng.normal(size=(1, 7, 32)), jnp.float32),
          jnp.zeros((1, 7, 32)))
        return np.asarray(inter["mask_lat"]), np.asarray(mask)

    m_crop, mask = run(4)
    m_full, _ = run(0)
    from coma_tpu.models.diffusion.pipeline import downsample_mask

    default_lat = np.asarray(downsample_mask(jnp.asarray(mask), 8))
    # last provoke step (1-indexed 45 -> index 44) has dilation 0: the
    # adapted mask is person A ∧ default, strictly smaller than default
    i = 44
    # full-frame path: A+B = 256 px >= 100 -> adapted mask kept
    assert (m_full[i] != default_lat).any(), "full-frame path fell back"
    assert m_full[i].sum() < default_lat.sum()
    # cropped path: only A's 64 px are visible in the window -> fallback
    np.testing.assert_array_equal(m_crop[i], default_lat)
