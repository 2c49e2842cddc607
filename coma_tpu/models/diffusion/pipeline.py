"""Adaptive-mask inpainting pipeline: the flagship loop, fully jitted.

Reference parity: ``utils/adaptive_mask_inpainting.py:AdaptiveMaskInpaintPipeline``
— a 9-channel SD-inpaint denoise loop that, at provoke-scheduled steps,
decodes the predicted x̂0, segments the emerging human, dilates the mask by a
step-scheduled count, intersects with the default mask (falling back to the
default mask when the detected human is too small), and re-encodes the mask
latents mid-loop (``__call__:732-1109``, ``adapt_mask:1123-1157``,
``MaskDilateScheduler:1457``, ``ProvokeScheduler:1468``).

TPU-first design vs the reference:
- The whole 50-step loop (UNet + CFG + DDIM + the in-loop VAE decode /
  segmentation / dilation / VAE re-encode) is ONE ``lax.scan`` — no
  host<->device round trips (the reference crosses CPU<->GPU through
  numpy/cv2/detectron2 every provoke step).
- Batched over images natively: the reference loops images one at a time;
  here the (render x mask x prompt x seed) cross product batches.
- The segmenter is a JAX callable (person-mask from a decoded image), so it
  fuses into the same program; dilation is a Chebyshev-ball max-pool
  (== cv2.dilate with a 3x3 ones kernel iterated N times).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.models.diffusion.ddim import (
    DDIMSchedule,
    add_noise,
    ddim_step_traced,
    inpaint_timesteps,
    make_ddim_schedule,
)


def default_dilate_schedule(num_inference_steps: int = 50) -> List[int]:
    """PointRend-type dilation schedule (reference: ``inpaint.py:117-121``):
    [20]*5 + [10]*5 + [5]*5 + [4]*5 + [3]*5 + [2]*5 + [1]*5 + [0]*15."""
    step_num = int(num_inference_steps * 0.1)
    final = num_inference_steps - step_num * 7
    sched = []
    for v in (20, 10, 5, 4, 3, 2, 1):
        sched += [v] * step_num
    return sched + [0] * final


def default_provoke_schedule(num_inference_steps: int = 50) -> List[int]:
    """1-indexed steps that adapt the mask (reference: ``inpaint.py:124-128``):
    {2,4,...,10, 12,14,...,40, 45}."""
    assert num_inference_steps == 50, "reference schedule is for 50 steps"
    return list(range(2, 11, 2)) + list(range(12, 41, 2)) + [45]


@dataclasses.dataclass(frozen=True)
class AdaptiveMaskConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    strength: float = 1.0
    human_detection_thres: float = 0.008   # reference: inpaint.py:369
    enforce_full_mask_ratio: float = 0.0
    vae_scale: int = 8
    use_adaptive_mask: bool = True
    # Decode x̂₀ at 1/f resolution during provoke steps (latents average-
    # pooled by f before the VAE decode). The decoded image feeds ONLY the
    # person segmenter, which canonicalizes its input to its own working
    # scale anyway — so f=2 keeps mask fidelity while cutting the 21
    # in-loop decodes ~4×. f=1 reproduces the reference exactly; the final
    # image decode is always full-resolution.
    provoke_decode_factor: int = 1
    # Provoke-round latent-space crop (0 = full frame): decode/segment/re-
    # encode only a (c, c)-latent window anchored on each image's default-
    # mask bbox. Pixels outside the default mask are discarded by the AND at
    # adapt() anyway (reference ``adaptive_mask_inpainting.py:1134-1137``),
    # so the crop sees everything the mask math can use; the caller must
    # pick c ≥ latent bbox + halo (see :func:`choose_crop_latent`). The re-
    # encoded masked latents are pasted into the step-0 (default-mask)
    # encode outside the window. Approximation boundaries: (1) the VAE
    # mid-block attention couples the frame globally, so cropped
    # decode/encode values are not bit-identical to the full-frame path —
    # the *thresholded adapted masks* are compared bit-wise in tests
    # instead; (2) the too-small-human fallback test counts segmenter
    # pixels only inside the window against the reference's absolute
    # full-frame threshold (H·W·thres) — faithful while the detected
    # person lies inside the window (the expected case: the window covers
    # the default-mask bbox + halo), but person pixels elsewhere in the
    # frame (e.g. a second hallucinated person) are invisible to it and
    # can tip a borderline frame into the default-mask fallback where the
    # full-frame path would keep the adapted mask.
    provoke_crop_latent: int = 0

    def dilate_schedule(self) -> List[int]:
        return default_dilate_schedule(self.num_inference_steps)

    def provoke_flags(self) -> np.ndarray:
        """Per-step booleans (0-indexed; reference schedule is 1-indexed)."""
        flags = np.zeros(self.num_inference_steps, dtype=bool)
        if self.use_adaptive_mask:
            for one_indexed in default_provoke_schedule(self.num_inference_steps):
                flags[one_indexed - 1] = True
        return flags


def mask_bbox_center(mask: jax.Array) -> jax.Array:
    """(H, W) binary mask -> (cy, cx) int32 bbox center (frame center when
    the mask is empty)."""
    H, W = mask.shape

    def axis_center(any_line: jax.Array, n: int) -> jax.Array:
        idx = jnp.arange(n)
        lo = jnp.min(jnp.where(any_line, idx, n))
        hi = jnp.max(jnp.where(any_line, idx, -1))
        return jnp.where(hi >= lo, (lo + hi + 1) // 2, n // 2).astype(jnp.int32)

    cy = axis_center(jnp.any(mask > 0, axis=1), H)
    cx = axis_center(jnp.any(mask > 0, axis=0), W)
    return jnp.stack([cy, cx])


def crop_offsets(default_mask: jax.Array, crop_lat: int, vae_scale: int) -> jax.Array:
    """Per-image latent-space window offsets (B, 2) int32: a (crop_lat,
    crop_lat) window centered on the default-mask bbox, clamped in-frame."""
    B, H, W = default_mask.shape
    h, w = H // vae_scale, W // vae_scale

    def one(m):
        cy, cx = mask_bbox_center(m)
        oy = jnp.clip(cy // vae_scale - crop_lat // 2, 0, h - crop_lat)
        ox = jnp.clip(cx // vae_scale - crop_lat // 2, 0, w - crop_lat)
        return jnp.stack([oy, ox])

    return jax.vmap(one)(default_mask)


def choose_crop_latent(
    default_masks: np.ndarray,
    vae_scale: int = 8,
    halo: int = 6,
    buckets: Tuple[int, ...] = (24, 32, 40, 48, 56),
    max_area_ratio: float = 0.75,
) -> int:
    """Host-side crop-size selection for a batch: the smallest bucket
    covering every image's default-mask bbox plus ``halo`` latent pixels on
    each side (halo absorbs the VAE's local receptive-field edge effects).
    Returns 0 (no crop) when no bucket fits. Buckets bound recompiles: the
    jit specializes per crop size, and the persistent cache keeps each.

    ``max_area_ratio`` declines the crop (returns 0) when the smallest
    fitting window covers more than that fraction of the latent area: a
    near-full-frame crop saves almost nothing while still exposing the
    crop approximation (a person decoded OUTSIDE the window is invisible
    to the too-small fallback test — see ``AdaptiveMaskConfig`` notes and
    ``test_crop_divergence_second_person_outside_window``). Pass 1.0 to
    disable the guard (e.g. when validating an explicit user-chosen crop)."""
    m = np.asarray(default_masks) > 0
    if m.ndim == 2:
        m = m[None]
    need = 0
    for i in range(m.shape[0]):
        ys, xs = np.any(m[i], axis=1), np.any(m[i], axis=0)
        if not ys.any():
            continue
        yext = int(ys.argmax() + ys[::-1].argmax())
        xext = int(xs.argmax() + xs[::-1].argmax())
        ext = max(m.shape[1] - yext, m.shape[2] - xext)
        need = max(need, -(-ext // vae_scale) + 2 * halo)
    lat_side = min(m.shape[1], m.shape[2]) // vae_scale
    for b in buckets:
        if b >= need and b < lat_side:
            if (b / lat_side) ** 2 > max_area_ratio:
                return 0  # marginal savings: not worth the approximation
            return b
    return 0


def dilate_mask(mask: jax.Array, iterations: jax.Array, max_iterations: int = 20) -> jax.Array:
    """Binary dilation with a 3x3 ones kernel, ``iterations`` times.

    == max-pool with a (2k+1)² window; implemented as a fori over 3x3
    max-pools so ``iterations`` can be a traced per-step value.
    """
    def body(i, m):
        grown = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
        )
        return jnp.where(i < iterations, grown, m)

    return jax.lax.fori_loop(0, max_iterations, body, mask)


def binarize_mask(mask: jax.Array) -> jax.Array:
    """Reference ``prepare_mask_and_masked_image:131``: mask < 0.5 -> 0 else 1."""
    return (mask >= 0.5).astype(mask.dtype)


def downsample_mask(mask: jax.Array, vae_scale: int) -> jax.Array:
    """(B, H, W) -> (B, H/8, W/8, 1), nearest (diffusers interpolate default)."""
    B, H, W = mask.shape
    out = jax.image.resize(mask, (B, H // vae_scale, W // vae_scale), method="nearest")
    return out[..., None]


class AdaptiveMaskInpaintPipeline:
    """Functional pipeline: pass apply-fns + params, call ``generate``.

    Parameters
    ----------
    unet_fn: (latents (B,h,w,9), timesteps (B,), context (B,L,C)) -> eps (B,h,w,4)
    vae_encode_fn: (images (B,H,W,3) in [-1,1]) -> moments (B,h,w,8)
    vae_decode_fn: (latents (B,h,w,4) UNSCALED) -> images (B,H,W,3) in [-1,1]
    segment_fn: (images (B,H,W,3) in [0,1]) -> human masks (B,H,W) in {0,1}
        (the adaptive_mask_model equivalent; None disables adaptation =
        the reference's 'baseline' mode)

    Two calling conventions:
    - ``generate(rng, ...)`` — fns close over their weights. Convenient, but
      under ``jax.jit`` XLA bakes every weight into the program as a
      constant (multi-GB HLO, slow compiles, cache misses per weight set).
    - ``generate_p(params, rng, ...)`` — fns take a ``params`` pytree as
      their FIRST argument and the same pytree is passed through jit as a
      runtime argument. Preferred for the full-size models.
    """

    def __init__(
        self,
        unet_fn: Callable,
        vae_encode_fn: Callable,
        vae_decode_fn: Callable,
        segment_fn: Optional[Callable],
        config: AdaptiveMaskConfig = AdaptiveMaskConfig(),
        vae_scaling: float = 0.18215,
    ):
        self.unet_fn = unet_fn
        self.vae_encode_fn = vae_encode_fn
        self.vae_decode_fn = vae_decode_fn
        self.segment_fn = segment_fn
        self.config = config
        self.vae_scaling = vae_scaling
        self.schedule: DDIMSchedule = make_ddim_schedule(config.num_inference_steps)

    # -- helpers ------------------------------------------------------------

    def _bound_fns(self, params):
        """Bind a params pytree as the fns' first argument (or pass through
        the closure-style fns when params is None)."""
        if params is None:
            return self.unet_fn, self.vae_encode_fn, self.vae_decode_fn, self.segment_fn

        def bind(fn):
            return None if fn is None else (lambda *a: fn(params, *a))

        return (bind(self.unet_fn), bind(self.vae_encode_fn),
                bind(self.vae_decode_fn), bind(self.segment_fn))

    def _encode_image(self, vae_encode_fn, images: jax.Array, rng: jax.Array) -> jax.Array:
        from coma_tpu.models.diffusion.vae import sample_latents

        moments = vae_encode_fn(images)
        return sample_latents(moments, rng, self.vae_scaling)

    def _mask_latents(
        self, vae_encode_fn, mask: jax.Array, init_image: jax.Array, rng: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """mask (B,H,W) + init image -> (mask_latent (B,h,w,1),
        masked_image_latents (B,h,w,4)). Reference: ``prepare_mask_latents:686``."""
        mask = binarize_mask(mask)
        masked_image = init_image * (mask[..., None] < 0.5)
        mask_lat = downsample_mask(mask, self.config.vae_scale)
        masked_lat = self._encode_image(vae_encode_fn, masked_image, rng)
        return mask_lat, masked_lat

    # -- the loop -----------------------------------------------------------

    def generate(
        self,
        rng: jax.Array,
        init_image: jax.Array,       # (B, H, W, 3) in [-1, 1]
        default_mask: jax.Array,     # (B, H, W) in {0, 1}
        prompt_embeds: jax.Array,    # (B, L, C) conditional
        negative_embeds: jax.Array,  # (B, L, C) unconditional
    ) -> jax.Array:
        """Closure-style entry (weights captured by the fns)."""
        return self.generate_p(
            None, rng, init_image, default_mask, prompt_embeds, negative_embeds
        )

    def generate_p(
        self,
        params,
        rng: jax.Array,
        init_image: jax.Array,       # (B, H, W, 3) in [-1, 1]
        default_mask: jax.Array,     # (B, H, W) in {0, 1}
        prompt_embeds: jax.Array,    # (B, L, C) conditional
        negative_embeds: jax.Array,  # (B, L, C) unconditional
        return_intermediates: bool = False,
    ) -> jax.Array:
        """Run the full adaptive-mask inpainting; returns images in [0, 1].
        ``params`` is forwarded as the fns' first argument (see class doc).

        With ``return_intermediates`` (the reference's per-step mask/image
        video dump, ``utils/visualization/visualize_video.py`` +
        ``adaptive_mask_inpainting.py:1103-1104``) also returns a dict of
        per-step scan outputs: ``mask_lat`` (S, B, h, w, 1) and ``pred_x0``
        (S, B, h, w, 4) latents — decode/upsample on the host via
        :mod:`coma_tpu.visualization.video`."""
        unet_fn, vae_encode_fn, vae_decode_fn, segment_fn = self._bound_fns(params)
        cfg = self.config
        B, H, W, _ = init_image.shape
        h, w = H // cfg.vae_scale, W // cfg.vae_scale

        timesteps, _ = inpaint_timesteps(self.schedule, cfg.strength)
        n_steps = len(timesteps)
        dilate = np.asarray(cfg.dilate_schedule()[:n_steps], dtype=np.int32)
        provoke = cfg.provoke_flags()[:n_steps]
        use_default_tab = (
            np.asarray(timesteps)
            < self.schedule.num_train_timesteps * cfg.enforce_full_mask_ratio
        )

        rng, r_lat, r_mask = jax.random.split(rng, 3)
        default_mask = binarize_mask(default_mask)

        # initial latents: pure noise at strength 1, else noised image latents
        noise = jax.random.normal(r_lat, (B, h, w, 4), init_image.dtype)
        if cfg.strength >= 1.0:
            latents = noise * self.schedule.init_noise_sigma
        else:
            image_latents = self._encode_image(vae_encode_fn, init_image, r_lat)
            latents = add_noise(self.schedule, image_latents, noise, int(timesteps[0]))

        mask_lat, masked_lat = self._mask_latents(vae_encode_fn, default_mask, init_image, r_mask)

        context = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        t_tab = jnp.asarray(np.asarray(timesteps), dtype=jnp.float32)
        dilate_tab = jnp.asarray(dilate)
        provoke_tab = jnp.asarray(provoke)
        use_default_tab = jnp.asarray(use_default_tab)

        def unet_eps(latents, mask_lat, masked_lat, t):
            lat_in = jnp.concatenate([latents] * 2, axis=0)
            extra = jnp.concatenate(
                [jnp.concatenate([mask_lat, masked_lat], axis=-1)] * 2, axis=0
            )
            lat_in = jnp.concatenate([lat_in, extra], axis=-1)
            t_in = jnp.full((2 * B,), t, dtype=jnp.float32)
            eps = unet_fn(lat_in, t_in, context)
            eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
            return eps_uncond + cfg.guidance_scale * (eps_text - eps_uncond)

        f = max(1, int(cfg.provoke_decode_factor))
        if f > 1:
            # half-res companions for the provoke-step mask math
            default_mask_small = jax.image.resize(
                default_mask, (B, H // f, W // f), method="nearest"
            )
        c = int(cfg.provoke_crop_latent)
        use_crop = 0 < c < min(h, w)
        if use_crop and f > 1:
            raise ValueError(
                "provoke_crop_latent and provoke_decode_factor>1 are "
                "alternative provoke-round accelerators; set one"
            )
        if use_crop:
            offs = crop_offsets(default_mask, c, cfg.vae_scale)  # (B, 2)
            Cp = c * cfg.vae_scale
            crop_lat4 = jax.vmap(
                lambda a, o: jax.lax.dynamic_slice(a, (o[0], o[1], 0), (c, c, a.shape[-1]))
            )
            crop_pix = jax.vmap(
                lambda m, o: jax.lax.dynamic_slice(
                    m, (o[0] * cfg.vae_scale, o[1] * cfg.vae_scale), (Cp, Cp)
                )
            )
            paste_pix = jax.vmap(
                lambda a, o: jax.lax.dynamic_update_slice(
                    jnp.zeros((H, W), a.dtype),
                    a,
                    (o[0] * cfg.vae_scale, o[1] * cfg.vae_scale),
                )
            )
            paste_lat = jax.vmap(
                lambda base, a, o: jax.lax.dynamic_update_slice(base, a, (o[0], o[1], 0))
            )
            init_crops = jax.vmap(
                lambda m, o: jax.lax.dynamic_slice(
                    m,
                    (o[0] * cfg.vae_scale, o[1] * cfg.vae_scale, 0),
                    (Cp, Cp, 3),
                )
            )(init_image, offs)

        def adapt_cropped(pred_x0, base_masked_lat, i, rng):
            """Crop-windowed provoke round: decode/segment/re-encode only the
            default-mask bbox window; everything outside it is discarded by
            the ∧-with-default-mask anyway. Re-encoded masked latents paste
            into the step-0 (default-mask) encode."""
            x0_c = crop_lat4(pred_x0, offs)  # (B, c, c, 4)
            image_c = jnp.clip(vae_decode_fn(x0_c / self.vae_scaling) / 2 + 0.5, 0, 1)
            human_c = segment_fn(image_c).astype(init_image.dtype)  # (B, Cp, Cp)
            grown_c = dilate_mask(human_c, dilate_tab[i])
            dmask_c = crop_pix(default_mask, offs)
            adapted_c = jnp.logical_and(grown_c > 0, dmask_c > 0).astype(human_c.dtype)
            # reference area test (1130-1132) uses the full-frame denominator
            too_small = jnp.sum(human_c, axis=(1, 2)) < H * W * cfg.human_detection_thres
            fallback = jnp.logical_or(too_small, use_default_tab[i])
            mask_c = jnp.where(fallback[:, None, None], dmask_c, adapted_c)
            mask_full = jnp.where(
                fallback[:, None, None], default_mask, paste_pix(adapted_c, offs)
            )
            mask_lat = downsample_mask(binarize_mask(mask_full), cfg.vae_scale)
            # cropped re-encode of the masked window, pasted into the base
            masked_c = init_crops * (binarize_mask(mask_c)[..., None] < 0.5)
            lat_c = self._encode_image(vae_encode_fn, masked_c, rng)
            masked_lat = paste_lat(base_masked_lat, lat_c, offs)
            return mask_lat, masked_lat

        def adapt(pred_x0, mask_lat, masked_lat, i, rng):
            """Decode x̂0, segment, dilate ∧ default mask, re-encode."""
            if f > 1:
                x0 = jax.lax.reduce_window(
                    pred_x0, 0.0, jax.lax.add, (1, f, f, 1), (1, f, f, 1), "VALID"
                ) / (f * f)
                dmask, Hs, Ws = default_mask_small, H // f, W // f
                dilate_i = (dilate_tab[i] + f - 1) // f
            else:
                x0, dmask, Hs, Ws, dilate_i = pred_x0, default_mask, H, W, dilate_tab[i]
            image = jnp.clip(vae_decode_fn(x0 / self.vae_scaling) / 2 + 0.5, 0, 1)
            human = segment_fn(image).astype(init_image.dtype)  # (B, Hs, Ws)
            grown = dilate_mask(human[:, :, :], dilate_i)
            adapted = jnp.logical_and(grown > 0, dmask > 0).astype(human.dtype)
            if f > 1:
                adapted = jax.image.resize(adapted, (B, H, W), method="nearest")
            # fall back to the default mask when the detected human is tiny
            # or the timestep forces the full mask (reference:1130-1137)
            too_small = jnp.sum(human, axis=(1, 2)) < Hs * Ws * cfg.human_detection_thres
            fallback = jnp.logical_or(too_small, use_default_tab[i])
            mask = jnp.where(fallback[:, None, None], default_mask, adapted)
            return self._mask_latents(vae_encode_fn, mask, init_image, rng)

        base_masked_lat0 = masked_lat  # step-0 default-mask encode (crop paste base)

        def step(carry, i):
            latents, mask_lat, masked_lat, rng = carry
            eps = unet_eps(latents, mask_lat, masked_lat, t_tab[i])
            latents, pred_x0 = ddim_step_traced(self.schedule, i, eps, latents)

            if segment_fn is not None and cfg.use_adaptive_mask:
                rng, r_adapt = jax.random.split(rng)
                if use_crop:
                    mask_lat, masked_lat = jax.lax.cond(
                        provoke_tab[i],
                        lambda: adapt_cropped(pred_x0, base_masked_lat0, i, r_adapt),
                        lambda: (mask_lat, masked_lat),
                    )
                else:
                    mask_lat, masked_lat = jax.lax.cond(
                        provoke_tab[i],
                        lambda: adapt(pred_x0, mask_lat, masked_lat, i, r_adapt),
                        lambda: (mask_lat, masked_lat),
                    )
            ys = (
                dict(mask_lat=mask_lat, pred_x0=pred_x0)
                if return_intermediates else None
            )
            return (latents, mask_lat, masked_lat, rng), ys

        (latents, _, _, _), intermediates = jax.lax.scan(
            step,
            (latents, mask_lat, masked_lat, rng),
            jnp.arange(n_steps),
        )

        image = vae_decode_fn(latents / self.vae_scaling)
        image = jnp.clip(image / 2 + 0.5, 0.0, 1.0)
        if return_intermediates:
            return image, intermediates
        return image
