"""Benchmark: the BASELINE.md north-star metric set, on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}:

- metric/value:   2D-HOI images/sec/chip — the flagship: the FULL adaptive-
  mask inpainting pipeline (512², 50 DDIM steps, CFG, bf16 UNet, 21 in-loop
  segment + VAE decode/encode rounds, one lax.scan) at the CLI's default
  batch 16. Reference workload: ``src/generation/inpaint.py:367,120,127`` +
  ``utils/adaptive_mask_inpainting.py:732-1109``.
- vs_baseline:    measured on this host — a torch-CPU mirror of the same
  dominant work (50 CFG UNet steps + 21 x̂₀ VAE decodes per image). The
  reference publishes no numbers (BASELINE.md), so the baseline is the
  reference-style torch stack on the only hardware it can run on here.
- extra:          per-mode pipeline rates, UNet CFG-step latency + measured
  MFU, the ComA aggregation rates at the reference grid shapes, the
  dp-sharded flagship scaling curve on a virtual mesh, and the measured
  mini-category end-to-end stage wall-clocks.

Harness design (round 4): the driver runs ``python bench.py`` under an
external timeout, and round 3 lost every number to it. So the harness is now
an ORCHESTRATOR that never touches the TPU backend itself:

- every section runs in its own BOUNDED subprocess (guards are time-shaped,
  not exception-shaped — a section that merely runs long is killed, not
  waited on), sharing the persistent XLA compile cache;
- sections run cheapest/headline-first; the mini-category e2e runs LAST and
  only if budget remains;
- a global wall-clock budget (env ``COMA_BENCH_BUDGET_S``, default 1440 s)
  gates every section start: a section that cannot fit in the remaining
  budget is skipped and recorded as ``skipped (budget)``;
- the final JSON line is printed exactly once, also on SIGTERM/SIGINT/
  normal-exit via atexit, with whatever has been measured by then.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

# ---------------------------------------------------------------- ComA

H, O, N = 10475, 180, 250
SIGMA, GRID_SIZE, THRES, EPS = 0.25, 0.07, 0.03, 1e-10
TPU_ITERS = 32
BASELINE_ITERS = 2

# TPU v5e (v5 lite) bf16 peak; used only for the MFU figure
V5E_BF16_PEAK = 197e12

DEFAULT_BUDGET_S = 1440.0


def make_samples(b):
    rng = np.random.default_rng(0)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    return (
        (rng.normal(size=(b, H, 3)) * 0.3).astype(np.float32),
        unit(rng.normal(size=(b, H, 3))).astype(np.float32),
        (rng.normal(size=(b, O, 3)) * 0.3).astype(np.float32),
        unit(rng.normal(size=(b, O, 3))).astype(np.float32),
    )


def bench_coma_tpu(h=H, o=O, iters=TPU_ITERS):
    import jax
    import jax.numpy as jnp

    from coma_tpu.affordance.state import init_coma_state
    from coma_tpu.ops.contact_kernel import fused_contact_update_batch

    rng = np.random.default_rng(0)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(iters, h, 3)) * 0.3, jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(iters, h, 3))), jnp.float32)
    ov = jnp.asarray(rng.normal(size=(iters, o, 3)) * 0.3, jnp.float32)
    on = jnp.asarray(unit(rng.normal(size=(iters, o, 3))), jnp.float32)
    state = init_coma_state(h, o, N, GRID_SIZE, THRES, SIGMA, eps=EPS)
    return _sustained_rate(
        fused_contact_update_batch, state, (hv, hn, ov, on), iters)


def _sustained_rate(step_fn, state, step_args, iters):
    """(rate, raw-chain-times) with the axon fetch tax differenced out.

    The tunnel charges a measured ~30-55 ms fixed tax on every host value
    fetch. Production (extract_coma) runs many batch steps back-to-back with
    ONE final fetch, so the honest rate is the sustained per-step time: time
    a 1-chain and a 2-chain region (each ending in a single fetch) and
    difference them. Each chain is a `lax.scan` inside ONE jit: the pallas
    kernels alias their accumulator input to the output, so the scan carry
    updates IN PLACE and peak HBM stays at ~2 states. (The earlier host-side
    chain held 3+ un-donatable multi-GB states in flight — see docs/KERNELS.md
    "Donation of aliased pallas buffers" — and RESOURCE_EXHAUSTED the chip at
    the reference qual shape.) The raw chain wall-clocks ride along so a
    reviewer can sanity-check the subtraction."""
    import jax
    from jax import lax

    def chain(k):
        @jax.jit
        def run(st, args):
            body = lambda s, _: (step_fn(s, *args), None)
            st, _ = lax.scan(body, st, None, length=k)
            return st

        out = run(state, step_args)  # compile + warm
        float(out.used_count)
        del out
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(state, step_args)
            float(out.used_count)
            best = min(best, time.perf_counter() - t0)
            del out
        return best

    w1 = chain(1)
    w2 = chain(2)
    rate = iters / max(w2 - w1, 1e-9)
    return rate, {"w1_s": round(w1, 4), "w2_s": round(w2, 4)}


def bench_occupancy_tpu():
    """Occupancy-voxel aggregation at reference scale (H=10475, 30³ grid,
    ``constants/coma/qual.py`` occupancy config)."""
    import jax
    import jax.numpy as jnp

    from coma_tpu.affordance.state import init_occupancy_state
    from coma_tpu.ops.occupancy_kernel import fused_occupancy_update_batch

    state = init_occupancy_state(H, O, spatial_res=30, scale_tolerance=1.5)
    rng = np.random.default_rng(0)
    hv = jnp.asarray(rng.normal(size=(TPU_ITERS, H, 3)) * 0.3, jnp.float32)
    ov = jnp.asarray(rng.normal(size=(TPU_ITERS, O, 3)) * 0.3, jnp.float32)
    return _sustained_rate(fused_occupancy_update_batch, state, (hv, ov),
                           TPU_ITERS)


def bench_coma_torch_cpu() -> float:
    """Reference-style torch update on host CPU (the measurable baseline)."""
    import torch

    grid_np = _fibonacci(N)
    grid = torch.tensor(grid_np, dtype=torch.float32)
    p = torch.tensor([0.0, 0.0, 1.0])
    ph = torch.zeros(H, O, N)
    po = torch.zeros(H, O, N)
    nom = torch.zeros(H, O)
    sig = torch.zeros(H, O)

    def canon(a, b):
        c = b @ p
        w = torch.cross(b, p.expand_as(b), dim=-1)
        a_dot_w = a @ w.T
        out = (
            a_dot_w[:, :, None] * w[None] / (1.0 + c)[None, :, None]
            + c[None, :, None] * a[:, None, :]
            + (a @ b.T)[:, :, None] * p[None, None, :]
            - (a @ p)[:, None, None] * b[None, :, :]
        )
        return out / out.norm(dim=-1, keepdim=True)

    def splat(d):
        cos = torch.einsum("hok,nk->hon", d, grid).clamp(-1 + EPS, 1 - EPS)
        return torch.exp(-torch.arccos(cos) ** 2 / SIGMA**2)

    hv, hn, ov, on = (torch.tensor(x) for x in make_samples(BASELINE_ITERS))
    hn = torch.where(hn[..., 2:3] < -0.99, -hn, hn)
    on = torch.where(on[..., 2:3] < -0.99, -on, on)

    t0 = time.perf_counter()
    for i in range(BASELINE_ITERS):
        d = (hv[i][:, None, :] - ov[i][None, :, :]).square().sum(-1).sqrt()
        sig += (d < THRES).float()
        nom += torch.exp(-d / GRID_SIZE)
        ph += splat(canon(hn[i], on[i]))
        po += splat(canon(on[i], hn[i]).permute(1, 0, 2))
    dt = time.perf_counter() - t0
    return BASELINE_ITERS / dt


def _fibonacci(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], -1
    ).astype(np.float32)


# ----------------------------------------------------- flagship: 2D HOI

RES, LAT, BATCH, STEPS = 512, 64, 16, 50


def _build_pipeline(provoke_decode_factor: int = 1, segmenter: str = "unet",
                    pointrend_fast: bool = False, provoke_crop_latent: int = 0):
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.diffusion.pipeline import (
        AdaptiveMaskConfig,
        AdaptiveMaskInpaintPipeline,
    )
    from coma_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
    from coma_tpu.models.diffusion.vae import Decoder, Encoder, VAEConfig
    from coma_tpu.models.segmentation import PersonSegmenter

    ucfg = UNetConfig(dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    vcfg = VAEConfig(dtype=jnp.bfloat16)
    enc, dec = Encoder(vcfg), Decoder(vcfg)

    k = jax.random.PRNGKey(0)
    params = dict(
        unet=unet.init(
            k,
            jnp.zeros((1, LAT, LAT, 9), ucfg.dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, ucfg.cross_attention_dim), ucfg.dtype),
        ),
        vae_encoder=enc.init(k, jnp.zeros((1, RES, RES, 3))),
        vae_decoder=dec.init(k, jnp.zeros((1, LAT, LAT, 4))),
    )

    unet_fn = lambda prm, lat, t, ctx: unet.apply(
        prm["unet"], lat.astype(ucfg.dtype), t, ctx.astype(ucfg.dtype)
    ).astype(jnp.float32)
    if segmenter == "pointrend":
        # the reference's in-loop segmenter family (PointRendPredictor,
        # adaptive_mask_inpainting.py:1182-1243) at the pipeline's native
        # 512 px scale; random-init params — throughput is weight-independent
        from coma_tpu.models.pointrend import (
            PointRendConfig, PointRendModel, make_pointrend_segment_fn)

        pr_cfg = PointRendConfig(test_size=512, pre_nms_topk=256,
                                 post_nms_topk=128, box_candidates=64,
                                 max_detections=8)
        pr_model = PointRendModel(pr_cfg)
        params["pointrend"] = pr_model.init(
            jax.random.PRNGKey(2), jnp.zeros((RES, RES, 3)))
        person_fn = make_pointrend_segment_fn(
            pr_model,
            compute_dtype=jnp.bfloat16 if pointrend_fast else None,
            paste_stride=4 if pointrend_fast else 1,
        )
    else:
        seg = PersonSegmenter()
        params["segmenter"] = seg.init(k, jnp.zeros((1, RES, RES, 3)))
        person_fn = lambda prm, imgs: (
            jax.nn.sigmoid(seg.apply(prm["segmenter"], imgs)) >= 0.5
        ).astype(jnp.float32)
    pipe = AdaptiveMaskInpaintPipeline(
        unet_fn=unet_fn,
        vae_encode_fn=lambda prm, img: enc.apply(
            prm["vae_encoder"], img.astype(vcfg.dtype)
        ).astype(jnp.float32),
        vae_decode_fn=lambda prm, lat: dec.apply(
            prm["vae_decoder"], lat.astype(vcfg.dtype)
        ).astype(jnp.float32),
        segment_fn=person_fn,
        config=AdaptiveMaskConfig(
            num_inference_steps=STEPS,
            provoke_decode_factor=provoke_decode_factor,
            provoke_crop_latent=provoke_crop_latent,
        ),
    )
    return pipe, params, unet_fn, ucfg


def _pipeline_rate(mask_box: int = 0, **kw) -> float:
    """images/sec of one full-size pipeline variant on the chip."""
    import jax
    import jax.numpy as jnp

    # NOTE: on the tunneled backend block_until_ready() can ack before the
    # device finishes; fetching a value is the only reliable completion
    # barrier, so every timed region ends with a scalar fetch.
    pipe, params, _, ucfg = _build_pipeline(**kw)
    img = jnp.zeros((BATCH, RES, RES, 3))
    if mask_box:
        # a realistic person-extent default mask (crop mode anchors its
        # decode window on the mask bbox; throughput of the OTHER modes
        # is mask-content-independent, so rates stay comparable)
        lo, hi = (RES - mask_box) // 2, (RES + mask_box) // 2
        mask = jnp.zeros((BATCH, RES, RES)
                         ).at[:, lo:hi, lo - 24:hi - 40].set(1.0)
    else:
        mask = jnp.ones((BATCH, RES, RES))
    emb = jnp.zeros((BATCH, 77, ucfg.cross_attention_dim))
    neg = jnp.zeros_like(emb)
    gen = jax.jit(pipe.generate_p)
    float(jnp.sum(gen(params, jax.random.PRNGKey(1), img, mask, emb, neg)))
    t0 = time.perf_counter()
    iters = 2
    tot = jnp.zeros(())
    for i in range(iters):
        tot = tot + jnp.sum(gen(params, jax.random.PRNGKey(2 + i), img, mask, emb, neg))
    float(tot)
    return BATCH * iters / (time.perf_counter() - t0)


def bench_unet_step():
    """Isolated CFG UNet step (batch 2*BATCH: uncond+cond) + measured MFU."""
    import jax
    import jax.numpy as jnp

    _, params, unet_fn, ucfg = _build_pipeline()
    lat_in = jnp.zeros((2 * BATCH, LAT, LAT, 9), jnp.float32)
    t_in = jnp.full((2 * BATCH,), 500.0)
    ctx = jnp.zeros((2 * BATCH, 77, ucfg.cross_attention_dim))
    step = jax.jit(lambda p, l, t, c: unet_fn(p, l, t, c))
    compiled = step.lower(params, lat_in, t_in, ctx).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    if not flops or not np.isfinite(flops):
        # analytic fallback: SD-1.x UNet ≈ 677 GMACs per 512² image
        flops = 677e9 * 2 * 2 * BATCH
    float(jnp.sum(compiled(params, lat_in, t_in, ctx)))
    t0 = time.perf_counter()
    n = 10
    tot = jnp.zeros(())
    for _ in range(n):
        tot = tot + jnp.sum(compiled(params, lat_in, t_in, ctx))
    float(tot)
    step_s = (time.perf_counter() - t0) / n
    mfu = flops / step_s / V5E_BF16_PEAK
    return step_s, mfu


def bench_inpaint_torch_cpu() -> float:
    """Baseline images/sec for the dominant per-image work on torch CPU:
    50 CFG UNet steps + 21 provoke-round VAE decodes (full SD-inpaint config
    mirrors from tests/). Segmentation/re-encode excluded — favors the
    baseline. Measured from one step of each (they are step-homogeneous)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import torch

    from torch_sd_mirror import UNetMirror, VAEDecoderMirror

    with torch.no_grad():
        unet = UNetMirror().eval()  # defaults = full SD-inpaint config
        lat = torch.zeros(2, 9, LAT, LAT)
        t = torch.full((2,), 500.0)
        ctx = torch.zeros(2, 77, 768)
        unet(lat, t, ctx)  # warmup
        t0 = time.perf_counter()
        unet(lat, t, ctx)
        unet_s = time.perf_counter() - t0

        dec = VAEDecoderMirror(3, (128, 256, 512, 512), 2, 32).eval()
        z = torch.zeros(1, 4, LAT, LAT)
        dec(z)
        t0 = time.perf_counter()
        dec(z)
        dec_s = time.perf_counter() - t0
    per_image = STEPS * unet_s + 21 * dec_s
    return 1.0 / per_image


# ----------------------------------------------------------- sections
#
# Each section runs in its own subprocess (`python bench.py --section X`)
# and prints its result dict as the final `@@BENCH@@ {...}` line.


def section_coma() -> dict:
    qual, qual_raw = bench_coma_tpu()
    objc, _ = bench_coma_tpu(h=1000, o=1500, iters=16)
    quant, _ = bench_coma_tpu(h=750, o=2048, iters=16)
    occ, _ = bench_occupancy_tpu()
    return {
        "coma_contact_aggregation_samples_per_sec": _round(qual, 3),
        "coma_object_contact_samples_per_sec": _round(objc, 3),
        "coma_quant_full_samples_per_sec": _round(quant, 3),
        "coma_occupancy_aggregation_samples_per_sec": _round(occ, 3),
        "coma_contact_chain_times_s": qual_raw,
    }


def section_unet_step() -> dict:
    step_s, mfu = bench_unet_step()
    return {"unet_cfg_step_ms": _round(step_s * 1e3, 2),
            "unet_step_mfu": _round(mfu, 4)}


def section_pipe_exact() -> dict:
    return {"hoi_2d_images_per_sec": _round(
        _pipeline_rate(provoke_decode_factor=1), 4)}


def section_pipe_fast() -> dict:
    return {"hoi_2d_images_per_sec_fast_mode": _round(
        _pipeline_rate(provoke_decode_factor=2), 4)}


def section_pipe_pointrend_both() -> dict:
    """Both in-loop PointRend variants in one subprocess: they share the
    imports and the backend attach (~60-90 s each on this tunnel), and they
    matter as a pair (exact vs --pointrend_fast)."""
    out = section_pipe_pointrend_fast()
    out.update(section_pipe_pointrend())
    return out


def section_pipe_modes() -> dict:
    """The two secondary decode modes (fast, crop) in one subprocess —
    same attach-sharing rationale."""
    out = section_pipe_fast()
    out.update(section_pipe_crop())
    return out


def section_pipe_crop() -> dict:
    # crop mode (`--provoke_crop`): decode/segment/re-encode only the
    # default-mask bbox window. Bucket chosen exactly as the CLI does, from
    # a typical person-extent mask (~200 px tall -> latent bucket 40).
    from coma_tpu.models.diffusion.pipeline import choose_crop_latent

    _box = np.zeros((1, RES, RES), np.float32)
    _box[:, 156:356, 132:316] = 1.0
    crop_bucket = choose_crop_latent(_box)
    rate = _pipeline_rate(mask_box=200, provoke_crop_latent=crop_bucket)
    return {"hoi_2d_images_per_sec_crop_mode": _round(rate, 4),
            "crop_mode_latent_bucket": int(crop_bucket)}


def section_pipe_pointrend() -> dict:
    return {"hoi_2d_images_per_sec_pointrend_loop": _round(
        _pipeline_rate(segmenter="pointrend"), 4)}


def section_pipe_pointrend_fast() -> dict:
    return {"hoi_2d_images_per_sec_pointrend_loop_fast": _round(
        _pipeline_rate(segmenter="pointrend", pointrend_fast=True), 4)}


def section_torch_baselines() -> dict:
    return {
        "inpaint_torch_cpu_imgs_per_sec": bench_inpaint_torch_cpu(),
        "coma_torch_cpu_samples_per_sec": bench_coma_torch_cpu(),
    }


def section_dp_scaling() -> dict:
    """dp-sharded flagship scaling on a virtual 8-device CPU mesh (VERDICT r3
    item 8): weak-scaling step times of the FULL adaptive-mask scan at tiny
    shapes, 2 images per device. Correctness is covered by dryrun_multichip;
    this records the SPMD partitioner's scaling shape."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from coma_tpu.models.diffusion.pipeline import (
        AdaptiveMaskConfig, AdaptiveMaskInpaintPipeline)
    from coma_tpu.models.diffusion.unet import UNet2DCondition, tiny_unet_config
    from coma_tpu.models.diffusion.vae import Decoder, Encoder, tiny_vae_config
    from coma_tpu.parallel.flagship import data_parallel_generate

    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    vcfg = tiny_vae_config()
    enc, dec = Encoder(vcfg), Decoder(vcfg)
    R = 64
    k = jax.random.PRNGKey(0)
    params = dict(
        unet=model.init(k, jnp.zeros((1, 8, 8, 9)), jnp.zeros((1,)),
                        jnp.zeros((1, 7, cfg.cross_attention_dim))),
        vae_encoder=enc.init(k, jnp.zeros((1, R, R, 3))),
        vae_decoder=dec.init(k, jnp.zeros((1, 8, 8, 4))),
    )
    pipe = AdaptiveMaskInpaintPipeline(
        unet_fn=lambda p, l, t, c: model.apply(p["unet"], l, t, c),
        vae_encode_fn=lambda p, img: enc.apply(p["vae_encoder"], img),
        vae_decode_fn=lambda p, l: dec.apply(p["vae_decoder"], l),
        segment_fn=lambda p, images: (images.mean(-1) > 0.6).astype(jnp.float32),
        config=AdaptiveMaskConfig(num_inference_steps=50),
    )
    devices = jax.devices()
    curve = {}
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = jax.sharding.Mesh(np.asarray(devices[:n]), ("data",))
        B = 2 * n  # weak scaling: constant per-device batch
        img = jnp.zeros((B, R, R, 3))
        mask = jnp.zeros((B, R, R)).at[:, 8:40, 8:40].set(1.0)
        ctx = jnp.zeros((B, 7, cfg.cross_attention_dim))
        neg = jnp.zeros_like(ctx)
        gen = data_parallel_generate(pipe, mesh)
        out = gen(params, k, img, mask, ctx, neg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(gen(params, k, img, mask, ctx, neg))
        dt = time.perf_counter() - t0
        curve[str(n)] = {"batch": B, "step_s": round(dt, 3),
                         "imgs_per_sec": round(B / dt, 2)}
    return {"flagship_dp_virtual_scaling": curve}


def section_e2e() -> dict:
    """Measured mini-category end-to-end (real stage CLIs as subprocesses,
    host overheads included); time-boxed by the orchestrator."""
    from bench_e2e import run_mini_category

    return {"mini_category_stage_seconds": run_mini_category(
        seeds=4, log=lambda *a: None)}


SECTION_FNS = {
    "coma": section_coma,
    "unet_step": section_unet_step,
    "pipe_exact": section_pipe_exact,
    "torch_baselines": section_torch_baselines,
    "pipe_pointrend_fast": section_pipe_pointrend_fast,
    "pipe_pointrend": section_pipe_pointrend,
    "pipe_pointrend_both": section_pipe_pointrend_both,
    "pipe_fast": section_pipe_fast,
    "pipe_crop": section_pipe_crop,
    "pipe_modes": section_pipe_modes,
    "dp_scaling": section_dp_scaling,
    "e2e": section_e2e,
}

# (name, needs_tpu, min_needed_s) in priority order. min_needed gates the
# section START against the remaining budget; once started, a section may
# use the WHOLE remaining budget — a fixed small cap proved actively
# harmful: killing a cold XLA compile mid-flight also forfeits the
# persistent-cache write, so the next attempt is cold again. The HEADLINE
# section (pipe_exact — it alone determines `value`) runs first so a slow
# round can only cost secondary numbers, never the headline; round-4
# calibration lost the headline by running it third.
SECTION_PLAN = [
    ("pipe_exact",          True,  240),
    ("coma",                True,  120),
    ("pipe_modes",          True,  300),
    ("unet_step",           True,  120),
    ("pipe_pointrend_both", True,  300),
    ("dp_scaling",          False, 120),
    ("e2e",                 True,  420),
]

# CACHE-KEY DISCIPLINE (hard-won, round 4): the persistent-compile-cache key
# embeds the source line numbers of the lambdas/closures defined in THIS
# file (they surface in the HLO via jax source info). Editing bench.py above
# the sections area shifts those lines and silently invalidates every cached
# pipeline compile (~15-20 min each to rebuild on this 1-CPU host). Make
# edits BELOW the jit-relevant definitions (roughly: below SECTION_FNS), or
# expect the next bench run to recompile the world.

# torch_baselines never touches the chip, costs ~8 CPU-minutes, and its
# numbers are a constant of this host — so they are measured ONCE and cached
# in a committed file. Re-measuring concurrently with the TPU sections
# (round-4 calibration) starved XLA compiles on this 1-CPU host: unet_step
# went 809 s with torch burning the core vs ~1-2 min alone. When the cache
# file is absent the section runs in the background as before (and writes
# the cache on success); delete the file to force a re-measure.
BACKGROUND_SECTION = "torch_baselines"
BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baselines_cache.json")

# seconds to let the axon tunnel reclaim a just-killed client's HBM before
# the next section attaches (observed: sections started immediately after a
# kill hit RESOURCE_EXHAUSTED that a fresh chip doesn't produce)
SETTLE_S = 10.0

SECTION_MARK = "@@BENCH@@ "


def _round(x, nd):
    return round(x, nd) if isinstance(x, (int, float)) else None


def _device_reachable(timeout_s: int = 170, attempts: int = 2) -> bool:
    """Probe the accelerator in a BOUNDED subprocess before any section
    touches the backend: a dead axon tunnel hangs backend init indefinitely
    (no exception to degrade on). Sections are themselves time-bounded, so
    the probe only avoids burning the whole budget on a dead tunnel; it
    retries once because a single slow tunnel handshake (observed when a
    previous client just released the chip) must not zero a whole round.
    Handshake latency observed on this tunnel: 20 s to >120 s."""
    for i in range(attempts):
        if i:
            time.sleep(15)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(float(jax.numpy.ones(()).sum()))"],
                capture_output=True, timeout=timeout_s,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _run_section(name: str, timeout_s: float):
    """Run one section subprocess; returns (result_dict_or_None, status)."""
    global _current_child
    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    try:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        _current_child = proc
        try:
            out, err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            return None, "timeout"
        finally:
            _current_child = None
    except Exception as exc:
        return None, f"spawn failed: {type(exc).__name__}"
    if proc.returncode != 0:
        tail = (err or "").strip().splitlines()[-3:]
        return None, "failed: " + " | ".join(tail)[:240]
    for line in reversed((out or "").splitlines()):
        if line.startswith(SECTION_MARK):
            try:
                return json.loads(line[len(SECTION_MARK):]), "ok"
            except json.JSONDecodeError:
                return None, "bad section output"
    return None, "no section output"


# --------------------------------------------------------- orchestrator

_emitted = False
_current_child = None
_bg_child = None


def _emit(extras: dict, sections: dict):
    """Print the one JSON line (idempotent — also runs from atexit)."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    imgs = extras.get("hoi_2d_images_per_sec")
    base = extras.get("inpaint_torch_cpu_imgs_per_sec")
    coma_base = extras.get("coma_torch_cpu_samples_per_sec")
    coma_sps = extras.get("coma_contact_aggregation_samples_per_sec")
    out = {
        "metric": "hoi_2d_images_per_sec_per_chip",
        "value": _round(imgs, 4),
        "unit": "img/s/chip (512², 50 DDIM, adaptive-mask, reference-exact, batch 16)",
        "vs_baseline": (round(imgs / base, 2) if (base and imgs) else None),
        "extra": {
            k: v for k, v in extras.items() if k != "hoi_2d_images_per_sec"
        },
    }
    # BASELINE.md north-star #3: BEHAVE-backpack 2D-stage category
    # wall-clock. Workload shape from the reference configs
    # (constants/generation/{assets,prompts}.py): 4 views x 10 perturbs x
    # 1 valid mask x (3 prompts x 2 viewpoint augs) x 10 seeds = 2400
    # images, projected from the measured rate.
    out["extra"]["behave_backpack_2d_category_wallclock_min_per_chip"] = (
        round(2400 / imgs / 60.0, 1) if imgs else None)
    out["extra"]["coma_vs_torch_cpu"] = (
        round(coma_sps / coma_base, 2) if (coma_base and coma_sps) else None)
    out["extra"]["baseline_def"] = (
        "torch-CPU mirrors on this host (reference publishes none)")
    out["extra"]["sections"] = sections
    print(json.dumps(out), flush=True)


def main():
    budget = float(os.environ.get("COMA_BENCH_BUDGET_S", DEFAULT_BUDGET_S))
    t_start = time.perf_counter()
    deadline = t_start + budget
    extras: dict = {}
    sections: dict = {}

    import atexit

    atexit.register(lambda: _emit(extras, sections))

    def on_signal(signum, frame):
        for child in (_current_child, _bg_child):
            if child is not None:
                try:
                    child.kill()
                except Exception:
                    pass
        _emit(extras, sections)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    probe_t0 = time.perf_counter()
    sections["device_probe"] = {"status": "in progress"}
    tpu_ok = _device_reachable()
    if not tpu_ok:
        print("bench: accelerator unreachable (probe timed out); TPU "
              "sections will be skipped", file=sys.stderr)
    sections["device_probe"] = {
        "status": "ok" if tpu_ok else "unreachable",
        "seconds": round(time.perf_counter() - probe_t0, 1),
    }

    # torch-CPU baselines: host constants — use the committed cache when
    # present; only measure (in the background) when it is absent
    global _bg_child
    bg_proc = None
    bg_t0 = time.perf_counter()
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as rf:
                cached = json.load(rf)
            extras.update(cached.get("values", {}))
            sections[BACKGROUND_SECTION] = {
                "status": "cached", "measured_at": cached.get("measured_at")}
        except Exception as exc:
            sections[BACKGROUND_SECTION] = {
                "status": f"cache unreadable: {type(exc).__name__}"}
    else:
        try:
            bg_proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--section", BACKGROUND_SECTION],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            _bg_child = bg_proc
        except Exception as exc:
            sections[BACKGROUND_SECTION] = {
                "status": f"spawn failed: {type(exc).__name__}"}

    skip_e2e = bool(os.environ.get("COMA_BENCH_SKIP_E2E"))
    prev_killed = False
    for name, needs_tpu, min_needed in SECTION_PLAN:
        if name == "e2e" and skip_e2e:
            sections[name] = {"status": "skipped (COMA_BENCH_SKIP_E2E)"}
            continue
        if needs_tpu and not tpu_ok:
            sections[name] = {"status": "skipped (device unreachable)"}
            continue
        if needs_tpu and prev_killed:
            time.sleep(SETTLE_S)  # let the tunnel reclaim the killed client
            prev_killed = False
        remaining = deadline - time.perf_counter()
        if remaining < min_needed:
            sections[name] = {
                "status": f"skipped (budget: {remaining:.0f}s left, "
                          f"needs {min_needed}s)"}
            continue
        t0 = time.perf_counter()
        result, status = _run_section(name, remaining)
        if (result is None and needs_tpu and status.startswith("failed")
                and deadline - time.perf_counter() > min_needed):
            # transient tunnel faults (RESOURCE_EXHAUSTED right after a
            # client kill) are common enough to warrant one retry; a
            # worker CRASH (observed round 4: "TPU worker process crashed
            # or restarted") needs the chip to come back, which takes
            # closer to a minute than ten seconds
            crashy = ("crashed" in status or "RESOURCE_EXHAUSTED" in status
                      or "UNAVAILABLE" in status)
            time.sleep(60.0 if crashy else SETTLE_S)
            result, status2 = _run_section(
                name, deadline - time.perf_counter())
            status = f"{status2} (retried: {status[:120]})"
        sections[name] = {"status": status,
                          "seconds": round(time.perf_counter() - t0, 1)}
        prev_killed = status.startswith("timeout")
        if result:
            extras.update(result)
        print(f"bench section {name}: {status} "
              f"({sections[name].get('seconds', '?')}s)", file=sys.stderr)

    if bg_proc is not None:
        try:
            out, _ = bg_proc.communicate(
                timeout=max(5.0, deadline - time.perf_counter()))
            status = "ok" if bg_proc.returncode == 0 else "failed"
            for line in reversed((out or "").splitlines()):
                if line.startswith(SECTION_MARK):
                    values = json.loads(line[len(SECTION_MARK):])
                    extras.update(values)
                    try:
                        with open(BASELINE_CACHE, "w") as wf:
                            json.dump({"values": values,
                                       "measured_at": time.strftime(
                                           "%Y-%m-%d %H:%M UTC", time.gmtime()),
                                       "host_cpus": os.cpu_count()}, wf)
                    except OSError:
                        pass
                    break
            else:
                status = "no section output" if status == "ok" else status
        except subprocess.TimeoutExpired:
            bg_proc.kill()
            bg_proc.communicate()
            status = "timeout"
        except Exception as exc:
            status = f"failed: {type(exc).__name__}"
        sections[BACKGROUND_SECTION] = {
            "status": status,
            "seconds": round(time.perf_counter() - bg_t0, 1),
            "concurrent": True,
        }

    _emit(extras, sections)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        from coma_tpu.cli._common import enable_compilation_cache

        enable_compilation_cache()
        result = SECTION_FNS[sys.argv[2]]()
        print(SECTION_MARK + json.dumps(result), flush=True)
    else:
        main()
