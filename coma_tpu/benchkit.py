"""Benchmark builders: every jit-relevant closure the bench harness traces.

Why this module exists (VERDICT r4 item 1): ``bench.py`` is the orchestrator
the driver runs and the file that gets edited every round. Round 3 and 4 both
lost driver-captured metrics to cold XLA compiles after harness edits. All
code that is *traced* (pipeline builders, jitted rate loops, scan chains, the
torch-CPU baseline mirrors) therefore lives HERE, in a module that only
changes when the benchmarked computation itself changes — orchestrator edits
in bench.py (section ordering, budgets, emit format) can no longer perturb
what gets lowered. (Empirically on jax 0.9.0 the persistent-cache key strips
debug info, so pure line shifts of plain-jit closures do not invalidate it —
verified with a cache-key A/B in round 5 — but genuine signature/default
changes do, and keeping traced code out of the hot-edit file makes the
invariant structural instead of accidental.)

Reference workload being measured: ``src/generation/inpaint.py:367,120,127``
(50 DDIM steps, 21 provoke rounds) + ``utils/adaptive_mask_inpainting.py:
732-1109`` (the adaptive-mask loop) and ``src/coma/extract_coma.py:383-426``
(ComA aggregation at the ``constants/coma/qual.py`` grid shapes).
"""
from __future__ import annotations

import os
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
                    pointrend_fast: bool = False, provoke_crop_latent: int = 0,
                    shared: dict = None):
    """Build one flagship pipeline variant.

    ``shared`` (optional dict) caches the expensive param inits ACROSS
    variants within one process: every variant uses the identical SD
    UNet/VAE params and both PointRend variants use identical PointRend
    params (throughput is weight-independent, only the traced program
    differs). Sharing cuts a suite of six variants from six param builds
    to two. The traced programs are unaffected — same modules, shapes,
    dtypes — so persistent-cache keys do not move.
    """
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
    if shared is not None and "sd" in shared:
        sd_params = shared["sd"]
    else:
        # jit the inits: eager flax init dispatches hundreds of single ops,
        # each paying the tunnel's ~40 ms RPC latency (measured 583 s for
        # the SD trio in round 5); under jit it is one cached program
        sd_params = dict(
            unet=jax.jit(unet.init)(
                k,
                jnp.zeros((1, LAT, LAT, 9), ucfg.dtype),
                jnp.zeros((1,)),
                jnp.zeros((1, 77, ucfg.cross_attention_dim), ucfg.dtype),
            ),
            vae_encoder=jax.jit(enc.init)(k, jnp.zeros((1, RES, RES, 3))),
            vae_decoder=jax.jit(dec.init)(k, jnp.zeros((1, LAT, LAT, 4))),
        )
        if shared is not None:
            shared["sd"] = sd_params
    params = dict(sd_params)

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
        if shared is not None and "pointrend" in shared:
            params["pointrend"] = shared["pointrend"]
        else:
            params["pointrend"] = jax.jit(pr_model.init)(
                jax.random.PRNGKey(2), jnp.zeros((RES, RES, 3)))
            if shared is not None:
                shared["pointrend"] = params["pointrend"]
        person_fn = make_pointrend_segment_fn(
            pr_model,
            compute_dtype=jnp.bfloat16 if pointrend_fast else None,
            paste_stride=4 if pointrend_fast else 1,
        )
    else:
        seg = PersonSegmenter()
        if shared is not None and "segmenter" in shared:
            params["segmenter"] = shared["segmenter"]
        else:
            params["segmenter"] = jax.jit(seg.init)(
                k, jnp.zeros((1, RES, RES, 3)))
            if shared is not None:
                shared["segmenter"] = params["segmenter"]
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
    # drop the init executables from HBM before the (much larger) pipeline
    # program loads: params are plain arrays and survive, programs go
    jax.clear_caches()
    return pipe, params, unet_fn, ucfg


def _pipeline_rate(mask_box: int = 0, iters: int = 2, **kw) -> float:
    """images/sec of one full-size pipeline variant on the chip."""
    import jax
    import jax.numpy as jnp

    # NOTE: on the tunneled backend block_until_ready() can ack before the
    # device finishes; fetching a value is the only reliable completion
    # barrier, so every timed region ends with a scalar fetch.
    t_start = time.perf_counter()
    pipe, params, _, ucfg = _build_pipeline(**kw)
    print(f"[pipeline_rate] build_s={time.perf_counter() - t_start:.1f}",
          file=sys.stderr, flush=True)
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
    t_built = time.perf_counter()
    float(jnp.sum(gen(params, jax.random.PRNGKey(1), img, mask, emb, neg)))
    # phase breakdown to stderr (host-side only): the first call folds
    # trace + compile-or-cache-load + one run; the timed region follows
    print(f"[pipeline_rate] warmup_call_s={time.perf_counter() - t_built:.1f}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    tot = jnp.zeros(())
    for i in range(iters):
        tot = tot + jnp.sum(gen(params, jax.random.PRNGKey(2 + i), img, mask, emb, neg))
    float(tot)
    return BATCH * iters / (time.perf_counter() - t0)


def bench_unet_step(shared: dict = None):
    """Isolated CFG UNet step (batch 2*BATCH: uncond+cond) + measured MFU."""
    import jax
    import jax.numpy as jnp

    _, params, unet_fn, ucfg = _build_pipeline(shared=shared)
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


def bench_pipe_suite(emit) -> None:
    """Every flagship pipeline variant + the isolated UNet step, ONE process.

    Measured in round 5: a standalone pipeline section spends ~770 s outside
    its ~50 s timed region (imports, backend attach, param init, trace,
    persistent-cache load), and five standalone sections repeat almost all
    of it. This suite pays the process/attach cost once and the SD param
    build once (``_build_pipeline(shared=...)``), then measures the variants
    in headline-first order. ``emit(dict)`` runs after EVERY sub-measurement
    — the orchestrator merges all emitted lines, so an orchestrator kill
    mid-suite only costs the not-yet-measured tail, never the headline.
    """
    import jax

    shared: dict = {}

    def one(key, iters=1, **kw):
        # headline gets 2 timed iterations; the others 1 (each iteration is
        # a 16-image batch, ~24 s of chip time — observed run-to-run spread
        # across rounds is <0.2%, and the saved minutes buy whole sections)
        t0 = time.perf_counter()
        rate = _pipeline_rate(shared=shared, iters=iters, **kw)
        emit({key: round(rate, 4)})
        print(f"[suite] {key}={rate:.4f} ({time.perf_counter() - t0:.1f}s)",
              file=sys.stderr, flush=True)
        # drop this variant's executables from HBM before the next one
        # (the persistent on-disk cache is unaffected); params in `shared`
        # are plain arrays and survive
        jax.clear_caches()

    one("hoi_2d_images_per_sec", provoke_decode_factor=1, iters=2)

    t0 = time.perf_counter()
    step_s, mfu = bench_unet_step(shared=shared)
    emit({"unet_cfg_step_ms": round(step_s * 1e3, 2),
          "unet_step_mfu": round(mfu, 4)})
    print(f"[suite] unet_step ({time.perf_counter() - t0:.1f}s)",
          file=sys.stderr, flush=True)
    jax.clear_caches()

    one("hoi_2d_images_per_sec_pointrend_loop", segmenter="pointrend")
    one("hoi_2d_images_per_sec_pointrend_loop_fast",
        segmenter="pointrend", pointrend_fast=True)
    one("hoi_2d_images_per_sec_fast_mode", provoke_decode_factor=2)

    from coma_tpu.models.diffusion.pipeline import choose_crop_latent

    # crop mode: bucket chosen exactly as the CLI does, from a typical
    # person-extent mask (~200 px tall -> latent bucket 40)
    box = np.zeros((1, RES, RES), np.float32)
    box[:, 156:356, 132:316] = 1.0
    bucket = int(choose_crop_latent(box))
    t0 = time.perf_counter()
    rate = _pipeline_rate(mask_box=200, provoke_crop_latent=bucket,
                          shared=shared, iters=1)
    emit({"hoi_2d_images_per_sec_crop_mode": round(rate, 4),
          "crop_mode_latent_bucket": bucket})
    print(f"[suite] crop={rate:.4f} ({time.perf_counter() - t0:.1f}s)",
          file=sys.stderr, flush=True)


def bench_inpaint_torch_cpu() -> float:
    """Baseline images/sec for the dominant per-image work on torch CPU:
    50 CFG UNet steps + 21 provoke-round VAE decodes (full SD-inpaint config
    mirrors from tests/). Segmentation/re-encode excluded — favors the
    baseline. Measured from one step of each (they are step-homogeneous)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tests"))
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


def bench_dp_scaling() -> dict:
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


# ------------------------------------------- production extract_coma path

class _PhaseTimings(dict):
    """timings dict whose writes invoke a callback — lets the bench emit the
    aggregation rate the moment it is measured, before the (slow, tunnel-
    bound) state export runs, so an orchestrator kill mid-export still
    captures the compute metric."""

    def __init__(self, on_set=None):
        super().__init__()
        self._on_set = on_set

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        if self._on_set is not None:
            self._on_set(key, value)


def bench_extract_production(num_samples: int = 64, workdir: str = None,
                             h: int = H, o: int = O, n: int = N,
                             emit=None):
    """Measured samples/s of the PRODUCTION extraction path (VERDICT r4 item
    5): fabricate a reference-schema results tree with full-scale meshes
    (human = 10475 verts, the SMPL-X count; object = 180 points, the qual
    human-contact shape), then time ``run_affordance_extraction`` end-to-end —
    pickle loads, host prep (normals, index-downsample), the prefetching
    loader, the fused aggregation scan, state export, and the product save
    all included. (Ref: ``src/coma/extract_coma.py:383-426``.)

    The returned rate covers the COMPUTE path (load + prep + aggregation +
    product); the state-export pickle is timed separately in the breakdown
    (``export_s``) because on this harness it is dominated by the tunneled
    device->host link (~19 MB/s measured: ~3.9 GB of (H, O, N) grids takes
    ~200 s here vs <1 s over a local PCIe host). ``samples_per_sec_incl_export``
    in the breakdown is the all-in number on THIS harness.

    ``h``/``o``/``n`` exist so tests can drive the identical path at tiny
    shapes on CPU; the bench section runs the reference qual defaults.

    Returns (samples_per_sec, breakdown_dict)."""
    import math
    import pickle
    import shutil
    import tempfile

    from coma_tpu.geometry.mesh import save_obj
    from coma_tpu.pipelines.downsample import (
        downsample_human_template, save_human_downsample)
    from coma_tpu.pipelines.extract import run_affordance_extraction

    sc, cat, asset = "BEHAVE", "backpack", "bench_asset"
    d = workdir or tempfile.mkdtemp(prefix="coma_extract_bench_")
    made_tmp = workdir is None
    root = os.path.join(d, "results")
    constants = os.path.join(d, "constants", "mesh")
    os.makedirs(constants, exist_ok=True)

    # human template: UV sphere sliced to exactly h verts (h=10475 = the
    # SMPL-X vertex count at the default)
    n_lat = max(4, int(math.ceil(math.sqrt(h))) + 1)
    n_lon = max(4, int(math.ceil(h / n_lat)))
    hv, hf = _uv_sphere(n_lat, n_lon)
    hv = hv[:h]
    hf = hf[(hf < h).all(axis=1)]
    meta = downsample_human_template(hv, hf, num_points=h)
    save_human_downsample(meta, h, constants)

    # object asset + downsample pickle at o points
    rng = np.random.default_rng(0)
    obj_lat = max(4, int(math.ceil(math.sqrt(o))) + 1)
    ov, of = _uv_sphere(obj_lat, max(4, int(math.ceil(o / obj_lat)) + 1))
    obj_dir = os.path.join(d, "asset_src")
    os.makedirs(obj_dir, exist_ok=True)
    obj_pth = os.path.join(obj_dir, f"{asset}.obj")
    save_obj(obj_pth, ov, of)
    from coma_tpu.cli import downsample_objects as cli_downsample_objects

    cli_downsample_objects.main([
        "--obj_pth", obj_pth,
        "--supercategory", sc, "--category", cat, "--asset_id", asset,
        "--number_of_points", str(o),
        "--save_dir", os.path.join(root, "coma", "asset_downsample"),
    ])

    # fabricated human samples at full scale (random plausible humans)
    prompt = "a person carrying a backpack"
    base = os.path.join(root, "generation", "human_sample", sc, cat, asset)
    cam_dir = os.path.join(root, "generation", "cameras", sc, cat, asset)
    os.makedirs(cam_dir, exist_ok=True)
    view = "000"
    with open(os.path.join(cam_dir, f"{view}.pickle"), "wb") as fh:
        pickle.dump({"scale": 256.0}, fh)
    sample_dir = os.path.join(base, view, "0", prompt)
    os.makedirs(sample_dir, exist_ok=True)
    t_write0 = time.perf_counter()
    for i in range(num_samples):
        verts = hv * 0.9 + rng.normal(scale=0.02, size=hv.shape) + [0.3, 0.0, 0.2]
        payload = {
            "verts": verts.astype(np.float32), "faces": hf,
            "IoU": 0.9, "interscetion_ratio": 0.01, "num_inliers": 5,
        }
        with open(os.path.join(sample_dir, f"{i:05d}.pickle"), "wb") as fh:
            pickle.dump(payload, fh)
    fabricate_s = time.perf_counter() - t_write0

    hyper = dict(
        human_res="FULL", human_use_downsample_pcd_raw=False,
        object_res=str(o), object_use_downsample_pcd_raw=True,
        principle_vec=[0, 0, 1], sub_principle_vec=[0, 1, 0],
        rel_dist_method="dist", spatial_grid_size=GRID_SIZE,
        spatial_grid_thres=0.5, normal_gaussian_sigma=SIGMA,
        normal_res=n, spatial_res=0, eps=EPS,
        significant_contact_ratio=0.1, enable_postfilter=False,
        standardize_human_scale=False, scaler_range=(0.75, 1.25),
        visualize_type="aggr-human-contact", vis_example_num=0,
        quant_mode=False, quant_keys=[],
    )
    cwd = os.getcwd()
    os.chdir(d)

    # free the fabricate/downsample phase's executables and stray device
    # arrays before the timed region: the aggregation peaks at ~6 padded
    # (H, N, O) grids (~12 GB at the qual shape) and has no headroom for
    # leftovers
    import gc

    import jax

    gc.collect()
    jax.clear_caches()

    def on_phase(key, value):
        if emit is not None and key == "aggregate_s":
            emit({"extract_coma_aggregate_s": round(value, 2),
                  "extract_coma_aggregate_samples_per_sec": round(
                      num_samples / max(value, 1e-9), 3)})

    phases: dict = _PhaseTimings(on_phase)
    try:
        t0 = time.perf_counter()
        saved = run_affordance_extraction(
            hyper, "qual:bench",
            supercategories=[sc.lower()], categories=[cat.lower()],
            results_root=root, constants_mesh_dir=constants, verbose=False,
            timings=phases,
        )
        total_s = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
        if made_tmp:
            shutil.rmtree(d, ignore_errors=True)
    export_s = phases.get("export_s", 0.0)
    compute_s = max(total_s - export_s, 1e-9)
    rate = num_samples / compute_s
    return rate, {"num_samples": num_samples, "total_s": round(total_s, 2),
                  "compute_s": round(compute_s, 2),
                  "aggregate_s": round(phases.get("aggregate_s", 0.0), 2),
                  "export_s": round(export_s, 2),
                  "product_s": round(phases.get("product_s", 0.0), 2),
                  "samples_per_sec_incl_export": round(num_samples / total_s, 3),
                  "fabricate_s": round(fabricate_s, 2),
                  "products_saved": len(saved)}


def _uv_sphere(n_lat, n_lon):
    import math

    verts = []
    for i in range(n_lat):
        th = math.pi * (i + 0.5) / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append([math.sin(th) * math.cos(ph),
                          math.sin(th) * math.sin(ph), math.cos(th)])
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            faces.append([a, b, b + n_lon])
            faces.append([a, b + n_lon, a + n_lon])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)
