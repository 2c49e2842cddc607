"""CLI: adaptive-mask SD inpainting (reference: ``src/generation/inpaint.py``).

Builds the cross-product work list (renders x valid masks x prompts x
viewpoint augmentations x NUM_IMG_PER_COMBINATION seeds,
``inpaint.py:188-269``), shards it, and runs the jitted adaptive-mask
pipeline BATCHED over images (the reference loops one image per call).
Per-image seeds derive from the inpaint_id (``:308-309``).

Weights: ``--weights_dir`` pointing at converted Flax params (see
``coma_tpu.models.diffusion.weights``); ``--random_weights`` runs the full
machinery with random init (mechanical smoke only — outputs are noise).
"""
from __future__ import annotations

import argparse
import glob as _glob
import os
import pickle

import numpy as np

from coma_tpu.cli._common import (
    add_common_flags,
    enable_compilation_cache,
    lower_all,
    seed_everything,
    shard_worklist,
)
from coma_tpu.config.prompts import (
    ALLOWED_VIEWPOINT_AUGMENTATIONS,
    HF_MODEL_KEYS,
    NUM_IMG_PER_COMBINATION,
    SC2DIFFUSERCONFIG,
    SCV2DIFFUSERCONFIG,
)
from coma_tpu.core.paths import unflatten


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--asset_render_dir", type=str, default="results/generation/renders")
    parser.add_argument("--asset_mask_dir", type=str, default="results/generation/asset_masks")
    parser.add_argument("--valid_mask_dir", type=str, default="results/generation/valid_masks")
    parser.add_argument("--prompt_dir", type=str, default="results/generation/prompts")
    parser.add_argument("--save_dir", type=str, default="results/generation/inpaintings")
    parser.add_argument("--ldm_model_key", type=str, default="realisticvision",
                        choices=list(HF_MODEL_KEYS.keys()))
    parser.add_argument("--adaptive_mask_model_type", type=str, default="p",
                        choices=["p", "baseline", "ps", "ps_ae", "s_pdb_ae", "s_db_ae", "s_ab_ae"])
    parser.add_argument("--weights_dir", type=str, help="converted Flax SD params")
    parser.add_argument("--sam_weights", type=str,
                        help="sam_vit_b_01ec64.pth for the SAM predictor modes")
    parser.add_argument("--person_segmenter", type=str, default="unet",
                        choices=["unet", "pointrend"],
                        help="in-loop person-mask backend; 'pointrend' runs the "
                             "converted detectron2 detector inside the scan "
                             "(the reference's PointRendPredictor)")
    parser.add_argument("--pointrend_weights", type=str,
                        help="converted PointRend params (.npz) for "
                             "--person_segmenter pointrend")
    parser.add_argument("--pointrend_fast", action="store_true",
                        help="bf16 detector compute + stride-4 mask paste for "
                             "the in-loop PointRend (latent-mask IoU vs exact "
                             ">= 0.99 at production scale, "
                             "tests/test_pointrend.py)")
    parser.add_argument("--pointrend_scale_native", action="store_true",
                        help="run the in-loop detector at the pipeline's own "
                             "512 px scale instead of d2's shortest-edge-800 "
                             "resize (2.4x less backbone work; single-person "
                             "candidate budget)")
    parser.add_argument("--random_weights", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model configs at 64x64 (hermetic smoke runs)")
    parser.add_argument("--provoke_decode_factor", type=int, default=1,
                        help="decode in-loop x-hat-0 at 1/f resolution (f=1 is "
                             "reference-exact; f=2 is ~24%% faster and keeps "
                             "mask fidelity with the scale-canonical segmenter)")
    parser.add_argument("--provoke_crop", type=str, default="0",
                        help="crop provoke-round decode/segment/re-encode to "
                             "the default-mask bbox window: 0=off, N=latent "
                             "side, 'auto'=smallest bucket covering the "
                             "batch's bboxes (+halo). Alternative to "
                             "--provoke_decode_factor; approximate (VAE "
                             "mid-attention couples the frame globally). "
                             "'auto' declines near-full-frame masks (bbox "
                             "area > 75%% of the frame) and runs the exact "
                             "full-frame path instead")
    parser.add_argument("--default_ddim_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--num_img_per_combination", type=int, default=NUM_IMG_PER_COMBINATION)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--mesh", type=str, default=None,
                        help="shard each image batch over a data mesh of N "
                             "local devices ('all' = every device). The full "
                             "adaptive-mask scan partitions with zero "
                             "collectives — the in-program successor of the "
                             "reference's one-process-per-GPU inpaint.sh fan-out")
    parser.add_argument("--save_step_video", action="store_true",
                        help="write a per-step mask/x0 GIF next to each batch's "
                             "first image (the reference's use_visualizer)")
    parser.add_argument("--negative_prompt", type=str,
                        default="worst quality, normal quality, low quality, bad anatomy, artifacts, blurry")
    return parser


def build_worklist(args):
    """(render, mask, prompt+aug, inpaint_id) cross product (reference
    ``inpaint.py:188-269``); returns list of work dicts."""
    supercats, cats = lower_all(args.supercategories), lower_all(args.categories)
    work = []
    for vm_pth in sorted(_glob.glob(f"{args.valid_mask_dir}/*/*/*/*.pickle")):
        sc_str, cat_str, asset_id, view_ext = vm_pth.split("/")[-4:]
        supercategory, category = unflatten(sc_str), unflatten(cat_str)
        if supercats and supercategory.lower() not in supercats:
            continue
        if cats and category.lower() not in cats:
            continue
        view_id = view_ext.rsplit(".", 1)[0]
        with open(vm_pth, "rb") as fh:
            valid = pickle.load(fh)
        prompt_pth = f"{args.prompt_dir}/{sc_str}/{cat_str}/{asset_id}/prompts.pickle"
        if not os.path.exists(prompt_pth):
            continue
        with open(prompt_pth, "rb") as fh:
            prompts = pickle.load(fh)["prompts"]

        view_cfg = SCV2DIFFUSERCONFIG.get(supercategory, {}).get(category, {}).get(view_id, {})
        augs = view_cfg.get("view_text", ALLOWED_VIEWPOINT_AUGMENTATIONS)
        sc_cfg = SC2DIFFUSERCONFIG.get(supercategory, {}).get(category, {})
        strength = sc_cfg.get("strength", 1.0)

        render_pth = f"{args.asset_render_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}.png"
        for mask_id in valid["valid_mask_ids"]:
            mask_pth = f"{args.asset_mask_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}/{mask_id}.png"
            for prompt in prompts:
                for aug in augs:
                    full_prompt = prompt if aug == "original" else prompt + aug
                    for inpaint_id in range(args.num_img_per_combination):
                        out = (
                            f"{args.save_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}/"
                            f"{mask_id}/{full_prompt}/{inpaint_id:05d}.png"
                        )
                        if args.skip_done and os.path.exists(out):
                            continue
                        work.append(dict(
                            render=render_pth, mask=mask_pth, prompt=full_prompt,
                            inpaint_id=inpaint_id, out=out, strength=strength,
                        ))
    return work


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.diffusion.clip_text import (
        CLIPTextEncoder,
        tiny_clip_config,
    )
    from coma_tpu.models.diffusion.pipeline import (
        AdaptiveMaskConfig,
        AdaptiveMaskInpaintPipeline,
    )
    from coma_tpu.models.diffusion.unet import (
        UNet2DCondition,
        UNetConfig,
        tiny_unet_config,
    )
    from coma_tpu.models.diffusion.vae import (
        Decoder,
        Encoder,
        VAEConfig,
        tiny_vae_config,
    )
    from coma_tpu.models.segmentation import PersonSegmenter

    res = 64 if args.tiny else 512
    h = res // 8
    ucfg = tiny_unet_config() if args.tiny else UNetConfig(dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    vcfg = tiny_vae_config() if args.tiny else VAEConfig(dtype=jnp.bfloat16)
    enc, dec = Encoder(vcfg), Decoder(vcfg)
    clip = CLIPTextEncoder(tiny_clip_config()) if args.tiny else CLIPTextEncoder()
    seg = PersonSegmenter()

    if args.weights_dir and os.path.exists(args.weights_dir):
        import dataclasses

        from coma_tpu.models.diffusion.weights import (
            infer_sd_configs,
            load_sd_params,
        )

        # rebuild the modules around the CHECKPOINT's configs (SD-2-inpaint
        # — the reference default — uses 1024-dim cross-attention and a
        # 23-layer/1024-wide gelu CLIP; the SD-1.x modules above would fail
        # apply() with shape errors against converted SD-2 params)
        ucfg, ccfg = infer_sd_configs(args.weights_dir)
        ucfg = dataclasses.replace(ucfg, dtype=jnp.bfloat16)
        unet = UNet2DCondition(ucfg)
        clip = CLIPTextEncoder(ccfg)
        params = load_sd_params(args.weights_dir)
    elif args.random_weights:
        k = jax.random.PRNGKey(0)
        # jitted inits: eager flax init dispatches hundreds of single ops,
        # each paying the device link's fixed latency (~10 minutes for the
        # SD trio on the tunneled chip); under jit each is one cached program
        params = dict(
            unet=jax.jit(unet.init)(
                k, jnp.zeros((1, h, h, 9), ucfg.dtype),
                jnp.zeros((1,)),
                jnp.zeros((1, 77, ucfg.cross_attention_dim), ucfg.dtype)),
            vae_encoder=jax.jit(enc.init)(k, jnp.zeros((1, res, res, 3))),
            vae_decoder=jax.jit(dec.init)(k, jnp.zeros((1, h, h, 4))),
            clip=jax.jit(clip.init)(k, jnp.zeros((1, 77), jnp.int32)),
            segmenter=jax.jit(seg.init)(k, jnp.zeros((1, res, res, 3))),
            tokenizer=None,
        )
    else:
        raise SystemExit("pass --weights_dir or --random_weights")

    # params-threading style (generate_p): weights enter jit as arguments,
    # not multi-GB baked constants — far faster compiles
    segment_fn = None
    if args.person_segmenter == "pointrend":
        from coma_tpu.models.pointrend import (
            PointRendConfig,
            PointRendModel,
            make_pointrend_segment_fn,
        )
        from coma_tpu.utils.checkpoint import load_params as _load_np

        # fewer padded detections in-loop: the provoke step only needs the
        # merged person mask, and 20 slots keep the in-jit paste cheap
        if args.tiny:
            pr_cfg = PointRendConfig(max_detections=4, test_size=64,
                                     pre_nms_topk=64, post_nms_topk=32,
                                     box_candidates=32)
        elif args.pointrend_scale_native:
            pr_cfg = PointRendConfig(test_size=512, pre_nms_topk=256,
                                     post_nms_topk=128, box_candidates=64,
                                     max_detections=8)
        else:
            pr_cfg = PointRendConfig(max_detections=20)
        pr_model = PointRendModel(pr_cfg)
        if args.pointrend_weights and os.path.exists(args.pointrend_weights):
            params["pointrend"] = _load_np(args.pointrend_weights)
        elif args.random_weights:
            params["pointrend"] = jax.jit(pr_model.init)(
                jax.random.PRNGKey(2), jnp.zeros((pr_cfg.test_size,) * 2 + (3,))
            )
        else:
            raise SystemExit("--person_segmenter pointrend needs --pointrend_weights")
        person_fn = make_pointrend_segment_fn(
            pr_model,
            compute_dtype=jnp.bfloat16 if args.pointrend_fast else None,
            paste_stride=4 if args.pointrend_fast else 1,
        )
    else:
        from coma_tpu.cli.segment_human import default_segmenter_checkpoint
        from coma_tpu.models.segmentation import make_person_segment_fn
        from coma_tpu.utils.checkpoint import load_params as _load_seg

        # prefer the committed trained checkpoint over the random init —
        # unless --random_weights asked for a hermetic run on purpose
        _ckpt = default_segmenter_checkpoint()
        if not args.random_weights and os.path.exists(_ckpt):
            params["segmenter"] = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.float32), _load_seg(_ckpt)
            )
        # scale-canonical inference: the checkpoint is trained at 128²; the
        # pipeline runs at `res` — resize in, predict, resize out
        _seg_fn = make_person_segment_fn(seg)
        person_fn = lambda prm, imgs: _seg_fn(prm["segmenter"], imgs)
    if args.adaptive_mask_model_type == "p":
        segment_fn = person_fn
    elif args.adaptive_mask_model_type != "baseline":
        # SAM modes (ps / *_ae): person seg seeds a bbox prompt, SAM refines
        # — fully in-scan (reference: adaptive_mask_inpainting.py:1246-1455)
        from coma_tpu.models.sam import (
            SAM,
            SAMConfig,
            make_sam_segment_fn,
            tiny_sam_config,
        )

        scfg = tiny_sam_config() if args.tiny else SAMConfig()
        sam = SAM(scfg)
        if args.sam_weights and args.sam_weights.endswith(".npz"):
            from coma_tpu.utils.checkpoint import load_params

            sam_vars = load_params(args.sam_weights)
        elif args.sam_weights and os.path.exists(args.sam_weights):
            import torch

            from coma_tpu.models.torch_weights_sam import convert_sam

            sam_vars = convert_sam(
                torch.load(args.sam_weights, map_location="cpu"), depth=scfg.depth
            )
        elif args.random_weights:
            sam_vars = jax.jit(sam.init)(
                jax.random.PRNGKey(1),
                jnp.zeros((1, scfg.img_size, scfg.img_size, 3)),
                jnp.zeros((1, 4)),
            )
        else:
            raise SystemExit(
                f"'{args.adaptive_mask_model_type}' needs --sam_weights "
                "(or --random_weights for a mechanical smoke run)"
            )
        params["sam"] = sam_vars
        segment_fn = make_sam_segment_fn(sam, person_fn)

    pipe = AdaptiveMaskInpaintPipeline(
        unet_fn=lambda prm, lat, t, ctx: unet.apply(
            prm["unet"], lat.astype(ucfg.dtype), t, ctx.astype(ucfg.dtype)
        ).astype(jnp.float32),
        vae_encode_fn=lambda prm, img: enc.apply(
            prm["vae_encoder"], img.astype(vcfg.dtype)
        ).astype(jnp.float32),
        vae_decode_fn=lambda prm, lat: dec.apply(
            prm["vae_decoder"], lat.astype(vcfg.dtype)
        ).astype(jnp.float32),
        segment_fn=segment_fn,
        config=AdaptiveMaskConfig(
            num_inference_steps=args.default_ddim_steps,
            guidance_scale=args.guidance_scale,
            use_adaptive_mask=args.adaptive_mask_model_type != "baseline",
            provoke_decode_factor=args.provoke_decode_factor,
        ),
    )

    clip_apply = jax.jit(clip.apply)  # one compile per batch shape

    def encode_prompts(texts):
        tok = params.get("tokenizer")
        if tok is None:
            # random-weights smoke: hash prompts into token ids deterministically
            ids = np.zeros((len(texts), 77), np.int32)
            for i, t in enumerate(texts):
                rng = np.random.default_rng(abs(hash(t)) % (2**32))
                ids[i] = rng.integers(0, 1000, size=77)
        else:
            ids = tok(texts)
        return clip_apply(params["clip"], jnp.asarray(ids))

    run_params = {k: v for k, v in params.items() if k != "tokenizer"}
    return pipe, run_params, encode_prompts, res


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    enable_compilation_cache()

    work = shard_worklist(build_worklist(args), args.parallel_idx, args.parallel_num)
    if not work:
        print("[inpaint] nothing to do")
        return
    pipe, run_params, encode_prompts, res = build_pipeline(args)
    import functools

    from coma_tpu.parallel.flagship import (
        data_parallel_generate,
        pad_ragged_batch,
        resolve_mesh,
    )

    mesh = resolve_mesh(args.mesh)
    n_dev = mesh.shape["data"] if mesh is not None else 1

    import dataclasses as _dc

    from coma_tpu.models.diffusion.pipeline import (
        AdaptiveMaskInpaintPipeline,
        choose_crop_latent,
    )

    _gen_cache = {}

    def generate_for(crop: int):
        """Jitted generate specialized per provoke-crop size (the persistent
        compilation cache keeps each bucket across runs)."""
        if crop not in _gen_cache:
            p = pipe
            if crop:
                p = AdaptiveMaskInpaintPipeline(
                    pipe.unet_fn, pipe.vae_encode_fn, pipe.vae_decode_fn,
                    pipe.segment_fn,
                    config=_dc.replace(pipe.config, provoke_crop_latent=crop),
                    vae_scaling=pipe.vae_scaling,
                )
            if mesh is not None:
                _gen_cache[crop] = data_parallel_generate(
                    p, mesh, return_intermediates=args.save_step_video
                )
            else:
                _gen_cache[crop] = jax.jit(functools.partial(
                    p.generate_p, return_intermediates=args.save_step_video
                ))
        return _gen_cache[crop]

    _warned_crop_declined = False
    for i in range(0, len(work), args.batch_size):
        chunk = work[i : i + args.batch_size]
        imgs = np.stack([
            np.asarray(Image.open(w["render"]).convert("RGB").resize((res, res)), np.float32)
            / 127.5 - 1.0
            for w in chunk
        ])
        masks = np.stack([
            (np.asarray(Image.open(w["mask"]).convert("L").resize((res, res))) > 127)
            .astype(np.float32)
            for w in chunk
        ])
        ctx = encode_prompts([w["prompt"] for w in chunk])
        neg = encode_prompts([args.negative_prompt] * len(chunk))
        # per-image generator seed = inpaint_id (reference :308-309), folded
        # with the global seed
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), chunk[0]["inpaint_id"])
        if args.provoke_crop == "auto":
            # auto declines (crop=0, full frame) when the smallest fitting
            # window is near-full-frame: marginal savings aren't worth the
            # crop approximation (see choose_crop_latent / AdaptiveMaskConfig)
            crop = choose_crop_latent(masks, vae_scale=pipe.config.vae_scale)
            if crop == 0 and not _warned_crop_declined:
                _warned_crop_declined = True
                print("  provoke_crop auto: declined (bbox near-full-frame "
                      "or no bucket fits); using the full-frame path")
        else:
            crop = int(args.provoke_crop)
            if crop:
                # explicit crop: only validate geometric fit (the user made
                # the marginality call) — max_area_ratio=1.0
                need = choose_crop_latent(
                    masks, vae_scale=pipe.config.vae_scale, max_area_ratio=1.0
                )
                if need == 0 or need > crop:
                    # a window smaller than bbox+halo silently zeroes the
                    # adapted mask outside it — refuse instead
                    raise SystemExit(
                        f"--provoke_crop {crop} is smaller than this batch's "
                        f"default-mask bbox + decoder halo (needs "
                        f"{'full-frame' if need == 0 else f'>= {need}'}); "
                        "use --provoke_crop auto"
                    )
        generate = generate_for(crop)
        B_real = len(chunk)
        imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
        if n_dev > 1:
            (imgs, masks, ctx, neg), B_real = pad_ragged_batch(
                [imgs, masks, ctx, neg], n_dev
            )
        if args.save_step_video:
            out, inter = generate(run_params, key, imgs, masks, ctx, neg)
            from coma_tpu.visualization.video import write_adaptive_mask_video

            gif = chunk[0]["out"].rsplit(".", 1)[0] + ".steps.gif"
            os.makedirs(os.path.dirname(gif), exist_ok=True)
            write_adaptive_mask_video(
                inter, lambda lat: pipe.vae_decode_fn(run_params, lat), gif,
                sample=0, every=max(1, args.default_ddim_steps // 16),
            )
        else:
            out = generate(run_params, key, imgs, masks, ctx, neg)
        out_np = (np.asarray(out)[:B_real] * 255).astype(np.uint8)
        for w, img in zip(chunk, out_np):
            os.makedirs(os.path.dirname(w["out"]), exist_ok=True)
            Image.fromarray(img).save(w["out"])
        print(f"[inpaint] {min(i + args.batch_size, len(work))}/{len(work)}")


if __name__ == "__main__":
    main()
