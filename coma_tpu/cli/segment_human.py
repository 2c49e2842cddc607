"""CLI: segment humans in inpainted images (reference: ``src/generation/segment_human.py``).

Runs the TPU-resident person segmenter over every inpainted image and saves
instance pickles (masks/boxes/scores as plain numpy — the framework-agnostic
equivalent of the reference's detectron2 Instances / EasyDict subsets,
``segment_human.py:153-169``). Images whose prompt lacks the 'full body'
augmentation are skipped like the reference's prompt filter (``:66-73``).
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


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--prompts", type=str, nargs="+")
    parser.add_argument("--inpaint_dir", type=str, default="results/generation/inpaintings")
    parser.add_argument("--save_dir", type=str, default="results/generation/human_segs")
    parser.add_argument("--segmenter", type=str, default="unet",
                        choices=["unet", "pointrend"],
                        help="person-mask backend: the trainable U-Net or the "
                             "converted detectron2 PointRend (reference default)")
    parser.add_argument("--segmenter_params", type=str, help="params store (.npz/pickle)")
    parser.add_argument("--mode", type=str, default="coco",
                        choices=["coco", "lvis", "odise"],
                        help="category vocabulary (reference "
                             "segment_human.py:193; only 'coco' is "
                             "implemented there too — lvis/odise raise)")
    parser.add_argument("--threshold", type=float, default=0.8)
    parser.add_argument("--only_full_body_prompts", action="store_true", default=False)
    parser.add_argument("--batch_size", type=int, default=16)
    return parser


def default_segmenter_checkpoint() -> str:
    """The committed trained checkpoint (``cli/train_segmenter.py``)."""
    import coma_tpu

    return os.path.join(os.path.dirname(coma_tpu.__file__), "data", "person_segmenter.npz")


def load_segmenter(params_path=None):
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.segmentation import PersonSegmenter
    from coma_tpu.utils.checkpoint import load_params

    model = PersonSegmenter()
    if not params_path and os.path.exists(default_segmenter_checkpoint()):
        params_path = default_segmenter_checkpoint()
    if params_path and os.path.exists(params_path):
        if params_path.endswith(".npz"):
            params = load_params(params_path)
            # checkpoints are stored bf16; compute in f32
            params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        else:
            with open(params_path, "rb") as fh:
                params = pickle.load(fh)
    else:
        # jitted: eager init pays per-op latency on the tunneled device
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        if params_path:
            print(f"[segment_human] WARNING: {params_path} missing; random init")
    return model, params


def main(argv=None) -> None:
    from PIL import Image
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.segmentation import connected_instances

    args = build_parser().parse_args(argv)
    from coma_tpu.config.segmentation import run_mode_supported

    if not run_mode_supported(args.mode):
        raise NotImplementedError(
            f"segmentation mode {args.mode!r} (reference parity: "
            "segment_human.py:177-181 raises for lvis/odise too)")
    seed_everything(args.seed)
    enable_compilation_cache()
    supercats, cats = lower_all(args.supercategories), lower_all(args.categories)
    prompts = lower_all(args.prompts)

    paths = sorted(_glob.glob(f"{args.inpaint_dir}/*/*/*/*/*/*/*.png"))
    work = []
    for p in paths:
        sc_str, cat_str, asset, view, mask_id, prompt, fname = p.split("/")[-7:]
        if supercats and sc_str.replace(":", "/").lower() not in supercats:
            continue
        if cats and cat_str.replace(":", "/").lower() not in cats:
            continue
        if prompts and prompt.split(",")[0].lower() not in prompts:
            continue
        if args.only_full_body_prompts and "full body" not in prompt:
            continue
        out = f"{args.save_dir}/{sc_str}/{cat_str}/{asset}/{view}/{mask_id}/{prompt}/{fname.replace('.png', '.pickle')}"
        if args.skip_done and os.path.exists(out):
            continue
        work.append((p, out))
    work = shard_worklist(work, args.parallel_idx, args.parallel_num)

    if args.segmenter == "pointrend":
        from coma_tpu.models.pointrend import PointRendPersonSegmenter
        from coma_tpu.utils.checkpoint import load_params

        if not (args.segmenter_params and os.path.exists(args.segmenter_params)):
            raise SystemExit(
                "--segmenter pointrend needs --segmenter_params "
                "(convert_weights --kind pointrend on the published "
                "model_final_edd263.pkl)"
            )
        predictor = PointRendPersonSegmenter(load_params(args.segmenter_params))
        apply = None
    else:
        from coma_tpu.models.segmentation import person_probs_canonical

        model, params = load_segmenter(args.segmenter_params)
        # scale-canonical: predict at the checkpoint's training resolution
        apply = jax.jit(
            lambda prm, imgs: person_probs_canonical(model, prm, imgs)
        )
        predictor = None

    for i in range(0, len(work), args.batch_size):
        chunk = work[i : i + args.batch_size]
        imgs = np.stack(
            [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0 for p, _ in chunk]
        )
        if predictor is not None:
            per_image = [predictor(im) for im in imgs]
            masks = probs = None
        else:
            probs = np.asarray(apply(params, jnp.asarray(imgs)))
            masks = (probs >= 0.5).astype(np.float32)
            per_image = None
        for j, (src, out) in enumerate(chunk):
            if per_image is not None:
                instances = per_image[j]
            else:
                mask, prob = masks[j], probs[j]
                instances = connected_instances(mask)
                for inst in instances:
                    inst["score"] = float(prob[inst["mask"]].mean())
                    inst["pred_class"] = 0  # person
            hw = imgs[j].shape[:2]
            payload = dict(
                pred_masks=np.stack([x["mask"] for x in instances]) if instances else np.zeros((0,) + hw, bool),
                pred_boxes=np.stack([x["bbox"] for x in instances]) if instances else np.zeros((0, 4), np.float32),
                scores=np.asarray([x["score"] for x in instances], np.float32),
                pred_classes=np.zeros(len(instances), np.int64),
                image_size=hw,
            )
            keep = payload["scores"] >= args.threshold
            payload = dict(
                pred_masks=payload["pred_masks"][keep],
                pred_boxes=payload["pred_boxes"][keep],
                scores=payload["scores"][keep],
                pred_classes=payload["pred_classes"][keep],
                image_size=payload["image_size"],
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "wb") as fh:
                pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"[segment_human] wrote {len(work)} instance pickles")


if __name__ == "__main__":
    main()
