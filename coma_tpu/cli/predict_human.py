"""CLI: regress 3D humans from segmented inpaintings
(reference: ``src/generation/predict_human.py``).

Per image: load the instance pickle, de-duplicate overlaps
(``utils/postprocess.process_segmentation``), reject 0 or >= 2 humans with
the reference's sentinel pickles ("NO HUMANS" / "MORE THAN 2 HUMANS",
``predict_human.py:206-213``), regress SMPL-X via the Hand4Whole port, and
save verts/faces/pelvis/smplx params/projected joints/convert_data
(``:221-242``).
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
from coma_tpu.core.sentinels import MORE_THAN_2_HUMANS, NO_HUMANS
from coma_tpu.pipelines.postprocess import bbox_xyxy_to_xywh, process_segmentation


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--prompts", type=str, nargs="+")
    parser.add_argument("--inpaint_dir", type=str, default="results/generation/inpaintings")
    parser.add_argument("--human_seg_dir", type=str, default="results/generation/human_segs")
    parser.add_argument("--save_dir", type=str, default="results/generation/human_preds")
    parser.add_argument("--regressor_params", type=str, help="Hand4Whole flax params pickle")
    parser.add_argument("--smplx_model_path", type=str, help="SMPLX_NEUTRAL.npz")
    return parser


def load_regressor(args):
    import jax
    import jax.numpy as jnp

    from coma_tpu.models.hand4whole import Hand4Whole
    from coma_tpu.models.smplx import SMPLXModel, random_model
    from coma_tpu.pipelines.mocap import Hand4WholeRegressor

    model = Hand4Whole()
    store = args.regressor_params
    if store and os.path.exists(store if store.endswith(".npz") else store + ".npz"):
        # native param store written by `coma_tpu.cli.convert_weights
        # --kind hand4whole` (preferred over ad-hoc pickles)
        from coma_tpu.utils.checkpoint import load_params

        params = load_params(store)
    elif store and os.path.exists(store):
        with open(store, "rb") as fh:
            params = pickle.load(fh)
    else:
        # jitted: eager init pays per-op latency on the tunneled device
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 384, 3)))
        if args.regressor_params:
            print("[predict_human] WARNING: regressor params missing; random init")
    if args.smplx_model_path and os.path.exists(args.smplx_model_path):
        smplx_model = SMPLXModel.from_npz(args.smplx_model_path)
    else:
        # SMPL-X vertex count: downstream downsample indices and the star
        # template assume the real topology's size, so the synthetic
        # fallback must match it or extraction would index out of bounds
        smplx_model = random_model(num_verts=10475, num_betas=10, num_expr=10)
        print("[predict_human] WARNING: SMPL-X weights missing; synthetic body model")
    return Hand4WholeRegressor(params, smplx_model)


def main(argv=None) -> None:
    from PIL import Image

    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    enable_compilation_cache()
    supercats, cats = lower_all(args.supercategories), lower_all(args.categories)
    prompts = lower_all(args.prompts)

    seg_paths = sorted(_glob.glob(f"{args.human_seg_dir}/*/*/*/*/*/*/*.pickle"))
    work = []
    for p in seg_paths:
        sc_str, cat_str, asset, view, mask_id, prompt, fname = p.split("/")[-7:]
        if supercats and sc_str.replace(":", "/").lower() not in supercats:
            continue
        if cats and cat_str.replace(":", "/").lower() not in cats:
            continue
        if prompts and prompt.split(",")[0].lower() not in prompts:
            continue
        # predictions are grouped by MAIN prompt (reference path schema)
        mainprompt = prompt.split(",")[0]
        out = f"{args.save_dir}/{sc_str}/{cat_str}/{asset}/{view}/{mask_id}/{mainprompt}/{fname}"
        if args.skip_done and os.path.exists(out):
            continue
        img = f"{args.inpaint_dir}/{sc_str}/{cat_str}/{asset}/{view}/{mask_id}/{prompt}/{fname.replace('.pickle', '.png')}"
        work.append((p, img, out))
    work = shard_worklist(work, args.parallel_idx, args.parallel_num)

    regressor = load_regressor(args)
    n_ok = n_sentinel = 0
    for seg_pth, img_pth, out in work:
        with open(seg_pth, "rb") as fh:
            seg = pickle.load(fh)
        keep = process_segmentation(seg["pred_classes"], seg["pred_boxes"], seg["scores"])
        person_idx = [i for i in keep if seg["pred_classes"][i] == 0]

        os.makedirs(os.path.dirname(out), exist_ok=True)
        if len(person_idx) == 0:
            payload = NO_HUMANS
            n_sentinel += 1
        elif len(person_idx) >= 2:
            payload = MORE_THAN_2_HUMANS
            n_sentinel += 1
        else:
            image = np.asarray(Image.open(img_pth).convert("RGB"))
            bbox_xywh = bbox_xyxy_to_xywh(seg["pred_boxes"][person_idx[0]])
            outs = regressor.regress(image, [bbox_xywh])
            if not outs:
                payload = NO_HUMANS
                n_sentinel += 1
            else:
                m = outs[0]
                payload = dict(
                    verts=m.pred_vertices_img,
                    faces=m.faces,
                    pelvis=m.pelvis_xyz,
                    smplx_data=m.smplx_data,
                    joints_proj=m.joints_proj,
                    joints_img=m.joints_img,  # 3-D pixel joints (extension:
                    # lets optimize_depth lift joints to world exactly)
                    convert_data=m.convert_data,
                )
                n_ok += 1
        with open(out, "wb") as fh:
            pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"[predict_human] {n_ok} humans regressed, {n_sentinel} sentinels")


if __name__ == "__main__":
    main()
