"""CLI: finalize 3D HOI samples with quality metrics
(reference: ``src/generation/compute_metrics.py``).

Per optimized human: intersection-volume ratio (voxel ray-parity estimator
replacing the per-sample Blender boolean shell-out), silhouette IoU of the
re-rendered human (with the asset as occluder) vs the segmentation GT, and
the back-transform into the asset's canonical frame. Writes the final
``human_sample`` pickles (NOTE: the on-disk key 'interscetion_ratio' [sic]
is kept for artifact compatibility, ``compute_metrics.py:237-247``).
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
from coma_tpu.config.assets import CATEGORY2DATASET_TYPE, resolve_asset_obj_path
from coma_tpu.core.paths import unflatten
from coma_tpu.geometry.mesh import load_obj
from coma_tpu.pipelines.asset_world import asset_to_world, human_to_canonical


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--prompts", type=str, nargs="+")
    parser.add_argument("--human_after_opt_dir", type=str, default="results/generation/human_after_opt")
    parser.add_argument("--human_seg_dir", type=str, default="results/generation/human_segs")
    parser.add_argument("--camera_dir", type=str, default="results/generation/cameras")
    parser.add_argument("--save_dir", type=str, default="results/generation/human_sample")
    parser.add_argument("--asset_obj_pth", type=str)
    parser.add_argument("--voxel_resolution", type=int, default=64)
    parser.add_argument("--disable_lowres_switch_for_behave", action="store_true")
    return parser


def main(argv=None) -> None:
    import jax.numpy as jnp

    from coma_tpu.lifting.cameras import OrthoCamera
    from coma_tpu.lifting.metrics import (
        intersection_volume_ratio_adaptive,
        silhouette_iou,
    )
    from coma_tpu.lifting.rasterizer import render_silhouette

    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    enable_compilation_cache()
    supercats, cats = lower_all(args.supercategories), lower_all(args.categories)
    prompts = lower_all(args.prompts)

    human_pths = sorted(_glob.glob(f"{args.human_after_opt_dir}/*/*/*/*/*/*/*.pickle"))
    work = []
    for p in human_pths:
        sc_str, cat_str, asset, view, mask_id, prompt, fname = p.split("/")[-7:]
        if supercats and unflatten(sc_str).lower() not in supercats:
            continue
        if cats and unflatten(cat_str).lower() not in cats:
            continue
        if prompts and prompt.split(",")[0].lower() not in prompts:
            continue
        out = f"{args.save_dir}/{sc_str}/{cat_str}/{asset}/{view}/{mask_id}/{prompt}/{fname}"
        if args.skip_done and os.path.exists(out):
            continue
        work.append((p, out))
    work = shard_worklist(work, args.parallel_idx, args.parallel_num)

    asset_cache = {}
    n_ok = n_sent = 0
    for human_pth, out in work:
        sc_str, cat_str, asset_id, view_id, mask_id, prompt, fname = human_pth.split("/")[-7:]
        supercategory, category = unflatten(sc_str), unflatten(cat_str)
        os.makedirs(os.path.dirname(out), exist_ok=True)

        with open(human_pth, "rb") as fh:
            human = pickle.load(fh)
        if isinstance(human, str):  # sentinel propagation (:222-224)
            with open(out, "wb") as fh:
                pickle.dump(human, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue

        with open(f"{args.camera_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}.pickle", "rb") as fh:
            cam_data = pickle.load(fh)
        camera = OrthoCamera(
            R=jnp.asarray(cam_data["R"], jnp.float32),
            t=jnp.asarray(cam_data["t"], jnp.float32).reshape(3),
            scale=float(cam_data["scale"]),
            resolution=tuple(cam_data["resolution"]),
        )
        key = (sc_str, cat_str, asset_id, view_id)
        if key not in asset_cache:
            obj_pth = args.asset_obj_pth or resolve_asset_obj_path(
                CATEGORY2DATASET_TYPE[(supercategory, category)],
                supercategory, category, asset_id,
                disable_lowres_switch_for_behave=args.disable_lowres_switch_for_behave,
            )
            mesh = load_obj(obj_pth)
            verts, z_min = asset_to_world(
                mesh.vertices, cam_data,
                CATEGORY2DATASET_TYPE[(supercategory, category)],
            )
            asset_cache[key] = (verts, mesh.faces, z_min)
        asset_verts, asset_faces, z_min = asset_cache[key]

        hv = jnp.asarray(human["verts"], jnp.float32)
        hf = jnp.asarray(np.asarray(human["faces"], np.int64))

        # metric 1: intersection-volume ratio (gray-zone cases near the 0.05
        # post-filter threshold auto-refine at 2x resolution — see
        # docs/TOLERANCE.md for the measured error bounds)
        ratio = intersection_volume_ratio_adaptive(
            hv, hf, jnp.asarray(asset_verts, jnp.float32), jnp.asarray(asset_faces),
            resolution=args.voxel_resolution,
            fine_resolution=2 * args.voxel_resolution,
        )

        # metric 2: silhouette IoU vs the segmentation GT (with asset occlusion)
        seg_pth = (
            f"{args.human_seg_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}/"
            f"{mask_id}/{prompt}/{fname}"
        )
        iou = 0.0
        if os.path.exists(seg_pth):
            with open(seg_pth, "rb") as fh:
                seg = pickle.load(fh)
            if not isinstance(seg, str) and len(seg.get("pred_masks", [])) > 0:
                gt = np.any(seg["pred_masks"], axis=0)
                rendered = render_silhouette(
                    camera, hv, hf,
                    occluder_verts=jnp.asarray(asset_verts, jnp.float32),
                    occluder_faces=jnp.asarray(asset_faces),
                )
                iou = float(silhouette_iou(rendered, jnp.asarray(gt)))

        # canonical-frame back-transform (:240-241)
        verts_canonical = human_to_canonical(np.asarray(human["verts"]), cam_data, z_min)

        payload = dict(human)
        payload.update(
            verts=verts_canonical,
            z_min=z_min,
            IoU=iou,
            interscetion_ratio=ratio,  # [sic] reference on-disk key
        )
        with open(out, "wb") as fh:
            pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)
        n_ok += 1
    print(f"[compute_metrics] {n_ok} samples finalized, {n_sent} sentinels")


if __name__ == "__main__":
    main()
