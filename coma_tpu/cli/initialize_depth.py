"""CLI: depth initialization by occluded-silhouette IoU search
(reference: ``src/generation/initialize_depth.py``; no Blender — all
candidates rasterize in one jit on device).
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
from coma_tpu.core.sentinels import TOO_SMALL_HUMAN
from coma_tpu.geometry.mesh import load_obj
from coma_tpu.pipelines.asset_world import asset_to_world


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--prompts", type=str, nargs="+")
    parser.add_argument("--camera_dir", type=str, default="results/generation/cameras")
    parser.add_argument("--human_pred_dir", type=str, default="results/generation/human_preds")
    parser.add_argument("--human_seg_dir", type=str, default="results/generation/human_segs")
    parser.add_argument("--save_dir", type=str, default="results/generation/human_before_opt")
    parser.add_argument("--interval_ratio", type=float, default=0.3)
    parser.add_argument("--retrieval_range", type=int, default=3)
    parser.add_argument("--asset_obj_pth", type=str, help="override asset .obj path")
    parser.add_argument("--disable_lowres_switch_for_behave", action="store_true")
    parser.add_argument("--no_initialize", action="store_true")
    parser.add_argument("--filter_out", action="store_true",
                        help="pre-filter depth candidates to local minima of "
                             "the human-asset triangle-collision curve "
                             "(initialize_depth.py:96-125; dead code upstream "
                             "-- with the upstream defaults kernel_size=9 > "
                             "2*retrieval_range, the window keeps NOTHING; "
                             "use e.g. --kernel_size 5)")
    parser.add_argument("--max_collisions", type=int, default=1000,
                        help="collision-count cap per candidate (parity with "
                             "the BVH output-buffer size, "
                             "initialize_depth.py:388)")
    parser.add_argument("--kernel_size", type=int, default=9,
                        help="local-minimum window of the collision filter "
                             "(initialize_depth.py:387)")
    return parser


def main(argv=None) -> None:
    import jax.numpy as jnp

    from coma_tpu.lifting.cameras import OrthoCamera, pixels_to_world
    from coma_tpu.lifting.depth_init import (
        compute_directional_size,
        compute_nearest_point,
        initialize_depth_for_sample,
    )

    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    enable_compilation_cache()
    supercats, cats = lower_all(args.supercategories), lower_all(args.categories)
    prompts = lower_all(args.prompts)

    pred_pths = sorted(_glob.glob(f"{args.human_pred_dir}/*/*/*/*/*/*/*.pickle"))
    work = []
    for p in pred_pths:
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
    for pred_pth, out in work:
        sc_str, cat_str, asset_id, view_id, mask_id, prompt, fname = pred_pth.split("/")[-7:]
        supercategory, category = unflatten(sc_str), unflatten(cat_str)
        with open(pred_pth, "rb") as fh:
            pred = pickle.load(fh)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        if isinstance(pred, str):  # propagate sentinel
            with open(out, "wb") as fh:
                pickle.dump(pred, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue

        camera_pth = f"{args.camera_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}.pickle"
        with open(camera_pth, "rb") as fh:
            cam_data = pickle.load(fh)
        camera = OrthoCamera(
            R=jnp.asarray(cam_data["R"], jnp.float32),
            t=jnp.asarray(cam_data["t"], jnp.float32).reshape(3),
            scale=float(cam_data["scale"]),
            resolution=tuple(cam_data["resolution"]),
        )

        # asset world geometry (per view: perturbation comes from the pickle)
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
        asset_verts, asset_faces, _ = asset_cache[key]

        # pixel -> world
        human_verts = pixels_to_world(
            jnp.asarray(pred["verts"], jnp.float32), camera
        )
        pelvis = pixels_to_world(jnp.asarray(pred["pelvis"], jnp.float32)[None], camera)[0]

        if args.no_initialize:
            selected = dict(idx=None, verts=np.asarray(human_verts),
                            faces=pred["faces"], IoU=None,
                            human_segmentation=None, interval_from_center=None,
                            displacement=None)
        else:
            # reference uses R[:, 2] as the search direction (:306)
            direction = jnp.asarray(cam_data["R"], jnp.float32)[:, 2]
            interval = compute_directional_size(human_verts, direction) * args.interval_ratio
            _, dist = compute_nearest_point(
                jnp.asarray(asset_verts, jnp.float32), pelvis, direction
            )
            offsets = jnp.arange(-args.retrieval_range, args.retrieval_range + 1,
                                 dtype=jnp.float32)
            displacements = dist + offsets * interval

            if args.filter_out:
                # local-minimum collision pre-filter (extract_candidates:
                # 96-125); the curve is one jitted blocked sweep instead of
                # 2*retrieval_range+1 sequential CUDA BVH builds
                from coma_tpu.ops.collision import (
                    collision_curve, filter_candidate_indices)
                curve = np.minimum(
                    np.asarray(collision_curve(
                        human_verts, jnp.asarray(pred["faces"], jnp.int32),
                        jnp.asarray(asset_verts, jnp.float32),
                        jnp.asarray(asset_faces, jnp.int32),
                        displacements, direction)),
                    args.max_collisions)
                kept = filter_candidate_indices(curve, args.kernel_size)
                if kept.size == 0:
                    # reference: empty candidate list -> select_human None ->
                    # the TOO_SMALL_HUMAN sentinel (initialize_depth.py:362-365)
                    with open(out, "wb") as fh:
                        pickle.dump(TOO_SMALL_HUMAN, fh,
                                    protocol=pickle.HIGHEST_PROTOCOL)
                    n_sent += 1
                    continue
                displacements = displacements[jnp.asarray(kept)]

            # GT human mask from the segmentation stage
            seg_pth = f"{args.human_seg_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}/{mask_id}/{prompt}/{fname}"
            gt_mask = None
            if os.path.exists(seg_pth):
                with open(seg_pth, "rb") as fh:
                    seg = pickle.load(fh)
                if not isinstance(seg, str) and len(seg.get("pred_masks", [])) > 0:
                    gt_mask = np.any(seg["pred_masks"], axis=0)
            if gt_mask is None:
                with open(out, "wb") as fh:
                    pickle.dump(TOO_SMALL_HUMAN, fh, protocol=pickle.HIGHEST_PROTOCOL)
                n_sent += 1
                continue

            result = initialize_depth_for_sample(
                camera, human_verts, jnp.asarray(pred["faces"]),
                jnp.asarray(gt_mask), displacements,
                occluder_verts=jnp.asarray(asset_verts, jnp.float32),
                occluder_faces=jnp.asarray(asset_faces),
                direction=direction,
            )
            direction_np = np.asarray(direction)
            d = float(result["best_displacement"])
            selected = dict(
                idx=int(result["best_index"]),
                verts=np.asarray(result["best_verts"]),
                faces=pred["faces"],
                IoU=float(result["best_iou"]),
                human_segmentation=None,
                interval_from_center=abs(int(result["best_index"]) - len(np.asarray(displacements))),
                displacement=(d * direction_np).reshape(1, 3),
            )
        with open(out, "wb") as fh:
            pickle.dump(selected, fh, protocol=pickle.HIGHEST_PROTOCOL)
        n_ok += 1
    print(f"[initialize_depth] {n_ok} initialized, {n_sent} sentinels")


if __name__ == "__main__":
    main()
