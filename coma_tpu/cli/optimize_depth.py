"""CLI: multiview RANSAC + depth optimization
(reference: ``src/generation/optimize_depth.py``).

Per sample: mine RANSAC inlier views via vmapped DLT triangulation, then
optimize the displacement scalar (Adam, 200 steps) against the multiview
joint loss (+ optional capsule collision). Samples batch into one vmapped
optimization; sentinels ("NOT ALLOWED VIEWPOINT PROMPTS", "TOO LITTLE
INLIERS") propagate like the reference.
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
from coma_tpu.config.prompts import ALLOWED_VIEWPOINT_AUGMENTATIONS
from coma_tpu.core.paths import unflatten
from coma_tpu.core.sentinels import NOT_ALLOWED_VIEWPOINT, TOO_LITTLE_INLIERS
from coma_tpu.models.keypoints import smpl_to_openpose


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--prompts", type=str, nargs="+")
    parser.add_argument("--camera_dir", type=str, default="results/generation/cameras")
    parser.add_argument("--human_preds_dir", type=str, default="results/generation/human_preds")
    parser.add_argument("--human_initial_dir", type=str, default="results/generation/human_before_opt")
    parser.add_argument("--save_dir", type=str, default="results/generation/human_after_opt")
    parser.add_argument("--maximum_candidates", type=int, default=400)
    parser.add_argument("--ransac_threshold", type=float, default=200.0)
    parser.add_argument("--triangulation_threshold", type=float, default=100.0)
    parser.add_argument("--num_epoch", type=int, default=200)
    parser.add_argument("--minimum_inliers", type=int, default=1)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--w_collision", type=float, default=0.4)
    parser.add_argument("--w_multiview", type=float, default=1e-3)
    parser.add_argument("--no_collision", action="store_true")
    parser.add_argument("--max_inliers", type=int, default=16, help="padding cap")
    return parser


def load_camera(camera_dir, sc_str, cat_str, asset_id, view_id, cache):
    key = view_id
    if key not in cache:
        with open(f"{camera_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}.pickle", "rb") as fh:
            cache[key] = pickle.load(fh)
    return cache[key]


def main(argv=None) -> None:
    import jax.numpy as jnp

    from coma_tpu.lifting.cameras import OrthoCamera, pixels_to_world
    from coma_tpu.lifting.depth_optimize import optimize_depth_batch, pad_inliers
    from coma_tpu.lifting.triangulation import mine_ransac_inliers

    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    enable_compilation_cache()
    supercats, cats = lower_all(args.supercategories), lower_all(args.categories)
    prompts = lower_all(args.prompts)
    tri_idx = smpl_to_openpose(use_hands=True)   # 67 joints for triangulation
    body_idx = smpl_to_openpose(use_hands=False)  # 25 joints for the loss

    init_pths = sorted(_glob.glob(f"{args.human_initial_dir}/*/*/*/*/*/*/*.pickle"))
    work = []
    for p in init_pths:
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

    cam_cache = {}
    batch = []   # samples to optimize together
    n_sent = 0
    for init_pth, out in work:
        sc_str, cat_str, asset_id, view_id, mask_id, prompt, fname = init_pth.split("/")[-7:]
        os.makedirs(os.path.dirname(out), exist_ok=True)

        # viewpoint-prompt gate (reference: optimize_depth.py:529-535)
        base = prompt.split(",")[0]
        suffix = prompt.replace(base, "")
        viewprompt = "original" if suffix == "" else suffix.strip().lower()
        allowed = {v.strip().lower() if v != "original" else "original"
                   for v in ALLOWED_VIEWPOINT_AUGMENTATIONS}
        if viewprompt not in allowed:
            with open(out, "wb") as fh:
                pickle.dump(NOT_ALLOWED_VIEWPOINT, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue

        with open(init_pth, "rb") as fh:
            initial = pickle.load(fh)
        if isinstance(initial, str):
            with open(out, "wb") as fh:
                pickle.dump(initial, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue

        mainprompt = base
        pred_pth = f"{args.human_preds_dir}/{sc_str}/{cat_str}/{asset_id}/{view_id}/{mask_id}/{mainprompt}/{fname}"
        with open(pred_pth, "rb") as fh:
            pred = pickle.load(fh)
        if isinstance(pred, str):
            with open(out, "wb") as fh:
                pickle.dump(pred, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue

        cam_data = load_camera(args.camera_dir, sc_str, cat_str, asset_id, view_id, cam_cache)
        ref_cam = OrthoCamera(
            R=jnp.asarray(cam_data["R"], jnp.float32),
            t=jnp.asarray(cam_data["t"], jnp.float32).reshape(3),
            scale=float(cam_data["scale"]),
            resolution=tuple(cam_data["resolution"]),
        )

        # other-view predictions (same asset, different views, allowed prompts)
        cand_cams, cand_joints = [], []
        other = sorted(
            _glob.glob(f"{args.human_preds_dir}/{sc_str}/{cat_str}/{asset_id}/*/*/{mainprompt}/*.pickle")
        )
        for o in other:
            o_view = o.split("/")[-4]
            if o_view == view_id:
                continue
            with open(o, "rb") as fh:
                o_pred = pickle.load(fh)
            if isinstance(o_pred, str):
                continue
            o_cam = load_camera(args.camera_dir, sc_str, cat_str, asset_id, o_view, cam_cache)
            cand_cams.append(
                OrthoCamera(
                    R=jnp.asarray(o_cam["R"], jnp.float32),
                    t=jnp.asarray(o_cam["t"], jnp.float32).reshape(3),
                    scale=float(o_cam["scale"]),
                    resolution=tuple(o_cam["resolution"]),
                )
            )
            cand_joints.append(np.asarray(o_pred["joints_proj"])[tri_idx])

        result = None
        if cand_cams:
            result = mine_ransac_inliers(
                ref_cam,
                jnp.asarray(np.asarray(pred["joints_proj"])[tri_idx], jnp.float32),
                cand_cams,
                jnp.asarray(np.stack(cand_joints), jnp.float32),
                maximum_candidates=args.maximum_candidates,
                ransac_threshold=args.ransac_threshold,
                triangulation_threshold=args.triangulation_threshold,
            )
        if result is None or result.num_inliers < args.minimum_inliers:
            with open(out, "wb") as fh:
                pickle.dump(TOO_LITTLE_INLIERS, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue

        # world joints at the initialized depth: lift the 3-D pixel-space
        # joints and apply the depth-init displacement (the reference runs
        # the SMPL-X forward per step, but only the rigid offset changes —
        # see depth_optimize.py's hoisting note)
        joints_img = np.asarray(pred.get("joints_img"))
        if joints_img is None or joints_img.ndim != 2:
            with open(out, "wb") as fh:
                pickle.dump(TOO_LITTLE_INLIERS, fh, protocol=pickle.HIGHEST_PROTOCOL)
            n_sent += 1
            continue
        joints_world = np.asarray(
            pixels_to_world(jnp.asarray(joints_img, jnp.float32), ref_cam)
        )
        init_disp = np.asarray(
            initial.get("displacement") if initial.get("displacement") is not None
            else np.zeros(3)
        ).reshape(-1)[:3]
        joints_world = joints_world + init_disp[None]

        # body-joint subset for the multiview loss (the inlier views' 2-D
        # joints are stored in triangulation (67-joint) order; map to the
        # 25-joint body order)
        body_in_tri = [int(np.where(tri_idx == b)[0][0]) for b in body_idx]
        batch.append(
            dict(
                out=out,
                faces=initial["faces"],
                verts=np.asarray(initial["verts"], np.float32),
                joints_world=joints_world[body_idx],
                cam_data=cam_data,
                inliers=[
                    dict(R=np.asarray(c.R), t=np.asarray(c.t),
                         joints_2d=cand_joints[i][body_in_tri])
                    for i, c in enumerate(cand_cams)
                    if i in set(result.inlier_indices.tolist())
                ],
                num_inliers=result.num_inliers,
            )
        )

    # --- batched optimization ---
    if batch:
        import jax.numpy as jnp

        scale = float(batch[0]["cam_data"]["scale"])
        resolution = tuple(batch[0]["cam_data"]["resolution"])
        V = max(len(b["verts"]) for b in batch)
        joints_w, verts_w, fronts, Rs, ts, j2ds, valids = [], [], [], [], [], [], []
        for b in batch:
            joints_w.append(b["joints_world"])
            vw = b["verts"]
            if len(vw) < V:
                vw = np.pad(vw, ((0, V - len(vw)), (0, 0)), mode="edge")
            verts_w.append(vw)
            fronts.append(np.asarray(b["cam_data"]["R"])[:, 2])
            R, t, j2d, valid = pad_inliers(b["inliers"], args.max_inliers, resolution)
            Rs.append(R); ts.append(t); j2ds.append(j2d); valids.append(valid)

        result = optimize_depth_batch(
            joints_world=jnp.asarray(np.stack(joints_w), jnp.float32),
            verts_world=jnp.asarray(np.stack(verts_w), jnp.float32),
            cam_front=jnp.asarray(np.stack(fronts), jnp.float32),
            inlier_R=jnp.asarray(np.stack(Rs)),
            inlier_t=jnp.asarray(np.stack(ts)),
            inlier_joints_2d=jnp.asarray(np.stack(j2ds)),
            inlier_valid=jnp.asarray(np.stack(valids)),
            scale=scale,
            resolution=resolution,
            num_epochs=args.num_epoch,
            lr=args.lr,
            w_multiview=args.w_multiview,
            w_collision=0.0 if args.no_collision else args.w_collision,
        )
        for i, b in enumerate(batch):
            verts = np.asarray(result.verts[i])[: len(b["verts"])]
            payload = dict(
                verts=verts,
                faces=np.asarray(b["faces"], np.uint32),
                num_inliers=int(b["num_inliers"]),
            )
            with open(b["out"], "wb") as fh:
                pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)

    print(f"[optimize_depth] optimized {len(batch)}, {n_sent} sentinels")


if __name__ == "__main__":
    main()
