"""CLI: multiview RANSAC + depth optimization
(reference: ``src/generation/optimize_depth.py``).

Per sample: mine RANSAC inlier views via vmapped DLT triangulation, then
optimize the displacement scalar (Adam, 200 steps) against the multiview
joint loss + the collision term (neural COAP when converted weights are
present, weight-free capsules otherwise). Samples batch into one vmapped
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
    parser.add_argument("--no_collision", action="store_true",
                        help="alias for --collision_backend none")
    parser.add_argument("--max_inliers", type=int, default=16, help="padding cap")
    # Collision backend (reference default: neural COAP, optimize_depth.py:752-762).
    parser.add_argument("--collision_backend",
                        choices=["auto", "coap", "capsule", "none"], default="auto",
                        help="auto = neural COAP when --coap_ckpt and "
                             "--smplx_model_path resolve, else capsule fallback")
    parser.add_argument("--coap_ckpt", type=str, default="pre-trained/coap/coap.npz",
                        help="converted COAP params (cli.convert_weights --kind coap)")
    parser.add_argument("--smplx_model_path", type=str, default="",
                        help="SMPLX_NEUTRAL.npz (needed to pose COAP's bone frames)")
    parser.add_argument("--asset_obj_pth", type=str,
                        help="override asset .obj path (collision scene points)")
    parser.add_argument("--max_scene_points", type=int, default=2048)
    parser.add_argument("--scene_bbox_margin", type=float, default=0.5,
                        help="prefilter margin (m) around the human bbox "
                             "(reference prefilters by the exact bbox, "
                             "optimize_depth.py:105-112; the margin keeps "
                             "points reachable while the depth moves)")
    return parser


def _load_scene_verts(args, sc_str, cat_str, asset_id, cam_data):
    """Asset vertices in this view's world frame (collision scene points),
    or None when the asset .obj cannot be resolved (collision then no-ops
    for those samples rather than failing the stage)."""
    from coma_tpu.config.assets import CATEGORY2DATASET_TYPE, resolve_asset_obj_path
    from coma_tpu.geometry.mesh import load_obj
    from coma_tpu.pipelines.asset_world import asset_to_world

    supercategory, category = unflatten(sc_str), unflatten(cat_str)
    dataset_type = CATEGORY2DATASET_TYPE.get((supercategory, category))
    try:
        obj_pth = args.asset_obj_pth or resolve_asset_obj_path(
            dataset_type, supercategory, category, asset_id
        )
        mesh = load_obj(obj_pth)
    except (KeyError, TypeError, FileNotFoundError, OSError) as exc:
        print(f"[optimize_depth] WARN: no asset mesh for "
              f"{supercategory}/{category}/{asset_id} ({exc}); "
              f"collision scene empty for its samples")
        return None
    verts, _ = asset_to_world(mesh.vertices, cam_data, dataset_type or "")
    return np.asarray(verts, np.float32)


def _coap_frames_for_sample(smplx_model, smplx_data, verts_world):
    """Pose the SMPL-X model from the regressed params and rigid-align
    (Kabsch) the LBS vertices onto the lifted world vertices, folding the
    alignment into the bone transforms so COAP's frames live in world space.
    Returns dict(rest_joints (J,3), rel_transforms (J,4,4)) or None on a
    vertex-count mismatch (e.g. test-sized synthetic SMPL-X models)."""
    import jax.numpy as jnp

    from coma_tpu.geometry.transforms import rigid_align_np
    from coma_tpu.models.smplx import smplx_forward

    sd = {k: jnp.asarray(v, jnp.float32) for k, v in smplx_data.items()
          if k != "transl"}
    verts_lbs, _, rel_tf, rest_j = smplx_forward(
        smplx_model, return_rel_transforms=True, **sd
    )
    verts_lbs = np.asarray(verts_lbs[0])
    if verts_lbs.shape[0] != verts_world.shape[0]:
        return None
    R, t = rigid_align_np(verts_lbs, verts_world)
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] = R
    A[:3, 3] = t
    return dict(
        rest_joints=np.asarray(rest_j[0], np.float32),
        rel_transforms=(A[None] @ np.asarray(rel_tf[0], np.float32)),
    )


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

    # --- collision backend (reference default: neural COAP w=0.4) ---------
    backend = "none" if args.no_collision else args.collision_backend
    coap = None  # (occ_model, variables, partition, smplx_model) when neural
    if backend in ("auto", "coap"):
        have_ckpt = bool(args.coap_ckpt) and os.path.exists(args.coap_ckpt)
        have_smplx = bool(args.smplx_model_path) and os.path.exists(args.smplx_model_path)
        if have_ckpt and have_smplx:
            backend = "coap"
        elif backend == "coap":
            raise SystemExit(
                "[optimize_depth] --collision_backend coap needs both "
                f"--coap_ckpt (got {args.coap_ckpt!r}) and --smplx_model_path "
                f"(got {args.smplx_model_path!r}) to exist"
            )
        else:
            backend = "capsule"
            print(
                "[optimize_depth] neural COAP unavailable "
                f"(ckpt={'ok' if have_ckpt else 'missing'}, "
                f"smplx={'ok' if have_smplx else 'missing'}); using the "
                "weight-free capsule backend. Convert the published COAP "
                "checkpoint (cli.convert_weights --kind coap) and pass "
                "--coap_ckpt/--smplx_model_path for the reference loss stack."
            )
    if backend == "coap":
        from coma_tpu.models.coap import COAPConfig, COAPOccupancy
        from coma_tpu.models.coap_partition import build_partition
        from coma_tpu.models.smplx import SMPLXModel
        from coma_tpu.utils.checkpoint import load_params

        smplx_model = SMPLXModel.from_npz(args.smplx_model_path)
        partition = build_partition(
            np.asarray(smplx_model.lbs_weights), tuple(np.asarray(smplx_model.parents))
        )
        variables = load_params(args.coap_ckpt)
        coap = (COAPOccupancy(COAPConfig(num_parts=partition.num_parts)),
                variables, partition, smplx_model)
    print(f"[optimize_depth] collision backend: {backend}")

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

        # collision scene points: asset vertices in this view's world frame,
        # prefiltered by the human bbox (reference: sample_scene_points,
        # optimize_depth.py:105-124 — asset verts, bbox gate)
        scene_pts = scene_valid = None
        if backend != "none":
            from coma_tpu.models.coap import pad_scene_points

            key = ("scene", sc_str, cat_str, asset_id, view_id)
            if key not in cam_cache:
                cam_cache[key] = _load_scene_verts(
                    args, sc_str, cat_str, asset_id, cam_data
                )
            scene = cam_cache[key]
            verts0 = np.asarray(initial["verts"], np.float32)
            if scene is not None and len(scene):
                lo = verts0.min(0) - args.scene_bbox_margin
                hi = verts0.max(0) + args.scene_bbox_margin
                scene = scene[np.all((scene >= lo) & (scene <= hi), axis=1)]
            scene_pts, scene_valid = pad_scene_points(
                scene if scene is not None else np.zeros((0, 3), np.float32),
                args.max_scene_points,
            )

        # neural-COAP bone frames: pose the SMPL-X model from the regressed
        # params, then rigid-align (Kabsch) the LBS verts onto the lifted
        # world verts and fold that alignment into the bone transforms
        coap_aux = None
        if backend == "coap":
            coap_aux = _coap_frames_for_sample(
                coap[3], pred["smplx_data"], np.asarray(initial["verts"], np.float32)
            )
            if coap_aux is None:
                print(f"[optimize_depth] WARN: vertex count mismatch vs the "
                      f"SMPL-X model for {init_pth}; collision off for this sample")
                scene_valid = np.zeros_like(scene_valid)
                J = coap[3].num_joints
                coap_aux = dict(
                    rest_joints=np.zeros((J, 3), np.float32),
                    rel_transforms=np.broadcast_to(
                        np.eye(4, dtype=np.float32), (J, 4, 4)
                    ).copy(),
                )

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
                scene_pts=scene_pts,
                scene_valid=scene_valid,
                coap_aux=coap_aux,
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

        collision_fn = collision_aux = None
        if backend != "none":
            scene_aux = dict(
                base_centroid=jnp.asarray(
                    np.stack(verts_w).mean(axis=1), jnp.float32
                ),
                scene_points=jnp.asarray(
                    np.stack([b["scene_pts"] for b in batch]), jnp.float32
                ),
                scene_valid=jnp.asarray(
                    np.stack([b["scene_valid"] for b in batch]), jnp.float32
                ),
            )
        if backend == "capsule":
            from coma_tpu.models.coap import make_capsule_collision_aux_fn

            collision_fn = make_capsule_collision_aux_fn()
            collision_aux = dict(
                joints=jnp.asarray(np.stack(joints_w), jnp.float32), **scene_aux
            )
        elif backend == "coap":
            from coma_tpu.models.coap import make_coap_collision_aux_fn

            collision_fn = make_coap_collision_aux_fn(coap[0], coap[1], coap[2])
            collision_aux = dict(
                rest_joints=jnp.asarray(
                    np.stack([b["coap_aux"]["rest_joints"] for b in batch]), jnp.float32
                ),
                rel_transforms=jnp.asarray(
                    np.stack([b["coap_aux"]["rel_transforms"] for b in batch]),
                    jnp.float32,
                ),
                translation=jnp.zeros((len(batch), 3), jnp.float32),
                **scene_aux,
            )

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
            collision_fn=collision_fn,
            collision_aux=collision_aux,
            num_epochs=args.num_epoch,
            lr=args.lr,
            w_multiview=args.w_multiview,
            w_collision=args.w_collision,
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
