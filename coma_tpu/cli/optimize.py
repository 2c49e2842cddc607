"""CLI: HOI reconstruction from a learned ComA (the application).

Reference parity: ``src/application/optimize.py`` — optimize a SMPL-X human
(VPoser latent + global orient/transl + hand poses) to SATISFY a learned
ComA: argmax relative-orientation targets from the probability grid,
contact pairs from proximity expectation > threshold, chamfer contact loss,
VPoser/angle priors, optional collision (``optimize_smpl:167-317``). The
2000 Adam steps run as ONE jitted ``lax.scan``.

Inputs: the extracted ComA pickle + the object downsample pickle (raw pcd
points/normals). SMPL-X / VPoser weights are the license-gated external
files; without them a synthetic body model / random decoder keeps the run
mechanical (geometry is meaningless but the machinery is exercised).
"""
from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coma_pth", required=True, help="extracted ComA pickle")
    parser.add_argument("--obj_downsample_pth", required=True,
                        help="object downsample pickle (raw pcd points+normals)")
    parser.add_argument("--save_pth", default="optimized.obj")
    parser.add_argument("--losses_json", type=str)
    parser.add_argument("--smplx_model_path", type=str, help="SMPLX_NEUTRAL.npz")
    parser.add_argument("--vposer_snapshot", type=str,
                        help="VPoser torch snapshot (converted on the fly)")
    parser.add_argument("--reference_object_vertex_index", type=int, default=0)
    parser.add_argument("--contact_threshold", type=float, default=0.3)
    parser.add_argument("--scale_factor", type=float, default=1.0)
    parser.add_argument("--num_iters", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--orientation_weight", type=float, default=1e12)
    parser.add_argument("--contact_weight", type=float, default=2.6e11)
    parser.add_argument("--collision_weight", type=float, default=1e9)
    parser.add_argument("--use_collision", action="store_true")
    return parser


def main(argv=None) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from coma_tpu.affordance.io import load_pickle
    from coma_tpu.cli._common import enable_compilation_cache, seed_everything
    from coma_tpu.geometry.mesh import save_obj
    from coma_tpu.models.smplx import SMPLXModel, random_model
    from coma_tpu.models.vposer import VPoserDecoder, load_torch_weights
    from coma_tpu.pipelines.application import optimize_smpl

    args = build_parser().parse_args(argv)
    seed_everything(42)
    enable_compilation_cache()

    for pth in (args.coma_pth, args.obj_downsample_pth):
        if not os.path.exists(pth):
            raise SystemExit(f"[optimize] input not found: {pth}")
    coma_dict = load_pickle(args.coma_pth)
    obj = load_pickle(args.obj_downsample_pth)
    obj_verts = np.asarray(obj["downsampled_pcd_points_raw"], np.float32)
    obj_normals = np.asarray(obj["downsampled_pcd_normal_raw"], np.float32)

    if args.smplx_model_path and os.path.exists(args.smplx_model_path):
        smplx_model = SMPLXModel.from_npz(args.smplx_model_path)
    else:
        H = int(np.asarray(coma_dict["prob_grid_canon_human_wrt_obj"]).shape[0])
        smplx_model = random_model(num_verts=H, num_betas=10, num_expr=10)
        print("[optimize] WARNING: SMPL-X weights missing; synthetic body model")

    dec = VPoserDecoder()
    if args.vposer_snapshot and os.path.exists(args.vposer_snapshot):
        import torch

        snap = torch.load(args.vposer_snapshot, map_location="cpu")
        snap = snap.get("state_dict", snap)
        vp_params = load_torch_weights(snap)
    else:
        vp_params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
        if args.vposer_snapshot:
            print("[optimize] WARNING: VPoser snapshot missing; random decoder")

    result = optimize_smpl(
        smplx_model=smplx_model,
        vposer_decoder_params=vp_params,
        coma_dict=coma_dict,
        obj_verts=obj_verts,
        obj_normals=obj_normals,
        reference_object_vertex_index=args.reference_object_vertex_index,
        contact_threshold=args.contact_threshold,
        scale_factor=args.scale_factor,
        num_iters=args.num_iters,
        lr=args.lr,
        orientation_weight=args.orientation_weight,
        contact_weight=args.contact_weight,
        collision_weight=args.collision_weight,
        use_collision=args.use_collision,
    )
    os.makedirs(os.path.dirname(args.save_pth) or ".", exist_ok=True)
    save_obj(args.save_pth, result.vertices, result.faces)
    losses = {k: float(v) for k, v in result.losses.items()}
    print(f"[optimize] saved {args.save_pth}; final losses {losses}")
    if args.losses_json:
        with open(args.losses_json, "w") as fh:
            json.dump(losses, fh, indent=1)


if __name__ == "__main__":
    main()
