"""CLI: SMPL-X star-pose template + downsample pickles
(reference: ``src/coma/downsample_human.py``).

The star-pose template (arms lowered ±30°) is built from the SMPL-X model
via the JAX LBS when ``--smplx_model_path`` points at the SMPL-X npz; if the
template obj/pickle already exists (e.g. shipped from the reference), pass
``--smplx_star_pth`` instead — the weights themselves are license-gated and
not redistributable.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from coma_tpu.cli._common import seed_everything
from coma_tpu.config.metadata import DEFAULT_SEED
from coma_tpu.geometry.mesh import load_obj
from coma_tpu.pipelines.downsample import (
    downsample_human_template,
    save_human_downsample,
    save_star_template,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--smplx_model_path", type=str, help="SMPLX_NEUTRAL.npz")
    parser.add_argument("--smplx_star_pth", type=str, help="existing smplx_star.obj")
    parser.add_argument("--constants_mesh_dir", type=str, default="./constants/mesh")
    parser.add_argument("--simplify_method", choices=["poisson_disk", "uniform"], default="poisson_disk")
    parser.add_argument(
        "--num_human_downsample_points_list",
        type=int,
        nargs="+",
        default=[1000, 1500, 2000, 2048, 20000],
    )
    parser.add_argument("--skip_done", action="store_true")
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    seed_everything(args.seed)

    if args.smplx_model_path:
        from coma_tpu.models.smplx import SMPLXModel, star_pose_vertices

        model = SMPLXModel.from_npz(args.smplx_model_path)
        vertices = np.asarray(star_pose_vertices(model))
        faces = np.asarray(model.faces)
    elif args.smplx_star_pth:
        mesh = load_obj(args.smplx_star_pth)
        vertices, faces = mesh.vertices, mesh.faces
    else:
        raise SystemExit("pass --smplx_model_path or --smplx_star_pth")

    save_star_template(vertices, faces, args.constants_mesh_dir)

    for num_points in args.num_human_downsample_points_list:
        tag = "FULL" if num_points >= len(vertices) else str(num_points)
        save_pth = f"{args.constants_mesh_dir}/smplx_star_downsampled_{tag}.pickle"
        if args.skip_done and os.path.exists(save_pth):
            continue
        metadata = downsample_human_template(
            vertices, faces, num_points, simplify_method=args.simplify_method, seed=args.seed
        )
        path = save_human_downsample(metadata, num_points, args.constants_mesh_dir)
        print(f"[downsample_human] N={metadata['N']} N_raw={metadata['N_raw']} -> {path}")


if __name__ == "__main__":
    main()
