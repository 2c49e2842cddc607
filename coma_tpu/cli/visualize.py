"""CLI: visualize affordance products
(reference: ``src/visualization/{visualize_human,visualize_object,
visualize_occupancy}.py`` — Blender/mayavi replaced by PLY + matplotlib).
"""
from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="what", required=True)

    h = sub.add_parser("human", help="per-vertex affordance on the SMPL-X star mesh")
    h.add_argument("--affordance_npy", required=True, help="human_contact.npy or orientational_tendency.npy")
    h.add_argument("--smplx_star_pth", required=True, help="smplx_star.obj or .pickle")
    h.add_argument("--human_downsample_pth", help="downsample pickle when the affordance is on a subset")
    h.add_argument("--out", default="output/human_affordance")

    o = sub.add_parser("object", help="preview the colored object-contact .ply")
    o.add_argument("--ply", required=True)
    o.add_argument("--out", default="output/object_contact.png")

    c = sub.add_parser("occupancy", help="occupancy probability field")
    c.add_argument("--occupancy_npy", required=True)
    c.add_argument("--out", default="output/occupancy.png")
    c.add_argument("--mode", choices=("volume", "slices"), default="volume",
                   help="'volume': ray-marched 3-D render (the reference's "
                        "mayavi.mlab.pipeline.volume, visualize_occupancy.py"
                        ":27-66); 'slices': slice grid + max-projections")
    c.add_argument("--asset_downsample_pth",
                   help="downsample pickle: composite the canonicalized "
                        "object mesh into the volume render (reference "
                        "visualize_occupancy.py:34-56)")
    c.add_argument("--resolution", type=int, default=512)
    c.add_argument("--elev", type=float, default=20.0)
    c.add_argument("--azim", type=float, default=35.0)
    return parser


def main(argv=None) -> None:
    from coma_tpu.visualization import (
        render_mesh_preview,
        save_vertex_colored_mesh,
        visualize_occupancy_slices,
    )

    args = build_parser().parse_args(argv)

    if args.what == "human":
        from coma_tpu.affordance.io import load_pickle
        from coma_tpu.geometry.mesh import load_obj

        if args.smplx_star_pth.endswith(".obj"):
            mesh = load_obj(args.smplx_star_pth)
            verts, faces = mesh.vertices, mesh.faces
        else:
            d = load_pickle(args.smplx_star_pth)
            verts, faces = np.asarray(d["vertices"]), np.asarray(d["faces"])
        weights_sub = np.load(args.affordance_npy)
        weights = np.zeros(len(verts))
        if args.human_downsample_pth:
            meta = load_pickle(args.human_downsample_pth)
            idx = np.asarray(meta["downsample_indices"], np.int64)
            weights[idx] = weights_sub
        else:
            assert len(weights_sub) == len(verts)
            weights = weights_sub
        save_vertex_colored_mesh(f"{args.out}.ply", verts, faces, weights)
        render_mesh_preview(f"{args.out}.png", verts, faces, weights)
        print(f"[visualize] wrote {args.out}.ply + {args.out}.png")

    elif args.what == "object":
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from coma_tpu.utils.ply import read_ply_pointcloud

        points, _, colors = read_ply_pointcloud(args.ply)
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        ax.scatter(points[:, 0], points[:, 1], points[:, 2], c=colors, s=8)
        ax.set_axis_off()
        fig.savefig(args.out, bbox_inches="tight")
        plt.close(fig)
        print(f"[visualize] wrote {args.out}")

    elif args.what == "occupancy":
        info = np.load(args.occupancy_npy, allow_pickle=True).item()
        if args.mode == "slices":
            visualize_occupancy_slices(args.out, info["prob_field"])
        else:
            from coma_tpu.visualization.volume import (
                save_occupancy_volume_render,
            )

            mesh = None
            meta = info.get("spatial_grid_metadata") or {}
            if args.asset_downsample_pth:
                from coma_tpu.affordance.io import load_pickle

                d = load_pickle(args.asset_downsample_pth)
                verts = np.asarray(d["obj_vertices_original"], np.float32)
                faces = np.asarray(d["obj_faces_original"], np.int64)
                # canonicalize on the occupancy anchor vertex — the
                # reference indexes the ORIGINAL vertices with the
                # selected idx (0), visualize_occupancy.py:39-41
                mesh = (verts - verts[0][None], faces)
            save_occupancy_volume_render(
                args.out, info["prob_field"], mesh=mesh,
                voxel_size=float(meta.get("voxel_size", 1.0)),
                resolution=args.resolution,
                elev_deg=args.elev, azim_deg=args.azim,
            )
        print(f"[visualize] wrote {args.out}")


if __name__ == "__main__":
    main()
