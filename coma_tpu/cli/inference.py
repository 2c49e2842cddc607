"""CLI: reproduce affordance products from a trained ComA pickle
(reference: ``src/coma/inference.py``, README.md:96-158)."""
from __future__ import annotations

import argparse

from coma_tpu.cli._common import seed_everything
from coma_tpu.config.hyperparams import get_hyperparams
from coma_tpu.config.metadata import DEFAULT_SEED
from coma_tpu.pipelines.inference import inference


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--supercategory", type=str)
    parser.add_argument("--category", type=str)
    parser.add_argument("--coma_path", type=str, required=True)
    parser.add_argument(
        "--visualize_type",
        type=str,
        choices=["aggr-human-contact", "aggr-object-contact", "orientation", "occupancy"],
    )
    parser.add_argument("--smplx_downsample_pth", type=str)
    parser.add_argument("--asset_downsample_pth", type=str, required=True)
    parser.add_argument("--hyperparams_key", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="output")
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    hyperparams = get_hyperparams(args.hyperparams_key)
    visualize_type = args.visualize_type or hyperparams["visualize_type"]
    path = inference(
        supercategory=args.supercategory,
        category=args.category,
        coma_path=args.coma_path,
        smplx_downsample_pth=args.smplx_downsample_pth,
        asset_downsample_pth=args.asset_downsample_pth,
        visualize_type=visualize_type,
        hyperparams=hyperparams,
        output_dir=args.output_dir,
    )
    print(f"[inference] saved {path}")


if __name__ == "__main__":
    main()
