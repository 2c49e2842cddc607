"""CLI: ComA extraction (reference: ``src/coma/extract_coma.py``)."""
from __future__ import annotations

import argparse

from coma_tpu.cli._common import (
    add_common_flags,
    enable_compilation_cache,
    lower_all,
    seed_everything,
)
from coma_tpu.config.hyperparams import (
    QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT,
    QUANT_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT,
    get_hyperparams,
)
from coma_tpu.pipelines.extract import run_affordance_extraction


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--prompts", type=str, nargs="+")
    parser.add_argument("--camera_dir", type=str, default="results/generation/cameras")
    parser.add_argument("--human_params_dir", type=str, default="results/generation/human_preds")
    parser.add_argument("--asset_downsample_dir", type=str, default="results/coma/asset_downsample")
    parser.add_argument("--human_postfilter_dir", type=str, default="results/coma/human_postfilterings")
    parser.add_argument("--human_sample_dir", type=str, default="results/generation/human_sample")
    parser.add_argument("--coma_save_dir", type=str, default="results/coma/extracted_coma")
    parser.add_argument("--affordance_save_dir", type=str, default="results/coma/affordance")
    parser.add_argument("--smplx_canon_obj_pth", type=str, default="./constants/mesh/smplx_star.obj")
    parser.add_argument("--constants_mesh_dir", type=str, default="./constants/mesh")
    parser.add_argument(
        "--hyperparams_key",
        choices=list(QUANT_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT.keys())
        + list(QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT.keys()),
        required=True,
    )
    parser.add_argument("--scale_tolerance", type=float, default=3.0)
    parser.add_argument("--multihost", action="store_true",
                        help="multi-process run: jax.distributed bootstrap, "
                             "per-process sample shards, DCN psum of the "
                             "accumulators (env: COMA_COORDINATOR, "
                             "COMA_NUM_PROCESSES, COMA_PROCESS_ID)")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    enable_compilation_cache()
    if args.multihost:
        from coma_tpu.parallel import multihost

        multihost.initialize()
    results_root = args.human_sample_dir.rsplit("/generation/human_sample", 1)[0]
    run_affordance_extraction(
        hyperparams=get_hyperparams(args.hyperparams_key),
        hyperparams_key=args.hyperparams_key,
        supercategories=lower_all(args.supercategories),
        categories=lower_all(args.categories),
        prompts=lower_all(args.prompts),
        results_root=results_root,
        constants_mesh_dir=args.constants_mesh_dir,
        scale_tolerance=args.scale_tolerance,
        skip_done=args.skip_done,
        multihost=args.multihost,
    )


if __name__ == "__main__":
    main()
