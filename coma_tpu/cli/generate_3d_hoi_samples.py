"""Orchestrator: the full 3D HOI lifting stage
(reference: ``scripts/generate_3d_hoi_samples.sh:46-58`` — sequential bash
stages become one python entry; per-stage flags pass through).

segment_human -> predict_human -> initialize_depth -> optimize_depth ->
compute_metrics.
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--skip", type=str, nargs="*", default=[],
                        choices=["segment", "predict", "init", "optimize", "metrics"])
    args, passthrough = parser.parse_known_args(argv)

    from coma_tpu.cli import (
        compute_metrics,
        initialize_depth,
        optimize_depth,
        predict_human,
        segment_human,
    )

    from coma_tpu.cli._common import filter_known_args

    stages = [
        ("segment", segment_human),
        ("predict", predict_human),
        ("init", initialize_depth),
        ("optimize", optimize_depth),
        ("metrics", compute_metrics),
    ]
    for name, mod in stages:
        if name in args.skip:
            continue
        print(f"===== stage: {name} =====")
        # each stage reads only its own flags (like the reference's bash)
        mod.main(filter_known_args(mod.build_parser(), passthrough))


if __name__ == "__main__":
    main()
