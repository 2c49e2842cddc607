"""Orchestrator: the full 3D HOI lifting stage
(reference: ``scripts/generate_3d_hoi_samples.sh:46-58`` — sequential bash
stages become one python entry; per-stage flags pass through).

segment_human -> predict_human -> initialize_depth -> optimize_depth ->
compute_metrics.
"""
from __future__ import annotations

import argparse
import sys


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

    stages = [
        ("segment", segment_human.main),
        ("predict", predict_human.main),
        ("init", initialize_depth.main),
        ("optimize", optimize_depth.main),
        ("metrics", compute_metrics.main),
    ]
    for name, stage_main in stages:
        if name in args.skip:
            continue
        print(f"===== stage: {name} =====")
        stage_main(passthrough)


if __name__ == "__main__":
    main()
