"""Orchestrator: the ComA learning stage
(reference: ``scripts/learn_coma.sh:42-64`` — filter -> downsample_human ->
downsample_objects x resolutions -> extract_coma x hyperparams).
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--hyperparams_keys", type=str, nargs="+",
                        default=["qual:backpack_human_contact",
                                 "qual:backpack_object_contact",
                                 "qual:backpack_occupancy",
                                 "qual:backpack_orientation"])
    parser.add_argument("--object_resolutions", type=int, nargs="+",
                        default=[2048, 1500, 180])
    parser.add_argument("--skip", type=str, nargs="*", default=[],
                        choices=["filter", "downsample_human", "downsample_objects", "extract"])
    args, passthrough = parser.parse_known_args(argv)

    from coma_tpu.cli import downsample_human, downsample_objects, extract_coma
    from coma_tpu.cli import filter as filter_cli
    from coma_tpu.cli._common import filter_known_args

    # each stage reads only its own flags (like the reference's bash)
    known = lambda mod, extra=(): filter_known_args(
        mod.build_parser(), passthrough
    ) + list(extra)
    if "filter" not in args.skip:
        print("===== stage: filter =====")
        filter_cli.main(known(filter_cli))
    if "downsample_human" not in args.skip:
        print("===== stage: downsample_human =====")
        downsample_human.main(known(downsample_human))
    if "downsample_objects" not in args.skip:
        print("===== stage: downsample_objects =====")
        for res in args.object_resolutions:
            downsample_objects.main(
                known(downsample_objects, ["--number_of_points", str(res)])
            )
    if "extract" not in args.skip:
        for key in args.hyperparams_keys:
            print(f"===== stage: extract ({key}) =====")
            extract_coma.main(known(extract_coma, ["--hyperparams_key", key]))


if __name__ == "__main__":
    main()
