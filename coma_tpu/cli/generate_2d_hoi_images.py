"""Orchestrator: the 2D HOI image generation stage
(reference: ``scripts/generate_2d_hoi_images.sh:46-56`` — render_objects ->
select_mask -> generate_prompts -> inpaint).
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--skip", type=str, nargs="*", default=[],
                        choices=["render", "select_mask", "prompts", "inpaint"])
    args, passthrough = parser.parse_known_args(argv)

    from coma_tpu.cli import generate_prompts, inpaint, render_objects, select_mask
    from coma_tpu.cli._common import filter_known_args

    stages = [
        ("render", render_objects),
        ("select_mask", select_mask),
        ("prompts", generate_prompts),
        ("inpaint", inpaint),
    ]
    for name, mod in stages:
        if name in args.skip:
            continue
        print(f"===== stage: {name} =====")
        # each stage reads only its own flags (like the reference's bash)
        mod.main(filter_known_args(mod.build_parser(), passthrough))


if __name__ == "__main__":
    main()
