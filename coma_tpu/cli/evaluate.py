"""CLI: quantitative evaluation of a predicted ComA against ground truth.

The paper-table machinery (reference: ``utils/evaluation.py`` +
``constants/coma/quant.py`` quant_keys + the BEHAVE GT prep in
``utils/behave.py:1062``; the reference's eval driver scripts were never
shipped — this CLI is the runnable version): SIM = Σ min(p, q) and
normalized MAE between the aggregated human/object contact distributions of
two ComA pickles.
"""
from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pred_coma", required=True, help="predicted ComA pickle")
    parser.add_argument("--gt_coma", required=True, help="ground-truth ComA pickle")
    parser.add_argument("--significant_contact_ratio", type=float, default=0.0)
    parser.add_argument("--out_json", type=str)
    return parser


def main(argv=None) -> None:
    from coma_tpu.affordance.io import load_coma_state
    from coma_tpu.pipelines.behave_eval import evaluate_against_gt

    args = build_parser().parse_args(argv)
    pred = load_coma_state(args.pred_coma)
    gt = load_coma_state(args.gt_coma)
    metrics = evaluate_against_gt(
        pred, gt, significant_contact_ratio=args.significant_contact_ratio
    )
    text = json.dumps(metrics, indent=1)
    print(text)
    if args.out_json:
        with open(args.out_json, "w") as fh:
            fh.write(text)


if __name__ == "__main__":
    main()
