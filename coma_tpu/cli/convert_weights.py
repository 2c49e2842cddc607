"""CLI: one-time torch-checkpoint -> native Flax params conversion.

The reference loads torch checkpoints in every worker process
(``utils/prepare_bodymocap.py:30-34`` DataParallel load, diffusers
``from_pretrained`` per process, ``imports/coap/__init__.py:12-14`` GitHub
pull). Here each published checkpoint converts ONCE into the flat pytree
store (:mod:`coma_tpu.utils.checkpoint`); pipeline CLIs then load native
arrays straight to device.

Supported kinds:
- ``hand4whole``: snapshot_6.pth.tar -> Hand4Whole params+batch_stats
- ``coap``: COAP last.ckpt -> COAPOccupancy params
- ``vposer``: TR00_004_00_WO_accad snapshot -> VPoser params
- ``sam``: sam_vit_b_01ec64.pth -> SAM params
- ``sd``: diffusers checkpoint dir -> UNet/VAE/CLIP params (safetensors)
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", default=None,
                        choices=["hand4whole", "coap", "vposer", "sam", "sd",
                                 "pointrend"])
    parser.add_argument("--src", default=None,
                        help="torch checkpoint file (or diffusers dir for sd)")
    parser.add_argument("--out", default=None, help="output store path (.npz)")
    parser.add_argument("--state_dict_key", type=str, default=None,
                        help="key holding the state dict inside the checkpoint "
                             "(e.g. 'network' for snapshot_6.pth.tar)")
    parser.add_argument("--prefix", type=str, default="",
                        help="module prefix to strip/select (coap)")
    # ---- manifest mode (weights-readiness harness) ----
    parser.add_argument("--all", action="store_true",
                        help="drive every manifest entry "
                             "(coma_tpu.models.weights_readiness.MANIFEST) "
                             "found under --weights_root")
    parser.add_argument("--weights_root", type=str, default="imports",
                        help="directory scanned for the manifest checkpoints")
    parser.add_argument("--out_dir", type=str, default="weights_native",
                        help="converted-store output directory (--all)")
    parser.add_argument("--report", type=str, default=None,
                        help="write the readiness report JSON here (--all)")
    parser.add_argument("--verify", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="check converted trees leaf-for-leaf against "
                             "the native models' init shapes (--all)")
    return parser


def _torch_load(path: str, key=None):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key:
        ckpt = ckpt[key]
    elif isinstance(ckpt, dict):
        for k in ("network", "state_dict", "model"):
            if k in ckpt and isinstance(ckpt[k], dict):
                ckpt = ckpt[k]
                break
    return ckpt


def convert_kind(kind: str, src: str, state_dict_key=None, prefix: str = ""):
    """One checkpoint -> native params pytree (dispatch shared by --kind and
    --all modes)."""
    if kind == "hand4whole":
        from coma_tpu.models.torch_weights import convert_hand4whole

        return convert_hand4whole(_torch_load(src, state_dict_key))
    if kind == "coap":
        from coma_tpu.models.torch_weights import convert_coap

        return convert_coap(_torch_load(src, state_dict_key), prefix=prefix)
    if kind == "vposer":
        from coma_tpu.models.vposer import load_torch_weights

        return load_torch_weights(_torch_load(src, state_dict_key))
    if kind == "sam":
        from coma_tpu.models.torch_weights_sam import convert_sam

        return convert_sam(_torch_load(src, state_dict_key))
    if kind == "pointrend":
        # accepts the published d2 .pkl (numpy state dict under 'model') or a
        # torch .pth of the same layout
        from coma_tpu.models.torch_weights_pointrend import (
            convert_pointrend,
            load_d2_pickle,
        )

        sd = (load_d2_pickle(src) if src.endswith(".pkl")
              else _torch_load(src, state_dict_key))
        return convert_pointrend(sd)
    if kind == "sd":
        from coma_tpu.models.diffusion.weights import load_sd_params

        params = load_sd_params(src)
        return {k: v for k, v in params.items()
                if v is not None and k != "tokenizer"}
    raise ValueError(f"unknown kind {kind!r}")


def run_all(args) -> int:
    """Manifest mode: scan, convert what's present, verify, report.

    Exit code 0 even with files missing — missing weights are the expected
    state in a fresh checkout; the report says what to fetch. Non-zero only
    on conversion/verification FAILURES of files that were present."""
    import json
    import os

    from coma_tpu.models.weights_readiness import (
        MANIFEST,
        file_digests,
        readiness_report,
        verify_tree,
    )
    from coma_tpu.utils.checkpoint import save_params

    report = readiness_report(args.weights_root)
    failures = 0
    for entry in MANIFEST:
        item = report[entry.name]
        src = item["path"]
        if src is None:
            print(f"[convert_weights] {entry.name:<22} MISSING "
                  f"(expected {entry.paths[0]})")
            continue
        if item.get("md5_prefix_ok") is False:
            print(f"[convert_weights] {entry.name:<22} CHECKSUM MISMATCH: "
                  f"md5 {item['md5']} !~ {entry.md5_prefix}*")
            item["status"] = "checksum_mismatch"
            failures += 1
            continue
        if entry.kind == "asset":
            # direct-load assets (SMPL-X npz): prove loadability, no store
            try:
                from coma_tpu.models.smplx import SMPLXModel

                model = SMPLXModel.from_npz(src)
                item["status"] = "ok"
                item["num_verts"] = int(model.num_verts)
                print(f"[convert_weights] {entry.name:<22} OK (asset, "
                      f"{model.num_verts} verts)")
            except Exception as exc:  # noqa: BLE001 — report, don't die
                item["status"] = "load_failed"
                item["error"] = str(exc)
                failures += 1
                print(f"[convert_weights] {entry.name:<22} LOAD FAILED: {exc}")
            continue
        out = os.path.join(args.out_dir, entry.name + ".npz")
        try:
            tree = convert_kind(entry.kind, src, entry.state_dict_key,
                                entry.prefix)
            problems = []
            if args.verify and entry.kind != "sam":
                # (sam: vit_b vs vit_h share a kind; the per-config shape
                # check lives in the integration test)
                problems = verify_tree(
                    entry.kind, tree,
                    src_dir=src if entry.kind == "sd" else None)
            if problems:
                item["status"] = "shape_mismatch"
                item["problems"] = problems[:20]
                failures += 1
                print(f"[convert_weights] {entry.name:<22} SHAPE MISMATCH "
                      f"({len(problems)} problems; first: {problems[0]})")
                continue
            save_params(tree, out)
            item["status"] = "converted"
            item["out"] = out
            if os.path.isfile(src) and "sha256" not in item:
                item.update(file_digests(src))
            print(f"[convert_weights] {entry.name:<22} OK -> {out}")
        except Exception as exc:  # noqa: BLE001 — report, don't die
            item["status"] = "convert_failed"
            item["error"] = str(exc)
            failures += 1
            print(f"[convert_weights] {entry.name:<22} CONVERT FAILED: {exc}")

    if args.report:
        os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2, default=str)
        print(f"[convert_weights] report -> {args.report}")
    n_found = sum(1 for v in report.values() if v["path"])
    print(f"[convert_weights] {n_found}/{len(report)} checkpoints present, "
          f"{failures} failures")
    return 1 if failures else 0


def main(argv=None) -> None:
    import os

    # conversion is host-side — no TPU needed; pinning the CPU backend also
    # keeps the CLI independent of whether the TPU plugin registered (e.g.
    # when PYTHONPATH was overridden without the plugin's site dir)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from coma_tpu.utils.checkpoint import save_params

    args = build_parser().parse_args(argv)
    if args.all:
        raise SystemExit(run_all(args))
    if not (args.kind and args.src and args.out):
        raise SystemExit("[convert_weights] need --kind/--src/--out "
                         "(or --all)")
    if args.kind != "sd" and not os.path.exists(args.src):
        raise SystemExit(f"[convert_weights] checkpoint not found: {args.src}")

    tree = convert_kind(args.kind, args.src, args.state_dict_key, args.prefix)
    save_params(tree, args.out)
    print(f"[convert_weights] {args.kind}: {args.src} -> {args.out}")


if __name__ == "__main__":
    main()
