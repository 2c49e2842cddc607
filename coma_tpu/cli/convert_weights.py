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
    parser.add_argument("--kind", required=True,
                        choices=["hand4whole", "coap", "vposer", "sam", "sd",
                                 "pointrend"])
    parser.add_argument("--src", required=True,
                        help="torch checkpoint file (or diffusers dir for sd)")
    parser.add_argument("--out", required=True, help="output store path (.npz)")
    parser.add_argument("--state_dict_key", type=str, default=None,
                        help="key holding the state dict inside the checkpoint "
                             "(e.g. 'network' for snapshot_6.pth.tar)")
    parser.add_argument("--prefix", type=str, default="",
                        help="module prefix to strip/select (coap)")
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


def main(argv=None) -> None:
    import os

    # conversion is host-side — no TPU needed; pinning the CPU backend also
    # keeps the CLI independent of whether the TPU plugin registered (e.g.
    # when PYTHONPATH was overridden without the plugin's site dir)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from coma_tpu.utils.checkpoint import save_params

    args = build_parser().parse_args(argv)
    if args.kind != "sd" and not os.path.exists(args.src):
        raise SystemExit(f"[convert_weights] checkpoint not found: {args.src}")

    if args.kind == "hand4whole":
        from coma_tpu.models.torch_weights import convert_hand4whole

        tree = convert_hand4whole(_torch_load(args.src, args.state_dict_key))
    elif args.kind == "coap":
        from coma_tpu.models.torch_weights import convert_coap

        tree = convert_coap(_torch_load(args.src, args.state_dict_key),
                            prefix=args.prefix)
    elif args.kind == "vposer":
        from coma_tpu.models.vposer import load_torch_weights

        tree = load_torch_weights(_torch_load(args.src, args.state_dict_key))
    elif args.kind == "sam":
        from coma_tpu.models.torch_weights_sam import convert_sam

        tree = convert_sam(_torch_load(args.src, args.state_dict_key))
    elif args.kind == "pointrend":
        # accepts the published d2 .pkl (numpy state dict under 'model') or a
        # torch .pth of the same layout
        from coma_tpu.models.torch_weights_pointrend import (
            convert_pointrend,
            load_d2_pickle,
        )

        if args.src.endswith(".pkl"):
            sd = load_d2_pickle(args.src)
        else:
            sd = _torch_load(args.src, args.state_dict_key)
        tree = convert_pointrend(sd)
    else:  # sd
        from coma_tpu.models.diffusion.weights import load_sd_params

        params = load_sd_params(args.src)
        tree = {k: v for k, v in params.items()
                if v is not None and k != "tokenizer"}

    save_params(tree, args.out)
    print(f"[convert_weights] {args.kind}: {args.src} -> {args.out}")


if __name__ == "__main__":
    main()
