"""``python -m coma_tpu`` — list the CLI surface."""
from __future__ import annotations

import pkgutil

import coma_tpu
import coma_tpu.cli


def main() -> None:
    print(f"coma-tpu {coma_tpu.__version__} — TPU-native ComA framework")
    print("\nPipelines:")
    for name in ("generate_2d_hoi_images", "generate_3d_hoi_samples", "learn_coma"):
        print(f"  python -m coma_tpu.cli.{name}")
    print("\nStages:")
    skip = {"_common", "generate_2d_hoi_images", "generate_3d_hoi_samples", "learn_coma"}
    for mod in sorted(m.name for m in pkgutil.iter_modules(coma_tpu.cli.__path__)):
        if mod not in skip:
            print(f"  python -m coma_tpu.cli.{mod}")
    print("\nEach command supports --help. Docs: README.md, docs/PARITY.md, docs/KERNELS.md")


if __name__ == "__main__":
    main()
