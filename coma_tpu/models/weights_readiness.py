"""Weights-readiness harness: manifest + verification for real checkpoints.

This environment has no network and no pretrained checkpoint bytes on disk;
every converter in the repo is parity-tested against independently written
torch mirrors, but none has ever eaten a *real* file. This module makes the
repo ready for the day files appear, with zero code changes needed then:

- ``MANIFEST``: every checkpoint the reference installation needs
  (``INSTALL.md:56-147``, ``constants/segmentation.py:5``,
  ``utils/adaptive_mask_inpainting.py:1240-1260``,
  ``imports/coap/__init__.py:12-14``,
  ``constants/generation/inpaint_ldm.py:4-15``,
  ``src/application/optimize.py:231``), with the expected filenames,
  publisher checksum prefixes (detectron2/SAM embed the first 6 md5 hex
  chars in the filename), and conversion options.
- ``expected_shapes``: the ground-truth parameter pytree shapes, derived
  abstractly (``jax.eval_shape``) from the native Flax models' own init —
  a converted checkpoint must match leaf-for-leaf.
- ``readiness_report``: scan a weights root, convert whatever is present
  (``cli/convert_weights --all``), verify shapes and digests, and emit a
  machine-readable report.

Driven by ``python -m coma_tpu.cli.convert_weights --all --weights_root R``
and by the skip-if-absent integration tests in
``tests/test_weights_readiness.py`` (set ``COMA_WEIGHTS_ROOT``).
"""
from __future__ import annotations

import dataclasses
import glob as _glob
import hashlib
import os
from typing import Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class WeightsEntry:
    name: str
    kind: str                      # convert_weights --kind, or "sd" / "asset"
    paths: Tuple[str, ...]         # candidate paths relative to the root
    md5_prefix: Optional[str] = None   # publisher filename checksum prefix
    state_dict_key: Optional[str] = None
    prefix: str = ""
    required: bool = True          # optional entries don't fail readiness
    notes: str = ""


MANIFEST: Tuple[WeightsEntry, ...] = (
    WeightsEntry(
        name="pointrend_r50_fpn_3x",
        kind="pointrend",
        paths=("imports/pointrend/weights/model_final_edd263.pkl",
               "pointrend/model_final_edd263.pkl",
               "model_final_edd263.pkl"),
        md5_prefix="edd263",       # d2 names checkpoints by md5[:6]
        notes="In-loop person segmenter (ref constants/segmentation.py:5). "
              "detectron2 PointRend R50-FPN 3x COCO.",
    ),
    WeightsEntry(
        name="hand4whole",
        kind="hand4whole",
        paths=("imports/hand4whole/snapshot_6.pth.tar",
               "hand4whole/snapshot_6.pth.tar",
               "snapshot_6.pth.tar"),
        state_dict_key="network",
        notes="3D human regressor (ref INSTALL.md:73-82), H36M+MPII+MSCOCO.",
    ),
    WeightsEntry(
        name="sam_vit_b",
        kind="sam",
        paths=("imports/segment-anything/sam_vit_b_01ec64.pth",
               "sam/sam_vit_b_01ec64.pth",
               "sam_vit_b_01ec64.pth"),
        md5_prefix="01ec64",
        notes="Box-prompted object segmenter. The reference registers vit_h "
              "for every key (utils/adaptive_mask_inpainting.py:1240-1242); "
              "our default SAMConfig is ViT-B — the converter handles both "
              "(depth inferred from the checkpoint).",
    ),
    WeightsEntry(
        name="sam_vit_h",
        kind="sam",
        paths=("imports/segment-anything/sam_vit_h_4b8939.pth",
               "sam/sam_vit_h_4b8939.pth",
               "sam_vit_h_4b8939.pth"),
        md5_prefix="4b8939",
        required=False,
        notes="The reference's registered SAM checkpoint "
              "(utils/adaptive_mask_inpainting.py:1240). Use "
              "models.sam.sam_vit_h_config() at load time.",
    ),
    WeightsEntry(
        name="sd2_inpaint",
        kind="sd",
        paths=("stable-diffusion-2-inpainting",
               "stabilityai/stable-diffusion-2-inpainting",
               "sd2-inpainting"),
        notes="Diffusers checkpoint dir — the reference's default inpainting "
              "model (constants/generation/inpaint_ldm.py:4-15). Configs "
              "are inferred from the dir's config.json files "
              "(infer_sd_configs), incl. SD-2.x per-block heads and the "
              "OpenCLIP gelu text encoder.",
    ),
    WeightsEntry(
        name="coap_smplx_neutral",
        kind="coap",
        paths=("imports/coap/coap_smplx_neutral.ckpt",
               "coap/coap_smplx_neutral.ckpt",
               "coap_smplx_neutral.ckpt"),
        state_dict_key="state_dict",
        notes="Neural occupancy for collision loss "
              "(imports/coap/__init__.py:12-14 pulls "
              "coap_{model_type}_{gender}.ckpt from GitHub).",
    ),
    WeightsEntry(
        name="vposer",
        kind="vposer",
        paths=("imports/vposer/snapshots/TR00_E096.pt",
               "vposer/TR00_E096.pt",
               "TR00_E096.pt"),
        state_dict_key=None,
        required=False,
        notes="Body-pose prior for the application optimizer "
              "(ref INSTALL.md:135-147, src/application/optimize.py:231).",
    ),
    WeightsEntry(
        name="smplx_neutral",
        kind="asset",
        paths=("imports/hand4whole/common/human_model_files/smplx/SMPLX_NEUTRAL.npz",
               "human_model_files/smplx/SMPLX_NEUTRAL.npz",
               "smplx/SMPLX_NEUTRAL.npz",
               "SMPLX_NEUTRAL.npz"),
        notes="License-gated SMPL-X body model (ref INSTALL.md:84-110); "
              "loaded directly by models.smplx.SMPLXModel.from_npz — "
              "no conversion step.",
    ),
)


def find_checkpoint(root: str, entry: WeightsEntry) -> Optional[str]:
    """First existing candidate path for ``entry`` under ``root`` (also
    tries a recursive basename glob as a last resort)."""
    for rel in entry.paths:
        p = os.path.join(root, rel)
        if os.path.exists(p):
            return p
    base = os.path.basename(entry.paths[0])
    hits = sorted(_glob.glob(os.path.join(root, "**", base), recursive=True))
    return hits[0] if hits else None


def file_digests(path: str, chunk: int = 1 << 20) -> Dict[str, object]:
    """sha256 + md5 + size of a file (md5 checks the publisher's filename
    prefix; sha256 is recorded for the local lockfile)."""
    sha, md5 = hashlib.sha256(), hashlib.md5()
    n = 0
    with open(path, "rb") as f:
        while True:
            buf = f.read(chunk)
            if not buf:
                break
            sha.update(buf)
            md5.update(buf)
            n += len(buf)
    return {"sha256": sha.hexdigest(), "md5": md5.hexdigest(), "bytes": n}


# ------------------------------------------------------------------ shapes --

def _flat_shapes(tree) -> Dict[str, Tuple[int, ...]]:
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = tuple(leaf.shape)
    return out


def expected_shapes(kind: str, src_dir: Optional[str] = None
                    ) -> Dict[str, Tuple[int, ...]]:
    """Ground-truth converted-tree shapes from the native models' abstract
    init (no weights, no compute — ``jax.eval_shape``).

    ``src_dir`` only matters for ``kind='sd'`` (configs are inferred from
    the diffusers dir's config.json when given)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    z = jnp.zeros

    if kind == "hand4whole":
        from coma_tpu.models.hand4whole import Hand4Whole

        m = Hand4Whole()
        tree = jax.eval_shape(m.init, key, z((1, 256, 192, 3)))
    elif kind == "sam":
        from coma_tpu.models.sam import SAM, SAMConfig

        m = SAM(SAMConfig())
        tree = jax.eval_shape(m.init, key, z((1, 1024, 1024, 3)), z((1, 4)))
    elif kind == "pointrend":
        from coma_tpu.models.pointrend import PointRendConfig, PointRendModel

        m = PointRendModel(PointRendConfig())
        tree = jax.eval_shape(m.init, key, z((256, 256, 3)))
    elif kind == "coap":
        from coma_tpu.models.coap import COAPConfig, COAPOccupancy

        cfg = COAPConfig()
        m = COAPOccupancy(cfg)
        K = cfg.num_parts
        tree = jax.eval_shape(m.init, key, z((K, 64, 3)), z((K, 5, 3)),
                              jnp.ones((K, 5)))
    elif kind == "vposer":
        from coma_tpu.models.vposer import (VPoserConfig, VPoserDecoder,
                                            VPoserEncoder)

        cfg = VPoserConfig()
        enc = jax.eval_shape(VPoserEncoder(cfg).init, key,
                             z((1, cfg.num_joints * 3)))
        dec = jax.eval_shape(VPoserDecoder(cfg).init, key,
                             z((1, cfg.latent_dim)))
        tree = (enc, dec)
    elif kind == "sd":
        from coma_tpu.models.diffusion.clip_text import CLIPTextEncoder
        from coma_tpu.models.diffusion.unet import UNet2DCondition
        from coma_tpu.models.diffusion.vae import Decoder, Encoder, VAEConfig
        from coma_tpu.models.diffusion.weights import infer_sd_configs

        ucfg, ccfg = infer_sd_configs(src_dir or "")
        vcfg = VAEConfig()
        tree = {
            "unet": jax.eval_shape(
                UNet2DCondition(ucfg).init, key,
                z((1, 8, 8, ucfg.in_channels)), z((1,)),
                z((1, 77, ucfg.cross_attention_dim))),
            "vae_encoder": jax.eval_shape(Encoder(vcfg).init, key,
                                          z((1, 64, 64, 3))),
            "vae_decoder": jax.eval_shape(Decoder(vcfg).init, key,
                                          z((1, 8, 8, 4))),
            "clip": jax.eval_shape(
                CLIPTextEncoder(ccfg).init, key,
                jnp.zeros((1, ccfg.max_positions), jnp.int32)),
        }
    else:
        raise ValueError(f"no shape oracle for kind {kind!r}")
    return _flat_shapes(tree)


def verify_tree(kind: str, tree, src_dir: Optional[str] = None) -> list:
    """Compare a converted tree against the native init shapes. Returns a
    list of problem strings (empty == exact leaf-for-leaf match)."""
    want = expected_shapes(kind, src_dir)
    got = _flat_shapes(tree)
    problems = []
    for k in sorted(set(want) - set(got)):
        problems.append(f"missing leaf {k} (expected {want[k]})")
    for k in sorted(set(got) - set(want)):
        problems.append(f"unexpected leaf {k} {got[k]}")
    for k in sorted(set(got) & set(want)):
        if tuple(got[k]) != tuple(want[k]):
            problems.append(f"shape mismatch {k}: got {got[k]}, "
                            f"expected {want[k]}")
    return problems


def readiness_report(root: str) -> Dict[str, Dict]:
    """Scan ``root`` for every manifest entry. Pure filesystem scan — no
    conversion (that's ``cli/convert_weights --all``)."""
    report = {}
    for entry in MANIFEST:
        src = find_checkpoint(root, entry)
        item: Dict[str, object] = {
            "kind": entry.kind,
            "required": entry.required,
            "status": "found" if src else "missing",
            "path": src,
            "expected": entry.paths[0],
        }
        if src and os.path.isfile(src) and entry.md5_prefix:
            digests = file_digests(src)
            item.update(digests)
            item["md5_prefix_ok"] = str(digests["md5"]).startswith(
                entry.md5_prefix)
        report[entry.name] = item
    return report
