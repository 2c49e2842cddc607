"""Weights-readiness harness tests (VERDICT r2 task 5).

Hermetic lane: the manifest is well-formed, the shape oracles derive, the
``--all`` CLI walks an empty root without dying, and a fabricated full-size
VPoser checkpoint drives the ENTIRE path (scan -> torch load -> convert ->
leaf-for-leaf shape verify -> native store) end-to-end.

Real-weights lane (skip-if-absent): set ``COMA_WEIGHTS_ROOT`` to a directory
holding the reference's published checkpoints (``INSTALL.md:56-147`` layout
or flat) and every converter eats its real file and runs one forward. The
day weights appear, ``pytest tests/test_weights_readiness.py`` + one
``convert_weights --all`` invocation proves the whole zoo with zero code
changes.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from coma_tpu.models.weights_readiness import (
    MANIFEST,
    expected_shapes,
    file_digests,
    find_checkpoint,
    readiness_report,
    verify_tree,
)

WEIGHTS_ROOT = os.environ.get("COMA_WEIGHTS_ROOT")


def _entry(name):
    return next(e for e in MANIFEST if e.name == name)


# ------------------------------------------------------------- hermetic ----

def test_manifest_wellformed():
    names = [e.name for e in MANIFEST]
    assert len(names) == len(set(names))
    kinds = {"hand4whole", "coap", "vposer", "sam", "sd", "pointrend", "asset"}
    for e in MANIFEST:
        assert e.kind in kinds, e.name
        assert e.paths, e.name
        assert e.notes, e.name
    # everything the reference's INSTALL demands is covered
    assert {"pointrend_r50_fpn_3x", "hand4whole", "sd2_inpaint",
            "coap_smplx_neutral", "smplx_neutral"} <= set(names)


@pytest.mark.parametrize("kind", ["vposer", "coap", "hand4whole", "sd"])
def test_expected_shapes_derive(kind):
    """The shape oracles come from the native models' abstract init — they
    must derive without weights and be non-trivial."""
    shapes = expected_shapes(kind)
    assert len(shapes) > 5
    assert all(isinstance(s, tuple) for s in shapes.values())


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sam", "pointrend"])
def test_expected_shapes_derive_heavy(kind):
    shapes = expected_shapes(kind)
    assert len(shapes) > 50


def test_all_cli_on_empty_root(tmp_path, capsys):
    """A fresh checkout has no weights: ``--all`` must report every entry
    missing, write the report, and exit 0."""
    from coma_tpu.cli.convert_weights import main

    report_path = tmp_path / "report.json"
    with pytest.raises(SystemExit) as exc:
        main(["--all", "--weights_root", str(tmp_path / "empty"),
              "--out_dir", str(tmp_path / "out"),
              "--report", str(report_path)])
    assert exc.value.code == 0
    report = json.loads(report_path.read_text())
    assert set(report) == {e.name for e in MANIFEST}
    assert all(v["status"] == "missing" for v in report.values())


def _fabricate_vposer_sd(rng):
    """Full-size torch-layout VPoser state dict (the published
    TR00_E096.pt shapes: 63 -> 512 -> 512 -> 32, decode to 21*6)."""
    import torch

    t = lambda *s: torch.from_numpy(
        rng.normal(0, 0.02, size=s).astype(np.float32))
    sd = {}
    for bn, d in (("bodyprior_enc_bn1", 63), ("bodyprior_enc_bn2", 512)):
        sd[f"{bn}.weight"], sd[f"{bn}.bias"] = t(d), t(d)
        sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"] = t(d), t(d).abs() + 1
        sd[f"{bn}.num_batches_tracked"] = torch.tensor(0)
    for fc, (o, i) in (("bodyprior_enc_fc1", (512, 63)),
                       ("bodyprior_enc_fc2", (512, 512)),
                       ("bodyprior_enc_mu", (32, 512)),
                       ("bodyprior_enc_logvar", (32, 512)),
                       ("bodyprior_dec_fc1", (512, 32)),
                       ("bodyprior_dec_fc2", (512, 512)),
                       ("bodyprior_dec_out", (126, 512))):
        sd[f"{fc}.weight"], sd[f"{fc}.bias"] = t(o, i), t(o)
    return sd


def test_all_cli_fabricated_vposer(tmp_path, rng):
    """End-to-end through the REAL code path: a torch-serialized checkpoint
    at the manifest location -> found -> converted -> shape-verified against
    the native init -> native store written and loadable."""
    import torch

    from coma_tpu.cli.convert_weights import main
    from coma_tpu.utils.checkpoint import load_params

    root = tmp_path / "weights"
    dst = root / "imports" / "vposer" / "snapshots"
    dst.mkdir(parents=True)
    torch.save(_fabricate_vposer_sd(rng), dst / "TR00_E096.pt")

    report_path = tmp_path / "report.json"
    with pytest.raises(SystemExit) as exc:
        main(["--all", "--weights_root", str(root),
              "--out_dir", str(tmp_path / "out"),
              "--report", str(report_path)])
    assert exc.value.code == 0
    report = json.loads(report_path.read_text())
    assert report["vposer"]["status"] == "converted"

    store = load_params(str(tmp_path / "out" / "vposer.npz"))
    # decoder params survived the round trip
    import jax

    leaves = jax.tree_util.tree_leaves(store)
    assert any(np.asarray(l).shape == (512, 32)[::-1] or
               np.asarray(l).shape == (32, 512) for l in leaves)


def test_verify_tree_catches_mismatch(rng):
    """A wrong-shaped converted tree must be reported, not silently saved."""
    from coma_tpu.models.vposer import load_torch_weights

    import torch

    sd = _fabricate_vposer_sd(rng)
    sd["bodyprior_dec_fc1.weight"] = torch.zeros(511, 32)  # corrupt
    sd["bodyprior_dec_fc1.bias"] = torch.zeros(511)
    tree = load_torch_weights({k: v.numpy() for k, v in sd.items()})
    problems = verify_tree("vposer", tree)
    assert problems and any("dec_fc1" in p for p in problems)


def test_md5_prefix_gate(tmp_path):
    """The d2/SAM publisher checksum-in-filename convention is enforced."""
    p = tmp_path / "model_final_edd263.pkl"
    p.write_bytes(b"not the real checkpoint")
    d = file_digests(str(p))
    assert not d["md5"].startswith("edd263")
    entry = _entry("pointrend_r50_fpn_3x")
    report = readiness_report(str(tmp_path))
    assert report[entry.name]["status"] == "found"
    assert report[entry.name]["md5_prefix_ok"] is False


# ----------------------------------------------------- real weights lane ----

needs_weights = pytest.mark.skipif(
    WEIGHTS_ROOT is None,
    reason="COMA_WEIGHTS_ROOT not set (no pretrained checkpoints on disk)",
)


def _find(name):
    entry = _entry(name)
    src = find_checkpoint(WEIGHTS_ROOT, entry)
    if src is None:
        pytest.skip(f"{entry.paths[0]} not present under {WEIGHTS_ROOT}")
    return entry, src


@needs_weights
@pytest.mark.slow
def test_real_pointrend_person_mask():
    """Real model_final_edd263.pkl -> native PointRend -> person mask on a
    synthetic person image (the in-loop segmenter role,
    ref utils/adaptive_mask_inpainting.py:1182-1243)."""
    from coma_tpu.cli.convert_weights import convert_kind
    from coma_tpu.models.pointrend import PointRendPersonSegmenter
    from coma_tpu.models.synthetic_person import person_batch

    entry, src = _find("pointrend_r50_fpn_3x")
    tree = convert_kind(entry.kind, src)
    assert not verify_tree("pointrend", tree)

    imgs, masks = person_batch(np.random.default_rng(0), 1, 256)
    dets = PointRendPersonSegmenter(tree)((imgs[0] * 255).astype(np.uint8))
    assert isinstance(dets, list)
    if dets:  # capsule people are out-of-distribution; mask sanity only
        assert dets[0]["mask"].shape == (256, 256)


@needs_weights
@pytest.mark.slow
def test_real_sam_box_prompt():
    """Real sam_vit_*.pth -> native SAM -> box-prompted mask."""
    import jax.numpy as jnp

    from coma_tpu.cli.convert_weights import convert_kind
    from coma_tpu.models.sam import SAM, SAMConfig, sam_vit_h_config

    for name, cfg in (("sam_vit_b", SAMConfig()),
                      ("sam_vit_h", sam_vit_h_config())):
        entry = _entry(name)
        src = find_checkpoint(WEIGHTS_ROOT, entry)
        if src is None:
            continue
        tree = convert_kind(entry.kind, src)
        model = SAM(cfg)
        img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        boxes = jnp.asarray([[100.0, 100.0, 400.0, 400.0]])
        out = model.apply(tree, img, boxes)
        assert np.isfinite(np.asarray(out[0] if isinstance(out, tuple)
                                      else out)).all()
        return
    pytest.skip("no SAM checkpoint present")


@needs_weights
@pytest.mark.slow
def test_real_hand4whole_regression():
    """Real snapshot_6.pth.tar -> native Hand4Whole -> one regression."""
    import jax.numpy as jnp

    from coma_tpu.cli.convert_weights import convert_kind
    from coma_tpu.models.hand4whole import Hand4Whole

    entry, src = _find("hand4whole")
    tree = convert_kind(entry.kind, src, entry.state_dict_key)
    assert not verify_tree("hand4whole", tree)
    out = Hand4Whole().apply(tree, jnp.zeros((1, 256, 192, 3)))
    assert all(np.isfinite(np.asarray(v)).all()
               for v in (out.values() if isinstance(out, dict) else [out[0]]))


@needs_weights
@pytest.mark.slow
def test_real_sd_denoise_step():
    """Real SD-inpaint diffusers dir -> configs inferred from config.json ->
    one CFG denoise step at 64x64 latents."""
    import jax
    import jax.numpy as jnp

    from coma_tpu.cli.convert_weights import convert_kind
    from coma_tpu.models.diffusion.unet import UNet2DCondition
    from coma_tpu.models.diffusion.weights import infer_sd_configs

    entry, src = _find("sd2_inpaint")
    tree = convert_kind(entry.kind, src)
    assert not verify_tree("sd", tree, src_dir=src)
    ucfg, _ = infer_sd_configs(src)
    lat = jnp.zeros((1, 64, 64, ucfg.in_channels), ucfg.dtype)
    ctx = jnp.zeros((1, 77, ucfg.cross_attention_dim), ucfg.dtype)
    eps = jax.jit(UNet2DCondition(ucfg).apply)(
        tree["unet"], lat, jnp.asarray([500.0]), ctx)
    assert np.isfinite(np.asarray(eps, np.float32)).all()


@needs_weights
@pytest.mark.slow
def test_real_smplx_lbs():
    """Real SMPLX_NEUTRAL.npz -> native LBS forward."""
    import jax.numpy as jnp

    from coma_tpu.models.smplx import SMPLXModel, smplx_forward

    entry, src = _find("smplx_neutral")
    model = SMPLXModel.from_npz(src)
    verts, joints = smplx_forward(model, betas=jnp.zeros((1, 10)))
    assert verts.shape[1] == 10475  # SMPL-X vertex count
    assert np.isfinite(np.asarray(verts)).all()
