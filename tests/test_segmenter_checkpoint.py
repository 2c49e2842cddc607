"""Quality gate for the committed trained person-segmenter checkpoint.

The reference's person masks come from an externally downloaded COCO
PointRend checkpoint (``INSTALL.md:56-69``); this framework additionally
ships a self-contained trained U-Net (``coma_tpu/data/person_segmenter.npz``,
produced by ``cli/train_segmenter.py`` on a TPU v5e). These tests gate its
quality on the held-out stream of the procedural articulated-person
generator — the same eval seed the trainer reports — so a regression in the
model, the generator, or the checkpoint itself fails CI rather than silently
degrading every downstream 2D-stage artifact.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "coma_tpu", "data", "person_segmenter.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="committed checkpoint not present"
)

EVAL_SEED = 10_000  # train_segmenter.py --eval_seed default
SIZE = 128


@pytest.fixture(scope="module")
def model_and_params():
    from coma_tpu.cli.segment_human import load_segmenter

    return load_segmenter(CKPT)


def test_checkpoint_loads_into_model(model_and_params):
    model, params = model_and_params
    logits = model.apply(params, jnp.zeros((1, SIZE, SIZE, 3)))
    assert logits.shape == (1, SIZE, SIZE)
    assert bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.slow  # the cross-domain smoke gate below is the fast-lane representative
def test_held_out_iou_gate_smoke(model_and_params):
    """Fast-lane gate: first 8 images of the held-out stream (deterministic
    seed). The full 2x16 eval is the slow-lane ``test_held_out_iou_gate``."""
    from coma_tpu.models.segmentation_train import SegTrainer
    from coma_tpu.models.synthetic_person import person_batch

    model, params = model_and_params
    trainer = SegTrainer(model, None)
    rng = np.random.default_rng(EVAL_SEED)
    imgs, masks = person_batch(rng, 8, SIZE)
    miou = float(trainer.iou(params, jnp.asarray(imgs), jnp.asarray(masks)))
    assert miou >= 0.68, f"held-out (8-img smoke) mIoU {miou:.3f} below gate"


@pytest.mark.slow
def test_held_out_iou_gate(model_and_params):
    """Mean IoU on the held-out stream must clear the gate."""
    from coma_tpu.models.segmentation_train import SegTrainer
    from coma_tpu.models.synthetic_person import person_batch

    model, params = model_and_params
    trainer = SegTrainer(model, None)
    rng = np.random.default_rng(EVAL_SEED)
    ious = []
    for _ in range(2):
        imgs, masks = person_batch(rng, 16, SIZE)
        ious.append(float(trainer.iou(params, jnp.asarray(imgs), jnp.asarray(masks))))
    miou = float(np.mean(ious))
    assert miou >= 0.70, f"held-out mIoU {miou:.3f} below gate"


def _batch_with_people(seed, batch, size):
    """Draw batches until every image has a person (the generator emits
    ~20% person-free negatives by design)."""
    from coma_tpu.models.synthetic_person import person_batch

    rng = np.random.default_rng(seed)
    for _ in range(50):
        imgs, masks = person_batch(rng, batch, size)
        if (masks.reshape(batch, -1).sum(-1) > 0).all():
            return imgs, masks
    raise AssertionError("generator produced no all-person batch in 50 tries")


def test_cross_domain_holdout_iou_gate_smoke(model_and_params):
    """Fast-lane cross-domain gate: one 8-image batch over a 2-scene
    holdout pool; the full 2x16 eval over 8 scenes is the slow-lane test
    below."""
    from coma_tpu.models.segmentation_train import SegTrainer
    from coma_tpu.models.synthetic_person import (
        person_batch_domain,
        rendered_background_pool,
    )

    model, params = model_and_params
    trainer = SegTrainer(model, None)
    pool = rendered_background_pool(EVAL_SEED, n=2, size=SIZE, holdout=True)
    rng = np.random.default_rng(EVAL_SEED + 1)
    imgs, masks = person_batch_domain(
        rng, 8, SIZE, background="rendered_holdout", corrupt=True,
        bg_pool=pool,
    )
    miou = float(trainer.iou(params, jnp.asarray(imgs), jnp.asarray(masks)))
    assert miou >= 0.55, f"cross-domain (8-img smoke) mIoU {miou:.3f}"


@pytest.mark.slow
def test_cross_domain_holdout_iou_gate(model_and_params):
    """CROSS-DOMAIN gate (VERDICT r2 task 4): eval on a distribution the
    checkpoint never trained on — capsule humans composited into
    textured-rasterizer scenes built from HOLDOUT texture classes
    (sinusoid/dots) and shapes (tall shelves), then SD-style corrupted
    (blur/noise/JPEG/jitter). The committed checkpoint trains on the
    procedural + train-pool rendered domains only."""
    from coma_tpu.models.segmentation_train import SegTrainer
    from coma_tpu.models.synthetic_person import (
        person_batch_domain,
        rendered_background_pool,
    )

    model, params = model_and_params
    trainer = SegTrainer(model, None)
    pool = rendered_background_pool(EVAL_SEED, n=8, size=SIZE, holdout=True)
    rng = np.random.default_rng(EVAL_SEED + 1)
    ious = []
    for _ in range(2):
        imgs, masks = person_batch_domain(
            rng, 16, SIZE, background="rendered_holdout", corrupt=True,
            bg_pool=pool,
        )
        ious.append(float(trainer.iou(params, jnp.asarray(imgs), jnp.asarray(masks))))
    miou = float(np.mean(ious))
    assert miou >= 0.60, f"cross-domain holdout mIoU {miou:.3f} below gate"


@pytest.mark.slow
def test_generalizes_across_resolution(model_and_params):
    """The pipeline applies the segmenter at other resolutions (512² in the
    adaptive-mask loop) through the scale-canonical wrapper — which must
    keep quality when the same scene is rendered at 256²."""
    from coma_tpu.models.segmentation import person_probs_canonical

    model, params = model_and_params
    imgs, masks = _batch_with_people(EVAL_SEED + 1, 2, 256)
    probs = np.asarray(person_probs_canonical(model, params, jnp.asarray(imgs)))
    pred = probs >= 0.5
    gt = masks > 0.5
    inter = (pred & gt).reshape(len(imgs), -1).sum(-1)
    union = (pred | gt).reshape(len(imgs), -1).sum(-1)
    iou = float(np.mean(inter / np.maximum(union, 1)))
    assert iou >= 0.55, f"canonical-scale mIoU at 256^2 {iou:.3f}"


def test_segment_human_cli_defaults_to_checkpoint(tmp_path, monkeypatch):
    """segment_human with no --segmenter_params picks up the committed
    checkpoint and emits instance pickles with real (non-random) masks."""
    import pickle

    from PIL import Image

    from coma_tpu.cli import segment_human

    imgs, masks = _batch_with_people(EVAL_SEED + 2, 1, SIZE)
    inp = tmp_path / "inp" / "sc" / "cat" / "asset" / "view_000" / "mask_000" / "prompt"
    inp.mkdir(parents=True)
    Image.fromarray((imgs[0] * 255).astype(np.uint8)).save(inp / "000000.png")

    segment_human.main([
        "--inpaint_dir", str(tmp_path / "inp"),
        "--save_dir", str(tmp_path / "out"),
        "--threshold", "0.5",
    ])
    out = list((tmp_path / "out").rglob("*.pickle"))
    assert len(out) == 1
    with open(out[0], "rb") as fh:
        payload = pickle.load(fh)
    assert payload["pred_masks"].shape[0] >= 1
    # predicted union must overlap the GT mask substantially
    pred = payload["pred_masks"].any(axis=0)
    gt = masks[0] > 0.5
    iou = (pred & gt).sum() / max((pred | gt).sum(), 1)
    assert iou >= 0.5, f"CLI mask IoU {iou:.3f}"
