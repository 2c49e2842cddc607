"""Tests for the segmentation subsystem + mask predictor family."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.models.mask_predictors import (
    AccumulativeBboxAssetExclusionPredictor,
    BoxPromptedHumanPredictor,
    BoxPromptedHumanPredictorWithAssetExclusion,
    DefaultBboxAssetExclusionPredictor,
    PersonMaskPredictor,
    build_predictor,
)
from coma_tpu.models.segmentation import (
    PersonSegmenter,
    connected_instances,
    merge_bbox,
    probs_to_mask,
    seg2bbox,
)


def make_instances(*boxes_scores):
    """Stub mask model: rectangles with scores."""
    def model(image):
        H, W = image.shape[:2]
        out = []
        for (x0, y0, x1, y1), score in boxes_scores:
            m = np.zeros((H, W), bool)
            m[y0:y1, x0:x1] = True
            out.append(dict(mask=m, score=score, bbox=np.array([x0, y0, x1, y1])))
        return out
    return model


def box_fill_model(image, box):
    """Stub box-prompt model: fills the box."""
    H, W = image.shape[:2]
    m = np.zeros((H, W), np.uint8)
    x0, y0, x1, y1 = [int(v) for v in box]
    m[y0:y1, x0:x1] = 1
    return m


IMG = np.zeros((32, 32, 3), np.uint8)


@pytest.mark.slow
def test_segmenter_shapes(rng):
    model = PersonSegmenter()
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    logits = model.apply(params, img)
    assert logits.shape == (2, 32, 32)
    mask = probs_to_mask(logits)
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_connected_instances():
    m = np.zeros((16, 16))
    m[2:6, 2:6] = 1
    m[10:15, 10:15] = 1
    inst = connected_instances(m, min_area=4)
    assert len(inst) == 2
    np.testing.assert_array_equal(inst[0]["bbox"], [2, 2, 6, 6])


def test_seg2bbox_and_merge():
    m = np.zeros((8, 8)); m[2:4, 3:7] = 1
    np.testing.assert_array_equal(seg2bbox(m), [3, 2, 7, 4])
    merged = merge_bbox([np.array([0, 0, 2, 2]), np.array([1, 1, 5, 6])])
    np.testing.assert_array_equal(merged, [0, 0, 5, 6])


def test_person_predictor_merge_modes():
    model = make_instances(((2, 2, 6, 6), 0.9), ((10, 10, 14, 14), 0.95))
    merged = PersonMaskPredictor(model, merge_mode="merge")(IMG)["mask"]
    assert merged[3, 3] == 1 and merged[11, 11] == 1
    maxconf = PersonMaskPredictor(model, merge_mode="max-confidence")(IMG)["mask"]
    assert maxconf[11, 11] == 1 and maxconf[3, 3] == 0


def test_person_predictor_threshold():
    model = make_instances(((2, 2, 6, 6), 0.5))
    out = PersonMaskPredictor(model, threshold=0.8)(IMG)
    assert out["mask"].sum() == 0


def test_box_prompted_refines_to_bbox():
    model = make_instances(((2, 2, 6, 6), 0.9))
    pred = BoxPromptedHumanPredictor(model, box_fill_model)
    out = pred(IMG)["mask"]
    np.testing.assert_array_equal(seg2bbox(out), [2, 2, 6, 6])


def test_asset_exclusion_subtracts():
    model = make_instances(((2, 2, 10, 10), 0.9))
    pred = BoxPromptedHumanPredictorWithAssetExclusion(
        model, box_fill_model,
        asset_bbox_provider=lambda img, hm: np.array([2, 2, 6, 6]),
    )
    out = pred(IMG)
    assert out["mask"][3, 3] == 0      # excluded asset region
    assert out["mask"][8, 8] == 1      # remaining human
    assert out["asset_mask"][3, 3] == 1


def test_default_bbox_exclusion_uses_registered_mask():
    model = make_instances(((0, 0, 12, 12), 0.9))
    pred = DefaultBboxAssetExclusionPredictor(model, box_fill_model)
    default = np.zeros((32, 32)); default[0:4, 0:4] = 1
    pred.register_default_mask(default)
    out = pred(IMG)
    assert out["mask"][1, 1] == 0 and out["mask"][8, 8] == 1


def test_accumulative_bbox_grows():
    model = make_instances(((0, 0, 16, 16), 0.9))
    pred = AccumulativeBboxAssetExclusionPredictor(model, box_fill_model)
    d1 = np.zeros((32, 32)); d1[0:4, 0:4] = 1
    pred.register_default_mask(d1)
    pred(IMG)
    d2 = np.zeros((32, 32)); d2[8:12, 8:12] = 1
    pred.register_default_mask(d2)
    out = pred(IMG)
    # accumulated bbox = union of both seeds -> covers [0:12, 0:12]
    assert out["mask"][6, 6] == 0
    assert out["mask"][14, 14] == 1


@pytest.mark.parametrize("t", ["p", "baseline", "ps", "ps_ae", "s_pdb_ae", "s_db_ae", "s_ab_ae"])
def test_build_predictor_all_types(t):
    model = make_instances(((2, 2, 6, 6), 0.9))
    pred = build_predictor(t, model, box_model=box_fill_model)
    out = pred(IMG)
    assert "mask" in out and "asset_mask" in out and "vis" in out


@pytest.mark.slow
def test_segmenter_training_learns_blobs(rng):
    """A few hundred steps on procedural person-blobs must reach IoU > 0.7
    (the segmenter is trainable, not just an architecture stub)."""
    import optax

    from coma_tpu.models.segmentation import PersonSegmenter, SegmenterConfig
    from coma_tpu.models.segmentation_train import (
        SegTrainer,
        bce_dice_loss,
        synthetic_person_batch,
    )

    trainer = SegTrainer(
        PersonSegmenter(SegmenterConfig(base_channels=8)),
        optax.adamw(3e-3),
    )
    state = trainer.init(jax.random.PRNGKey(0), image_shape=(32, 32))
    step = trainer.make_step()
    losses = []
    for i in range(120):
        imgs, masks = synthetic_person_batch(rng, batch=8, size=32)
        state, loss = step(state, jnp.asarray(imgs), jnp.asarray(masks))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    imgs, masks = synthetic_person_batch(rng, batch=16, size=32)
    iou = float(trainer.iou(state["params"], jnp.asarray(imgs), jnp.asarray(masks)))
    assert iou > 0.7, iou


@pytest.mark.slow
def test_segmenter_training_sharded_matches(rng):
    """The mesh-sharded train step computes the same update as single-device."""
    import optax

    from coma_tpu.models.segmentation import PersonSegmenter, SegmenterConfig
    from coma_tpu.models.segmentation_train import SegTrainer, synthetic_person_batch
    from coma_tpu.parallel.sharding import default_mesh

    trainer = SegTrainer(
        PersonSegmenter(SegmenterConfig(base_channels=8)), optax.adamw(1e-3)
    )
    state = trainer.init(jax.random.PRNGKey(0), image_shape=(32, 32))
    imgs, masks = synthetic_person_batch(rng, batch=8, size=32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)

    s1, l1 = trainer.make_step()(state, imgs, masks)
    s8, l8 = trainer.make_step(mesh=default_mesh())(state, imgs, masks)
    assert abs(float(l1) - float(l8)) < 1e-5
    # Adam's rsqrt of near-zero second moments amplifies f32 reduction-order
    # differences at step 1; ~1e-3 on the params is the expected noise floor
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     s1["params"], s8["params"])
    assert max(jax.tree.leaves(d)) < 5e-3
