"""PointRend R50-FPN: converter parity vs the torch mirror + pipeline tests.

Proves that a checkpoint with detectron2's key layout (the published
``model_final_edd263.pkl``) converts onto our Flax model and reproduces the
torch numerics module by module — the reference's out-of-the-box person
segmentation path (``utils/adaptive_mask_inpainting.py:1182``,
``src/generation/segment_human.py:24``).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from coma_tpu.models import pointrend as pr
from coma_tpu.models.torch_weights_pointrend import convert_pointrend
from coma_tpu.ops.sampling import grid_sample_bilinear, point_sample, roi_align

from tests import torch_pointrend_mirror as mirror


def _seed_all(s=0):
    torch.manual_seed(s)
    return np.random.default_rng(s)


# ------------------------------------------------------------------ ops


def test_grid_sample_matches_torch():
    rng = _seed_all()
    feat = rng.normal(size=(13, 17, 5)).astype(np.float32)
    coords = rng.uniform(-0.1, 1.1, size=(64, 2)).astype(np.float32)  # incl. OOB
    ours = grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(coords))
    theirs = mirror.point_sample_torch(
        torch.from_numpy(feat).permute(2, 0, 1)[None],
        torch.from_numpy(coords)[None],
    )[0].T.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@pytest.mark.slow
def test_roi_align_matches_torch_and_linear_ramp():
    rng = _seed_all()
    feat = rng.normal(size=(32, 48, 4)).astype(np.float32)
    boxes = np.array(
        [[4.0, 8.0, 60.0, 100.0], [0.0, 0.0, 30.0, 30.0], [50.0, 20.0, 90.0, 120.0]],
        np.float32,
    )
    ours = roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 0.25)
    theirs = mirror.roi_align_torch(
        torch.from_numpy(feat).permute(2, 0, 1)[None], torch.from_numpy(boxes), 7, 0.25
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=1e-5
    )
    # independent analytic check: a linear ramp f(x, y) = x averages to the
    # bin-center x under any symmetric quadrature (interior boxes)
    H = W = 64
    ramp = np.broadcast_to(
        np.arange(W, dtype=np.float32)[None, :, None], (H, W, 1)
    ).copy()
    box = np.array([[8.0, 8.0, 40.0, 40.0]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(ramp), jnp.asarray(box), 4, 1.0))[0, ..., 0]
    fx0 = 8.0 - 0.5
    bw = 32.0
    centers = fx0 + (np.arange(4) + 0.5) / 4 * bw
    np.testing.assert_allclose(out[2], centers, atol=1e-4)


def test_decode_deltas_matches_torch():
    rng = _seed_all()
    anchors = np.abs(rng.normal(size=(20, 4)).astype(np.float32)) * 50
    anchors[:, 2:] += anchors[:, :2] + 1
    deltas = rng.normal(size=(20, 4)).astype(np.float32)
    for w in ((1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)):
        ours = pr.decode_deltas(jnp.asarray(anchors), jnp.asarray(deltas), w)
        theirs = mirror.decode_deltas_torch(
            torch.from_numpy(anchors), torch.from_numpy(deltas), w
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_greedy_nms_matches_numpy_oracle():
    rng = _seed_all()
    boxes = rng.uniform(0, 100, size=(50, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(50, 2)).astype(np.float32)
    scores = np.sort(rng.uniform(size=50).astype(np.float32))[::-1].copy()
    keep = np.asarray(pr.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.maximum(rb - lt, 0)
        inter = wh[0] * wh[1]
        area = lambda x: (x[2] - x[0]) * (x[3] - x[1])
        return inter / (area(a) + area(b) - inter)

    ref_keep = np.zeros(50, bool)
    for i in range(50):
        ref_keep[i] = not any(ref_keep[j] and iou(boxes[i], boxes[j]) > 0.5 for j in range(i))
    np.testing.assert_array_equal(keep, ref_keep)


def test_anchor_layout():
    anchors = pr.generate_anchors([(4, 6)])[0]
    assert anchors.shape == (4 * 6 * 3, 4)
    # first anchor: ratio 0.5 at (0, 0): w = sqrt(32^2 / 0.5), h = 0.5 w
    w = np.sqrt(32.0**2 / 0.5)
    np.testing.assert_allclose(anchors[0], [-w / 2, -w / 4, w / 2, w / 4], rtol=1e-6)
    # anchor at grid (y=0, x=1) starts at index A (H, W, A order)
    np.testing.assert_allclose(anchors[3, 0] - anchors[0, 0], 4.0)  # stride 4


# ------------------------------------------------------------- converter


@pytest.fixture(scope="module")
def mirror_and_params():
    _seed_all(7)
    m = mirror.PointRendRCNNMirror().eval()
    # randomize frozen BN stats so parity exercises them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, mirror.FrozenBN):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
                mod.weight.copy_(torch.rand_like(mod.weight) + 0.5)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)
    sd = {k: v for k, v in m.state_dict().items() if "._box." not in k}
    variables = convert_pointrend(sd)
    return m, variables


@pytest.fixture(scope="module")
def flax_model():
    return pr.PointRendModel(pr.PointRendConfig(pre_nms_topk=200, post_nms_topk=100,
                                                box_candidates=100, max_detections=10))


@pytest.mark.slow
def test_backbone_fpn_parity(mirror_and_params, flax_model):
    m, variables = mirror_and_params
    rng = np.random.default_rng(1)
    img = rng.normal(size=(96, 128, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = m.backbone(torch.from_numpy(img).permute(2, 0, 1)[None])
    ffeats = flax_model.apply(
        variables, jnp.asarray(img), method=pr.PointRendModel.features
    )
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        ours = np.asarray(ffeats[lvl])
        theirs = tfeats[lvl][0].permute(1, 2, 0).numpy()
        # activations reach O(100) after 50 random-init conv layers; compare
        # with a magnitude-aware tolerance (f32 accumulation-order noise)
        tol = 2e-5 * max(1.0, float(np.abs(theirs).max()))
        np.testing.assert_allclose(ours, theirs, atol=tol, err_msg=lvl)


def test_box_head_parity(mirror_and_params, flax_model):
    m, variables = mirror_and_params
    rng = np.random.default_rng(2)
    roi = rng.normal(size=(5, 7, 7, 256)).astype(np.float32)
    with torch.no_grad():
        ts, td = m.roi_heads.box_forward(torch.from_numpy(roi.transpose(0, 3, 1, 2)))
    fs, fd = flax_model.apply(
        variables, jnp.asarray(roi),
        method=lambda mdl, x: mdl.box_head(x),
    )
    np.testing.assert_allclose(np.asarray(fs), ts.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fd), td.numpy(), atol=1e-4)


def test_coarse_head_parity(mirror_and_params, flax_model):
    m, variables = mirror_and_params
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 14, 14, 256)).astype(np.float32)
    with torch.no_grad():
        t = m.roi_heads.mask_head.coarse_head(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f = flax_model.apply(
        variables, jnp.asarray(x), method=lambda mdl, v: mdl.coarse_head(v)
    )
    np.testing.assert_allclose(np.asarray(f), t.numpy(), atol=1e-4)


def test_point_head_parity(mirror_and_params, flax_model):
    m, variables = mirror_and_params
    rng = np.random.default_rng(4)
    fine = rng.normal(size=(3, 50, 256)).astype(np.float32)
    coarse = rng.normal(size=(3, 50, 80)).astype(np.float32)
    with torch.no_grad():
        t = m.roi_heads.mask_head.point_head(
            torch.from_numpy(fine.transpose(0, 2, 1)),
            torch.from_numpy(coarse.transpose(0, 2, 1)),
        )
    f = flax_model.apply(
        variables, jnp.asarray(fine), jnp.asarray(coarse),
        method=lambda mdl, a, b: mdl.point_head(a, b),
    )
    np.testing.assert_allclose(
        np.asarray(f), t.numpy().transpose(0, 2, 1), atol=1e-4
    )


def test_rpn_head_parity(mirror_and_params, flax_model):
    m, variables = mirror_and_params
    rng = np.random.default_rng(5)
    feat = rng.normal(size=(24, 32, 256)).astype(np.float32)
    with torch.no_grad():
        (tobj, tdel), = m.proposal_generator.rpn_head(
            [torch.from_numpy(feat.transpose(2, 0, 1))[None]]
        )
    (fobj, fdel), = flax_model.apply(
        variables, [jnp.asarray(feat)[None]],
        method=lambda mdl, fs: mdl.rpn_head(fs),
    )
    np.testing.assert_allclose(
        np.asarray(fobj[0]), tobj[0].permute(1, 2, 0).numpy(), atol=1e-4
    )
    # deltas: torch channel a*4+k == NHWC reshape (..., A, 4)
    np.testing.assert_allclose(
        np.asarray(fdel[0]).reshape(24, 32, 12),
        tdel[0].permute(1, 2, 0).numpy(),
        atol=1e-4,
    )


# ---------------------------------------------------------------- e2e


def test_full_inference_smoke(mirror_and_params, flax_model):
    """The whole detector jits and returns a sane padded-instance dict."""
    _, variables = mirror_and_params
    rng = np.random.default_rng(6)
    img = rng.normal(size=(96, 128, 3)).astype(np.float32) * 10
    det = jax.jit(lambda v, x: flax_model.apply(v, x))(variables, jnp.asarray(img))
    assert det["boxes"].shape == (10, 4)
    assert det["mask_logits"].shape == (10, 224, 224)
    assert det["valid"].dtype == bool
    v = np.asarray(det["valid"])
    boxes = np.asarray(det["boxes"])[v]
    assert np.all(boxes[:, 2] >= boxes[:, 0]) and np.all(boxes[:, 3] >= boxes[:, 1])
    assert np.all(np.asarray(det["scores"])[~v] == 0)


def test_paste_masks_roundtrip():
    logits = np.full((1, 224, 224), -10.0, np.float32)
    logits[0, 56:168, 56:168] = 10.0  # central half of the box
    boxes = np.array([[20.0, 30.0, 60.0, 70.0]], np.float32)
    out = pr.paste_masks(logits, boxes, (100, 100))
    ys, xs = np.nonzero(out[0])
    # central half of the 40x40 box => roughly rows 40..60, cols 30..50
    assert 35 <= ys.min() <= 42 and 58 <= ys.max() <= 65
    assert 25 <= xs.min() <= 32 and 48 <= xs.max() <= 55


def test_merged_person_mask_fabricated_det():
    """In-jit paste+merge on a hand-built detection dict: two person boxes
    merge, a non-person and an invalid slot are excluded."""
    S = 8
    logits = np.full((4, S, S), 10.0, np.float32)  # all-inside masks
    det = {
        "boxes": jnp.asarray(
            [[10, 10, 30, 30], [40, 40, 60, 60], [0, 0, 80, 80], [20, 20, 70, 70]],
            jnp.float32,
        ),
        "classes": jnp.asarray([0, 0, 5, 0]),
        "scores": jnp.asarray([0.9, 0.95, 0.99, 0.9]),
        "valid": jnp.asarray([True, True, True, False]),
        "mask_logits": jnp.asarray(logits),
    }
    mask = np.asarray(
        jax.jit(
            lambda d: pr.merged_person_mask(d, (80, 80), (1.0, 1.0), 0.8)
        )(det)
    )
    assert mask[20, 20] and mask[50, 50]  # both person boxes
    assert not mask[5, 5]  # outside both; class-5 box excluded
    assert not mask[35, 70]  # invalid slot's box excluded


def test_merged_person_mask_matches_gather_oracle():
    """The separable-matmul paste (W_y @ logits @ W_x^T with relu-triangle
    tap weights — the MXU form) must reproduce the gather-based bilinear
    paste exactly: grid_sample at p = coord*S - 0.5 with zero padding, per
    detection, merged with |. Randomized boxes incl. partially and fully
    out-of-frame ones."""
    rng = _seed_all(7)
    R, S, H, W = 6, 28, 96, 96

    def oracle(det, stride):
        ph, pw = H // stride, W // stride
        boxes = np.asarray(det["boxes"]) * np.asarray([0.9, 1.1, 0.9, 1.1])
        keep = (np.asarray(det["valid"]) & (np.asarray(det["classes"]) == 0)
                & (np.asarray(det["scores"]) >= 0.8))
        logits = np.asarray(det["mask_logits"], np.float32)
        ys = (np.arange(ph) + 0.5) * (H / ph)
        xs = (np.arange(pw) + 0.5) * (W / pw)
        merged = np.zeros((ph, pw), bool)
        for r in range(R):
            b = boxes[r]
            u = (xs[None, :] - b[0]) / max(b[2] - b[0], 1e-6)
            v = (ys[:, None] - b[1]) / max(b[3] - b[1], 1e-6)
            inside = (u > 0) & (u < 1) & (v > 0) & (v < 1)
            coords = np.stack([np.broadcast_to(u, (ph, pw)),
                               np.broadcast_to(v, (ph, pw))], -1)
            vals = np.asarray(grid_sample_bilinear(
                jnp.asarray(logits[r])[..., None], jnp.asarray(coords)))[..., 0]
            merged |= (vals > 0) & inside & bool(keep[r])
        if stride > 1:
            merged = np.repeat(np.repeat(merged, stride, 0), stride, 1)
        return merged

    x0y0 = rng.uniform(-20, W, (R, 2))
    wh = rng.uniform(4, 80, (R, 2))
    det = {
        "boxes": jnp.asarray(np.concatenate([x0y0, x0y0 + wh], -1), jnp.float32),
        "valid": jnp.asarray(rng.random(R) > 0.2),
        "classes": jnp.asarray(rng.integers(0, 2, R)),
        "scores": jnp.asarray(rng.uniform(0.5, 1.0, R), jnp.float32),
        "mask_logits": jnp.asarray(rng.normal(0, 2, (R, S, S)), jnp.float32),
    }
    for stride in (1, 2):
        ours = np.asarray(pr.merged_person_mask(
            det, (H, W), (1.1, 0.9), paste_stride=stride))
        np.testing.assert_array_equal(ours, oracle(det, stride))


@pytest.mark.slow
def test_pointrend_segment_fn_smoke(mirror_and_params):
    """The batched in-scan segment_fn jits at a tiny test size and returns
    binary masks of the input resolution."""
    _, variables = mirror_and_params
    cfg = pr.PointRendConfig(
        max_detections=4, test_size=64, pre_nms_topk=64, post_nms_topk=32,
        box_candidates=32,
    )
    model = pr.PointRendModel(cfg)
    fn = pr.make_pointrend_segment_fn(model)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 96, 96, 3)),
                       jnp.float32)
    masks = jax.jit(fn)({"pointrend": variables}, imgs)
    assert masks.shape == (2, 96, 96)
    m = np.asarray(masks)
    assert set(np.unique(m)).issubset({0.0, 1.0})


@pytest.mark.slow
def test_person_segmenter_adapter(mirror_and_params):
    """Host adapter returns MaskModel-style instance dicts."""
    _, variables = mirror_and_params
    cfg = pr.PointRendConfig(
        max_detections=4, test_size=64, pre_nms_topk=64, post_nms_topk=32,
        box_candidates=32,
    )
    seg = pr.PointRendPersonSegmenter(variables, cfg, score_thresh=0.0)
    img = (np.random.default_rng(1).uniform(size=(96, 96, 3)) * 255).astype(np.uint8)
    instances = seg(img)
    for inst in instances:
        assert inst["mask"].shape == (96, 96)
        assert inst["bbox"].shape == (4,)
        assert inst["pred_class"] == 0


def test_merged_person_mask_paste_stride_latent_agreement():
    """``paste_stride=8`` (the in-loop accelerator) must leave the *latent*
    mask — the only thing the provoke step keeps after dilate ∧ default-mask
    ∧ stride-8 downsample — unchanged except at cells whose 8x8 pixel block
    straddles the stride-1 mask's pixel-level boundary (±1 cell)."""
    from coma_tpu.models.diffusion.pipeline import (
        binarize_mask, dilate_mask, downsample_mask)

    H = 128
    # solid elliptical logits — the shape class a 28x28 mask-head logit grid
    # actually emits (smooth blob, positive interior). paste_stride is NOT
    # claimed safe for sub-8px filigree; person masks aren't that.
    yy, xx = np.mgrid[0:28, 0:28]
    def blob(cy, cx, ry, rx):
        r = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        return (4.0 * (1.0 - r)).astype(np.float32)
    logits = np.stack([blob(14, 13, 11, 9), blob(12, 15, 9, 12),
                       blob(15, 14, 12, 7)])
    det = {
        "boxes": jnp.asarray(
            [[12, 9, 70, 101], [40, 33, 118, 120], [5, 60, 90, 126]], jnp.float32),
        "classes": jnp.zeros((3,), jnp.int32),
        "scores": jnp.asarray([0.9, 0.95, 0.9]),
        "valid": jnp.ones((3,), bool),
        "mask_logits": jnp.asarray(logits),
    }
    default_mask = np.zeros((1, H, H), np.float32)
    default_mask[:, 8:120, 4:124] = 1.0
    default_mask = jnp.asarray(default_mask)

    def latent_mask(stride):
        m = pr.merged_person_mask(det, (H, H), (1.0, 1.0), 0.5,
                                  paste_stride=stride)
        grown = dilate_mask(m[None].astype(jnp.float32), jnp.asarray(3))
        adapted = jnp.logical_and(grown > 0, default_mask > 0).astype(jnp.float32)
        lat = np.asarray(downsample_mask(binarize_mask(adapted), 8))
        L = H // 8
        return lat.reshape(L, L) > 0.5, np.asarray(adapted[0]) > 0.5

    (l1, full1), (l8, _) = latent_mask(1), latent_mask(8)
    assert l1.any() and l8.any()

    def box3(a, op):  # 3x3 morphology in plain numpy
        p = np.pad(a, 1, constant_values=False)
        h, w = a.shape
        return op([p[i:i + h, j:j + w] for i in range(3) for j in range(3)],
                  axis=0)

    # a latent cell may change only if its 8x8 pixel block (or a neighbor's)
    # straddles the stride-1 pixel-level boundary
    L = H // 8
    blocks = full1.reshape(L, 8, L, 8).transpose(0, 2, 1, 3).reshape(L, L, 64)
    straddles = blocks.any(-1) & ~blocks.all(-1)
    allowed = box3(straddles, np.any)
    diff = l1 != l8
    assert not (diff & ~allowed).any(), "stride-8 changed a cell away from the boundary"
    # this tiny 16x16-latent fixture is boundary-dominated; the realistic-
    # scale IoU check lives in test_paste_stride_realistic_scale
    iou = (l1 & l8).sum() / max((l1 | l8).sum(), 1)
    assert iou >= 0.7, iou


def test_paste_stride_realistic_scale():
    """At production scale (512 px image, person-sized box, dilate 10) the
    stride-4 latent mask is near-identical to stride-1 — the basis for
    paste_stride=4 as the in-loop default."""
    from coma_tpu.models.diffusion.pipeline import (
        binarize_mask, dilate_mask, downsample_mask)

    H = 512
    yy, xx = np.mgrid[0:28, 0:28]
    r = ((yy - 14) / 12.0) ** 2 + ((xx - 14) / 10.0) ** 2
    det = {
        "boxes": jnp.asarray([[150, 60, 360, 470]], jnp.float32),
        "classes": jnp.zeros((1,), jnp.int32),
        "scores": jnp.asarray([0.95]),
        "valid": jnp.ones((1,), bool),
        "mask_logits": jnp.asarray((4.0 * (1.0 - r)).astype(np.float32)[None]),
    }

    def latent_mask(stride):
        m = pr.merged_person_mask(det, (H, H), (1.0, 1.0), 0.5,
                                  paste_stride=stride)
        grown = dilate_mask(m[None].astype(jnp.float32), jnp.asarray(10))
        lat = np.asarray(downsample_mask(binarize_mask(grown), 8))
        return lat.reshape(64, 64) > 0.5

    l1, l4 = latent_mask(1), latent_mask(4)
    iou = (l1 & l4).sum() / (l1 | l4).sum()
    assert iou >= 0.99, iou


@pytest.mark.slow
def test_pointrend_segment_fn_bf16_smoke(mirror_and_params):
    """The bf16 compute path jits and stays binary; box scores/NMS remain
    f32 so detection count matches the f32 path on an easy input."""
    _, variables = mirror_and_params
    cfg = pr.PointRendConfig(
        max_detections=4, test_size=64, pre_nms_topk=64, post_nms_topk=32,
        box_candidates=32,
    )
    model = pr.PointRendModel(cfg)
    fn = pr.make_pointrend_segment_fn(
        model, compute_dtype=jnp.bfloat16, paste_stride=8)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 96, 96, 3)),
                       jnp.float32)
    masks = jax.jit(fn)({"pointrend": variables}, imgs)
    assert masks.shape == (2, 96, 96)
    assert set(np.unique(np.asarray(masks))).issubset({0.0, 1.0})


def test_preprocess_shapes():
    img = np.zeros((512, 512, 3), np.uint8)
    cfg = pr.PointRendConfig(test_size=160)
    net_in, scale = pr.preprocess_image(img, cfg)
    assert net_in.shape == (160, 160, 3)
    assert scale == (512 / 160, 512 / 160)
