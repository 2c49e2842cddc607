"""Tests for the Flax SAM (coma_tpu.models.sam) + its weight converter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coma_tpu.models.sam import (
    SAM,
    SAMConfig,
    get_rel_pos,
    make_box_model,
    preprocess_image,
    sam_predict_box,
    tiny_sam_config,
    window_partition,
    window_unpartition,
)


def test_get_rel_pos_equal_sizes():
    """Equal q/k sizes: entry [i, j] must be table[(i - j) + k - 1]."""
    k = 5
    table = jnp.asarray(np.random.default_rng(0).normal(size=(2 * k - 1, 4)))
    out = get_rel_pos(k, k, table)
    for i in range(k):
        for j in range(k):
            np.testing.assert_allclose(out[i, j], table[i - j + k - 1])


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 7, 5, 3)).astype(np.float32))
    wins, pad_hw = window_partition(x, 4)
    assert wins.shape == (2 * 2 * 2, 4, 4, 3)
    back = window_unpartition(wins, 4, pad_hw, (7, 5))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = tiny_sam_config()
    model = SAM(cfg)
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 56.0]])
    variables = model.init(jax.random.PRNGKey(0), img, boxes)
    return cfg, model, variables


@pytest.mark.slow
def test_sam_forward_shapes(tiny_sam, rng):
    cfg, model, variables = tiny_sam
    img = jnp.asarray(rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 56.0], [0.0, 0.0, 63.0, 63.0]])
    logits, iou = jax.jit(model.apply)(variables, img, boxes)
    g = cfg.grid
    assert logits.shape == (2, 4 * g, 4 * g)
    assert iou.shape == (2,)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_sam_predict_box_end_to_end(tiny_sam, rng):
    cfg, model, variables = tiny_sam
    image = (rng.random((48, 32, 3)) * 255).astype(np.uint8)  # non-square
    mask = sam_predict_box(model, variables, image, np.array([4, 4, 24, 40]))
    assert mask.shape == (48, 32)
    assert set(np.unique(mask)) <= {0, 1}


@pytest.mark.slow
def test_sam_as_box_model_in_predictor(tiny_sam, rng):
    """SAM plugs into the reference's 'ps' predictor dispatch."""
    from coma_tpu.models.mask_predictors import build_predictor

    cfg, model, variables = tiny_sam
    image = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    person = np.zeros((64, 64), bool)
    person[10:50, 20:40] = True
    mask_model = lambda img: [{"mask": person, "score": 0.95}]
    pred = build_predictor("ps", mask_model, make_box_model(model, variables))
    out = pred(image)
    assert out["mask"].shape == (64, 64)


def test_preprocess_pads_to_square():
    img = np.full((100, 50, 3), 128, np.uint8)
    out = preprocess_image(img, img_size=64)
    assert out.shape == (1, 64, 64, 3)
    # right half beyond the resized width (32 px) must be zero padding
    np.testing.assert_array_equal(np.asarray(out[0, :, 40:, :]), 0.0)


# --------------------------------------------------------------------------
# converter: official checkpoint key layout -> our tree, validated by apply
# --------------------------------------------------------------------------

def _official_tiny_state_dict(cfg: SAMConfig, rng):
    """Synthesize a sam_vit_b-layout state dict for the tiny config."""
    torch = pytest.importorskip("torch")

    sd = {}
    t = lambda *s: torch.from_numpy(rng.normal(size=s).astype(np.float32) * 0.05)
    C, d = cfg.embed_dim, cfg.prompt_dim
    head = C // cfg.num_heads
    g = cfg.grid

    sd["image_encoder.patch_embed.proj.weight"] = t(C, 3, cfg.patch_size, cfg.patch_size)
    sd["image_encoder.patch_embed.proj.bias"] = t(C)
    sd["image_encoder.pos_embed"] = t(1, g, g, C)
    for i in range(cfg.depth):
        p = f"image_encoder.blocks.{i}"
        size = g if i in cfg.global_attn_indexes else cfg.window_size
        sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"] = t(C), t(C)
        sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"] = t(C), t(C)
        sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"] = t(3 * C, C), t(3 * C)
        sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"] = t(C, C), t(C)
        sd[f"{p}.attn.rel_pos_h"] = t(2 * size - 1, head)
        sd[f"{p}.attn.rel_pos_w"] = t(2 * size - 1, head)
        hidden = int(C * cfg.mlp_ratio)
        sd[f"{p}.mlp.lin1.weight"], sd[f"{p}.mlp.lin1.bias"] = t(hidden, C), t(hidden)
        sd[f"{p}.mlp.lin2.weight"], sd[f"{p}.mlp.lin2.bias"] = t(C, hidden), t(C)
    sd["image_encoder.neck.0.weight"] = t(d, C, 1, 1)
    sd["image_encoder.neck.1.weight"], sd["image_encoder.neck.1.bias"] = t(d), t(d)
    sd["image_encoder.neck.2.weight"] = t(d, d, 3, 3)
    sd["image_encoder.neck.3.weight"], sd["image_encoder.neck.3.bias"] = t(d), t(d)

    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = t(2, d // 2)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = t(1, d)
    sd["prompt_encoder.no_mask_embed.weight"] = t(1, d)

    def attn(p, ds):
        inner = d // ds
        sd[f"{p}.q_proj.weight"], sd[f"{p}.q_proj.bias"] = t(inner, d), t(inner)
        sd[f"{p}.k_proj.weight"], sd[f"{p}.k_proj.bias"] = t(inner, d), t(inner)
        sd[f"{p}.v_proj.weight"], sd[f"{p}.v_proj.bias"] = t(inner, d), t(inner)
        sd[f"{p}.out_proj.weight"], sd[f"{p}.out_proj.bias"] = t(d, inner), t(d)

    for i in range(2):
        p = f"mask_decoder.transformer.layers.{i}"
        attn(f"{p}.self_attn", 1)
        attn(f"{p}.cross_attn_token_to_image", 2)
        attn(f"{p}.cross_attn_image_to_token", 2)
        for n in range(1, 5):
            sd[f"{p}.norm{n}.weight"], sd[f"{p}.norm{n}.bias"] = t(d), t(d)
        sd[f"{p}.mlp.lin1.weight"], sd[f"{p}.mlp.lin1.bias"] = t(2048, d), t(2048)
        sd[f"{p}.mlp.lin2.weight"], sd[f"{p}.mlp.lin2.bias"] = t(d, 2048), t(d)
    attn("mask_decoder.transformer.final_attn_token_to_image", 2)
    sd["mask_decoder.transformer.norm_final_attn.weight"] = t(d)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = t(d)

    n_masks = cfg.num_multimask_outputs + 1
    sd["mask_decoder.iou_token.weight"] = t(1, d)
    sd["mask_decoder.mask_tokens.weight"] = t(n_masks, d)
    sd["mask_decoder.output_upscaling.0.weight"] = t(d, d // 4, 2, 2)
    sd["mask_decoder.output_upscaling.0.bias"] = t(d // 4)
    sd["mask_decoder.output_upscaling.1.weight"] = t(d // 4)
    sd["mask_decoder.output_upscaling.1.bias"] = t(d // 4)
    sd["mask_decoder.output_upscaling.3.weight"] = t(d // 4, d // 8, 2, 2)
    sd["mask_decoder.output_upscaling.3.bias"] = t(d // 8)
    for i in range(n_masks):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        sd[f"{p}.layers.0.weight"], sd[f"{p}.layers.0.bias"] = t(d, d), t(d)
        sd[f"{p}.layers.1.weight"], sd[f"{p}.layers.1.bias"] = t(d, d), t(d)
        sd[f"{p}.layers.2.weight"], sd[f"{p}.layers.2.bias"] = t(d // 8, d), t(d // 8)
    p = "mask_decoder.iou_prediction_head"
    sd[f"{p}.layers.0.weight"], sd[f"{p}.layers.0.bias"] = t(d, d), t(d)
    sd[f"{p}.layers.1.weight"], sd[f"{p}.layers.1.bias"] = t(d, d), t(d)
    sd[f"{p}.layers.2.weight"], sd[f"{p}.layers.2.bias"] = t(n_masks, d), t(n_masks)
    return sd


@pytest.mark.slow
def test_convert_sam_full_tree(rng):
    from coma_tpu.models.torch_weights_sam import convert_sam

    cfg = tiny_sam_config()
    sd = _official_tiny_state_dict(cfg, rng)
    variables = convert_sam(sd, depth=cfg.depth)
    model = SAM(cfg)
    img = jnp.asarray(rng.normal(size=(1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    logits, iou = model.apply(variables, img, jnp.asarray([[4.0, 4.0, 40.0, 56.0]]))
    assert logits.shape == (1, 4 * cfg.grid, 4 * cfg.grid)
    assert np.isfinite(np.asarray(logits)).all()

    # converted tree must match the model's own init EXACTLY in structure
    init = SAM(cfg).init(jax.random.PRNGKey(0), img, jnp.zeros((1, 4)))
    conv_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_leaves_with_path(variables)}
    init_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_leaves_with_path(init)}
    assert conv_paths == init_paths


def test_upscale_convtranspose_k2s2_parity():
    """torch ConvTranspose2d(k=2, s=2, p=0) == flax 'SAME' + flipped kernel
    (the mask-decoder upscaling shape)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tn
    import flax.linen as fnn
    from coma_tpu.models.torch_weights import t2f_conv_transpose

    tc = tn.ConvTranspose2d(6, 3, 2, 2, 0)
    x = np.random.default_rng(3).normal(size=(1, 6, 5, 5)).astype(np.float32)
    with torch.no_grad():
        yt = tc(torch.from_numpy(x)).numpy()
    sd = {"u.weight": tc.weight, "u.bias": tc.bias}
    fl = fnn.ConvTranspose(3, (2, 2), strides=(2, 2), padding="SAME")
    yj = fl.apply({"params": t2f_conv_transpose(sd, "u")},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert yj.shape == (1, 10, 10, 3)
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), yt, atol=1e-5)


def test_mask_to_bbox_traced():
    from coma_tpu.models.sam import mask_to_bbox_traced

    m = np.zeros((10, 12), np.float32)
    m[3:7, 4:9] = 1
    box = np.asarray(jax.jit(mask_to_bbox_traced)(jnp.asarray(m)))
    np.testing.assert_array_equal(box, [4, 3, 8, 6])
    empty = np.asarray(mask_to_bbox_traced(jnp.zeros((10, 12))))
    np.testing.assert_array_equal(empty, [0, 0, 11, 9])


@pytest.mark.slow
def test_sam_segment_fn_in_pipeline(tiny_sam, rng):
    """'ps' mode fully in-scan: tiny SAM as the pipeline's segment_fn."""
    from coma_tpu.models.diffusion.pipeline import (
        AdaptiveMaskConfig,
        AdaptiveMaskInpaintPipeline,
    )
    from coma_tpu.models.diffusion.unet import UNet2DCondition, tiny_unet_config
    from coma_tpu.models.diffusion.vae import Decoder, Encoder, tiny_vae_config
    from coma_tpu.models.sam import make_sam_segment_fn

    cfg, sam_model, sam_vars = tiny_sam
    H = cfg.img_size  # 64
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    unet, enc, dec = UNet2DCondition(ucfg), Encoder(vcfg), Decoder(vcfg)
    k = jax.random.PRNGKey(0)
    params = dict(
        unet=unet.init(k, jnp.zeros((1, 8, 8, 9)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim))),
        vae_encoder=enc.init(k, jnp.zeros((1, H, H, 3))),
        vae_decoder=dec.init(k, jnp.zeros((1, 8, 8, 4))),
        sam=sam_vars,
    )
    seed_fn = lambda prm, imgs: (imgs.mean(-1) > 0.6).astype(jnp.float32)
    pipe = AdaptiveMaskInpaintPipeline(
        unet_fn=lambda prm, lat, t, ctx: unet.apply(prm["unet"], lat, t, ctx),
        vae_encode_fn=lambda prm, img: enc.apply(prm["vae_encoder"], img),
        vae_decode_fn=lambda prm, lat: dec.apply(prm["vae_decoder"], lat),
        segment_fn=make_sam_segment_fn(sam_model, seed_fn),
        config=AdaptiveMaskConfig(num_inference_steps=50),
    )
    img = jnp.asarray(rng.uniform(-1, 1, size=(1, H, H, 3)), jnp.float32)
    mask = jnp.ones((1, H, H))
    ctx = jnp.asarray(rng.normal(size=(1, 7, 32)), jnp.float32)
    out = jax.jit(pipe.generate_p)(params, jax.random.PRNGKey(1), img, mask,
                                   ctx, jnp.zeros_like(ctx))
    o = np.asarray(out)
    assert o.shape == (1, H, H, 3) and np.isfinite(o).all()
