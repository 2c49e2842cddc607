"""Tests for the diffusers->Flax weight mapping (synthetic checkpoints)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.models.diffusion.clip_text import CLIPTextEncoder, tiny_clip_config
from coma_tpu.models.diffusion.unet import UNet2DCondition, tiny_unet_config
from coma_tpu.models.diffusion.vae import Decoder, Encoder, tiny_vae_config
from coma_tpu.models.diffusion.weights import (
    convert_clip_text,
    convert_unet,
    convert_vae,
)


def flax_to_torch_sd(tree, prefix="", renames=None):
    """Invert the converter's shape conventions to fabricate a torch-style
    state dict from a flax param tree (for round-trip testing)."""
    sd = {}

    def walk(node, path):
        if isinstance(node, dict) and "kernel" in node:
            k = np.asarray(node["kernel"])
            name = renames(path) if renames else path
            if k.ndim == 4:   # conv: (kh, kw, I, O) -> (O, I, kh, kw)
                sd[f"{name}.weight"] = np.transpose(k, (3, 2, 0, 1))
            else:             # dense: (I, O) -> (O, I)
                sd[f"{name}.weight"] = k.T
            if "bias" in node:
                sd[f"{name}.bias"] = np.asarray(node["bias"])
        elif isinstance(node, dict) and "scale" in node:
            name = renames(path) if renames else path
            sd[f"{name}.weight"] = np.asarray(node["scale"])
            sd[f"{name}.bias"] = np.asarray(node["bias"])
        elif isinstance(node, dict) and "embedding" in node:
            name = renames(path) if renames else path
            sd[f"{name}.weight"] = np.asarray(node["embedding"])
        elif isinstance(node, dict):
            for key, sub in node.items():
                walk(sub, f"{path}.{key}" if path else key)
        else:
            name = renames(path) if renames else path
            sd[f"{name}.weight"] = np.asarray(node)

    walk(tree, prefix)
    return sd


def unet_rename(path: str) -> str:
    """Our flax param path -> the diffusers name the converter expects."""
    import re

    p = path
    p = p.replace("time_embed_0", "time_embedding.linear_1")
    p = p.replace("time_embed_2", "time_embedding.linear_2")
    p = re.sub(r"down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", p)
    p = re.sub(r"down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2", p)
    p = re.sub(r"down_(\d+)_downsample\.conv", r"down_blocks.\1.downsamplers.0.conv", p)
    p = p.replace("mid_res_0", "mid_block.resnets.0")
    p = p.replace("mid_res_1", "mid_block.resnets.1")
    p = p.replace("mid_attn", "mid_block.attentions.0")

    def up(m):
        k = 3 - int(m.group(1))  # ours up_i == diffusers up_blocks[3 - i]
        return f"up_blocks.{k}.{m.group(2)}"

    p = re.sub(r"up_(\d+)_res_(\d+)", lambda m: up_sub(m, "resnets"), p)
    p = re.sub(r"up_(\d+)_attn_(\d+)", lambda m: up_sub(m, "attentions"), p)
    p = re.sub(r"up_(\d+)_upsample\.conv", lambda m: f"up_blocks.{3 - int(m.group(1))}.upsamplers.0.conv", p)
    p = p.replace("block0.", "transformer_blocks.0.")
    p = p.replace("ff.proj_in", "ff.net.0.proj")
    p = p.replace("ff.proj_out", "ff.net.2")
    p = re.sub(r"attn(\d)\.to_out", r"attn\1.to_out.0", p)
    return p


def up_sub(m, kind):
    k = 3 - int(m.group(1))
    return f"up_blocks.{k}.{kind}.{m.group(2)}"


@pytest.mark.slow
def test_unet_roundtrip(rng):
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 9)), jnp.float32)
    t = jnp.asarray([10.0])
    ctx = jnp.asarray(rng.normal(size=(1, 7, cfg.cross_attention_dim)), jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), lat, t, ctx)

    sd = flax_to_torch_sd(ref["params"], renames=unet_rename)
    got = convert_unet(sd, cfg, dtype=jnp.float32)

    # identical tree structure AND values
    ref_leaves = jax.tree.leaves_with_path(ref)
    got_flat = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    ref_flat = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    assert set(map(str, got_flat.keys())) == set(map(str, ref_flat.keys()))
    for k, v in ref_flat.items():
        np.testing.assert_array_equal(np.asarray(got_flat[k]), np.asarray(v))

    out_ref = model.apply(ref, lat, t, ctx)
    out_got = model.apply(got, lat, t, ctx)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_got))


def vae_rename(which):
    import re

    def rename(path):
        p = path
        p = re.sub(r"down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", p)
        p = re.sub(r"down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0.conv", p)
        p = re.sub(r"up_(\d+)_res_(\d+)", lambda m: f"up_blocks.{3 - int(m.group(1))}.resnets.{m.group(2)}", p)
        p = re.sub(r"up_(\d+)_upsample", lambda m: f"up_blocks.{3 - int(m.group(1))}.upsamplers.0.conv", p)
        p = p.replace("mid_res_0", "mid_block.resnets.0")
        p = p.replace("mid_res_1", "mid_block.resnets.1")
        p = p.replace("mid_attn", "mid_block.attentions.0")
        p = re.sub(r"mid_block.attentions.0\.to_out", "mid_block.attentions.0.to_out.0", p)
        if p in ("quant_conv", "post_quant_conv"):
            return p
        return f"{which}.{p}"

    return rename


@pytest.mark.slow
def test_vae_roundtrip(rng):
    cfg = tiny_vae_config()
    enc, dec = Encoder(cfg), Decoder(cfg)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    ep = enc.init(jax.random.PRNGKey(0), img)
    lat = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    dp = dec.init(jax.random.PRNGKey(1), lat)

    sd = {}
    sd.update(flax_to_torch_sd(ep["params"], renames=vae_rename("encoder")))
    sd.update(flax_to_torch_sd(dp["params"], renames=vae_rename("decoder")))
    enc_got, dec_got = convert_vae(sd, cfg)

    np.testing.assert_array_equal(
        np.asarray(enc.apply(enc_got, img)), np.asarray(enc.apply(ep, img))
    )
    np.testing.assert_array_equal(
        np.asarray(dec.apply(dec_got, lat)), np.asarray(dec.apply(dp, lat))
    )


def clip_rename(path):
    import re

    p = path
    p = p.replace("token_embedding", "embeddings.token_embedding")
    p = re.sub(r"^position_embedding$", "embeddings.position_embedding", p)
    p = re.sub(r"layer_(\d+)", r"encoder.layers.\1", p)
    p = p.replace("fc1", "mlp.fc1").replace("fc2", "mlp.fc2")
    return f"text_model.{p}"


def test_clip_roundtrip(rng):
    cfg = tiny_clip_config()
    model = CLIPTextEncoder(cfg)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    ref = model.init(jax.random.PRNGKey(0), ids)
    sd = flax_to_torch_sd(ref["params"], renames=clip_rename)
    got = convert_clip_text(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(model.apply(got, ids)), np.asarray(model.apply(ref, ids))
    )


def test_tokenizer_basic(tmp_path):
    import json

    from coma_tpu.models.diffusion.tokenizer import CLIPTokenizer

    # a miniature CLIP-style vocab
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for tok in ["a</w>", "person</w>", "p", "er", "s", "on", "pers", "on</w>"]:
        vocab.setdefault(tok, len(vocab))
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    merges = ["p e", "pe r", "o n", "on </w>", "per s", "pers on</w>"]
    vp, mp = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    with open(vp, "w") as fh:
        json.dump(vocab, fh)
    with open(mp, "w") as fh:
        fh.write("#version\n" + "\n".join(merges))
    # vocab needs merge intermediates
    for t in ["pe", "per", "pers", "person</w>"]:
        vocab.setdefault(t, len(vocab))
    with open(vp, "w") as fh:
        json.dump(vocab, fh)

    tok = CLIPTokenizer(vp, mp)
    ids = tok("a person")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == 0  # BOS
    assert 1 in ids[0]     # EOS present
    decoded = [tok.decoder[i] for i in ids[0] if i not in (0, 1)]
    assert decoded[0] == "a</w>"


@pytest.mark.slow
@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_text_parity_vs_transformers(rng, act):
    """Converted weights through our CLIPTextEncoder must match the real
    torch CLIPTextModel (transformers) hidden states — for both the SD-1.x
    OpenAI CLIP activation (quick_gelu) and the SD-2.x OpenCLIP one (gelu,
    ``stabilityai/stable-diffusion-2-inpainting`` text_encoder config)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    from coma_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextEncoder
    from coma_tpu.models.diffusion.weights import convert_clip_text

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act=act,
    )
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    ids = rng.integers(1, 1000, size=(2, 77))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                         num_heads=2, hidden_act=act)
    variables = convert_clip_text(sd, config=cfg)
    got = np.asarray(CLIPTextEncoder(cfg).apply(variables, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_infer_sd_configs(tmp_path):
    """The diffusers-dir config sniffer must map SD-2-inpaint's
    ``config.json`` fields (per-block attention_head_dim list, OpenCLIP text
    encoder) onto the native configs."""
    import json

    from coma_tpu.models.diffusion.weights import infer_sd_configs

    (tmp_path / "unet").mkdir()
    (tmp_path / "text_encoder").mkdir()
    with open(tmp_path / "unet" / "config.json", "w") as f:
        json.dump({
            "in_channels": 9, "out_channels": 4,
            "block_out_channels": [320, 640, 1280, 1280],
            "layers_per_block": 2, "cross_attention_dim": 1024,
            "attention_head_dim": [5, 10, 20, 20], "norm_num_groups": 32,
            "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        }, f)
    with open(tmp_path / "text_encoder" / "config.json", "w") as f:
        json.dump({
            "vocab_size": 49408, "hidden_size": 1024,
            "num_hidden_layers": 23, "num_attention_heads": 16,
            "max_position_embeddings": 77, "hidden_act": "gelu",
        }, f)

    ucfg, ccfg = infer_sd_configs(str(tmp_path))
    assert ucfg.cross_attention_dim == 1024
    assert ucfg.heads_per_block == (5, 10, 20, 20)
    assert ucfg.heads_for(0) == 5 and ucfg.heads_for(2) == 20
    assert ucfg.heads_for(None) == 20  # mid block = deepest
    assert ucfg.cross_attn_blocks == (True, True, True, False)
    assert ccfg.hidden_size == 1024 and ccfg.num_layers == 23
    assert ccfg.hidden_act == "gelu"

    # absent config.json -> SD-1.x defaults
    ucfg0, ccfg0 = infer_sd_configs(str(tmp_path / "nonexistent"))
    assert ucfg0.heads_per_block is None and ucfg0.attention_head_dim == 8
    assert ccfg0.hidden_act == "quick_gelu"


@pytest.mark.slow  # ~11 s; the tiny smoke weights tests above stay fast
def test_cli_build_pipeline_uses_checkpoint_configs(tmp_path, monkeypatch):
    """Regression: ``inpaint.build_pipeline`` must rebuild the UNet/CLIP
    modules around the CHECKPOINT's inferred configs, not the hardcoded
    SD-1.x defaults — otherwise SD-2-inpaint params (cross-attention 1024,
    23-layer gelu CLIP) fail apply() with shape errors in the CLI, the only
    production consumer (reference default: ``inpaint_ldm.py:4-15``)."""
    import dataclasses
    import json

    from coma_tpu.cli import inpaint as cli
    from coma_tpu.models.diffusion import weights as W

    # an SD-2-shaped (but tiny) diffusers dir: only the config.jsons matter
    (tmp_path / "unet").mkdir()
    (tmp_path / "text_encoder").mkdir()
    with open(tmp_path / "unet" / "config.json", "w") as f:
        json.dump({
            "in_channels": 9, "out_channels": 4,
            "block_out_channels": [8, 16], "layers_per_block": 1,
            "cross_attention_dim": 48, "attention_head_dim": [1, 2],
            "norm_num_groups": 4,
            "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        }, f)
    with open(tmp_path / "text_encoder" / "config.json", "w") as f:
        json.dump({
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "max_position_embeddings": 77,
            "hidden_act": "gelu",
        }, f)

    def fake_load(weights_dir, dtype=jnp.bfloat16):
        # simulate a converted checkpoint with exactly the declared geometry
        ucfg, ccfg = W.infer_sd_configs(weights_dir)
        ucfg = dataclasses.replace(ucfg, dtype=jnp.bfloat16)
        unet = UNet2DCondition(ucfg)
        clip = CLIPTextEncoder(ccfg)
        k = jax.random.PRNGKey(0)
        return dict(
            unet=jax.jit(unet.init)(
                           k, jnp.zeros((1, 8, 8, 9), ucfg.dtype),
                           jnp.zeros((1,)),
                           jnp.zeros((1, 77, ucfg.cross_attention_dim),
                                     ucfg.dtype)),
            vae_encoder=None, vae_decoder=None,
            clip=jax.jit(clip.init)(k, jnp.zeros((1, 77), jnp.int32)),
            tokenizer=None, segmenter=None,
        )

    monkeypatch.setattr(W, "load_sd_params", fake_load)
    args = cli.build_parser().parse_args(
        ["--weights_dir", str(tmp_path), "--batch_size", "1"])
    pipe, run_params, encode_prompts, res = cli.build_pipeline(args)
    assert res == 512
    # both applies would raise ScopeParamShapeError with the SD-1.x modules
    # (jitted: whole-graph compiles hit the persistent test cache, vs
    # hundreds of op-by-op compiles eager on the 1-core CI host)
    emb = encode_prompts(["a person"])
    assert emb.shape == (1, 77, 32)
    out = jax.jit(pipe.unet_fn)(run_params, jnp.zeros((1, 8, 8, 9)),
                                jnp.zeros((1,)), jnp.zeros((1, 77, 48)))
    assert out.shape == (1, 8, 8, 4)
