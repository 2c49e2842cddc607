"""Numerical parity tests for the torch->Flax weight converters
(coma_tpu.models.torch_weights). Each test builds a torch module with the
reference checkpoint's exact key layout (torchvision-style ResNet,
make_conv/make_deconv/make_linear Sequential indices, COAP modules), runs it
in eval mode, converts the state dict, and checks the Flax forward matches.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn

import jax
import jax.numpy as jnp
import flax.linen as nn

from coma_tpu.models.torch_weights import (
    convert_coap,
    convert_hand4whole,
    convert_implicit_net,
    convert_resnet,
    convert_resnet_pointnet,
    t2f_conv_bn,
    t2f_conv_transpose,
)

torch.manual_seed(0)


def _randomize_bn(mod):
    """Give BatchNorms non-trivial running stats so folding bugs show."""
    for m in mod.modules():
        if isinstance(m, (tn.BatchNorm2d, tn.BatchNorm1d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


# --------------------------------------------------------------------------
# torch mirrors of the reference layer factories (nets/layer.py) and
# torchvision ResNet key layout — built here from the documented naming, so
# the converter is tested against the real checkpoint key structure.
# --------------------------------------------------------------------------

def conv_bn_relu(i, o, k=1):
    return tn.Sequential(tn.Conv2d(i, o, k, padding=k // 2), tn.BatchNorm2d(o), tn.ReLU())


def linear_stack(dims, relu_final=False):
    layers = []
    for i in range(len(dims) - 1):
        layers.append(tn.Linear(dims[i], dims[i + 1]))
        if i < len(dims) - 2 or relu_final:
            layers.append(tn.ReLU())
    return tn.Sequential(*layers)


def deconv_stack(dims):
    layers = []
    for i in range(len(dims) - 1):
        layers.append(tn.ConvTranspose2d(dims[i], dims[i + 1], 4, 2, 1, bias=False))
        layers.append(tn.BatchNorm2d(dims[i + 1]))
        layers.append(tn.ReLU())
    return tn.Sequential(*layers)


class TorchBasicBlock(tn.Module):
    def __init__(self, i, o, stride=1):
        super().__init__()
        self.conv1 = tn.Conv2d(i, o, 3, stride, 1, bias=False)
        self.bn1 = tn.BatchNorm2d(o)
        self.conv2 = tn.Conv2d(o, o, 3, 1, 1, bias=False)
        self.bn2 = tn.BatchNorm2d(o)
        self.downsample = None
        if stride != 1 or i != o:
            self.downsample = tn.Sequential(
                tn.Conv2d(i, o, 1, stride, bias=False), tn.BatchNorm2d(o)
            )

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        r = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + r)


class TorchBottleneck(tn.Module):
    def __init__(self, i, planes, stride=1):
        super().__init__()
        o = planes * 4
        self.conv1 = tn.Conv2d(i, planes, 1, bias=False)
        self.bn1 = tn.BatchNorm2d(planes)
        self.conv2 = tn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tn.BatchNorm2d(planes)
        self.conv3 = tn.Conv2d(planes, o, 1, bias=False)
        self.bn3 = tn.BatchNorm2d(o)
        self.downsample = None
        if stride != 1 or i != o:
            self.downsample = tn.Sequential(
                tn.Conv2d(i, o, 1, stride, bias=False), tn.BatchNorm2d(o)
            )

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + r)


class TorchResNet(tn.Module):
    """torchvision-layout feature extractor (conv1/bn1/layer1..4)."""

    def __init__(self, stage_sizes, bottleneck):
        super().__init__()
        block = TorchBottleneck if bottleneck else TorchBasicBlock
        exp = 4 if bottleneck else 1
        self.conv1 = tn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tn.BatchNorm2d(64)
        self.maxpool = tn.MaxPool2d(3, 2, 1)
        inp = 64
        for s, (n, planes) in enumerate(zip(stage_sizes, (64, 128, 256, 512))):
            blocks = []
            for j in range(n):
                stride = 2 if (s > 0 and j == 0) else 1
                blocks.append(block(inp, planes, stride))
                inp = planes * exp
            setattr(self, f"layer{s + 1}", tn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def test_conv_transpose_parity():
    tc = tn.ConvTranspose2d(5, 7, 4, 2, 1, bias=False)
    x = np.random.default_rng(0).normal(size=(2, 5, 8, 8)).astype(np.float32)
    with torch.no_grad():
        yt = tc(torch.from_numpy(x)).numpy()
    sd = {"d.weight": tc.weight}
    fl = nn.ConvTranspose(7, (4, 4), strides=(2, 2), padding="SAME", use_bias=False)
    yj = fl.apply({"params": t2f_conv_transpose(sd, "d")},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert yj.shape == (2, 16, 16, 7)
    np.testing.assert_allclose(
        np.asarray(yj).transpose(0, 3, 1, 2), yt, atol=1e-5
    )


def test_conv_bias_fold_into_bn():
    t = conv_bn_relu(6, 4).eval()
    _randomize_bn(t)
    with torch.no_grad():
        t[0].bias.normal_()
    x = np.random.default_rng(1).normal(size=(2, 6, 5, 5)).astype(np.float32)
    with torch.no_grad():
        yt = t(torch.from_numpy(x)).numpy()
    sd = t.state_dict()
    conv, bn, st = t2f_conv_bn(sd, "0", "1")

    class F(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (1, 1), use_bias=False, name="c")(x)
            x = nn.BatchNorm(use_running_average=True, name="b")(x)
            return nn.relu(x)

    yj = F().apply(
        {"params": {"c": conv, "b": bn}, "batch_stats": {"b": st}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), yt, atol=1e-5)


# --------------------------------------------------------------------------
# ResNet backbone
# --------------------------------------------------------------------------

@pytest.mark.parametrize("stages,bottleneck", [((2, 2, 2, 2), False),
                                               ((2, 2, 2, 2), True)])
def test_resnet_parity(stages, bottleneck):
    from coma_tpu.models.resnet import ResNet

    t = TorchResNet(stages, bottleneck).eval()
    _randomize_bn(t)
    sd = {f"backbone.{k}": v for k, v in t.state_dict().items()}
    params, stats = convert_resnet(sd, "backbone.", stages, bottleneck)
    x = np.random.default_rng(2).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        yt = t(torch.from_numpy(x)).numpy()
    yj = ResNet(stages, bottleneck).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(yj).transpose(0, 3, 1, 2), yt, atol=2e-4
    )


# --------------------------------------------------------------------------
# Hand4Whole full-tree conversion (structural: every param consumed by apply)
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_convert_hand4whole_full_tree():
    from coma_tpu.models import hand4whole as h4w

    D = h4w.OUTPUT_HM_SHAPE[0]
    sd = {}

    def add(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    add("backbone", TorchResNet((3, 4, 6, 3), True))
    add("hand_roi_net.backbone", TorchResNet((3, 4, 6, 3), True))
    add("face_roi_net.backbone", TorchResNet((2, 2, 2, 2), False))
    add("body_position_net.conv",
        tn.Sequential(tn.Conv2d(2048, h4w.NUM_BODY_POS_JOINTS * D, 1)))
    add("hand_position_net.conv",
        tn.Sequential(tn.Conv2d(2048, h4w.NUM_HAND_POS_JOINTS * h4w.OUTPUT_HAND_HM_SHAPE[0], 1)))

    n_joint_feat = (h4w.NUM_BODY_POS_JOINTS + 8) * 515
    brn = {}
    for tower in ("body", "lhand", "rhand"):
        add(f"body_rotation_net.{tower}_conv", conv_bn_relu(2048, 512))
    add("body_rotation_net.root_pose_out", linear_stack([n_joint_feat, 6]))
    add("body_rotation_net.body_pose_out",
        linear_stack([n_joint_feat, h4w.NUM_BODY_ROT_JOINTS * 6]))
    add("body_rotation_net.shape_out", linear_stack([2048, h4w.SHAPE_PARAM_DIM]))
    add("body_rotation_net.cam_out", linear_stack([2048, 3]))

    add("hand_rotation_net.hand_conv", conv_bn_relu(2048, 512))
    add("hand_rotation_net.hand_pose_out",
        linear_stack([h4w.NUM_HAND_POS_JOINTS * 515, h4w.NUM_HAND_ROT_JOINTS * 6]))

    add("box_net.deconv", deconv_stack([2048 + h4w.NUM_BODY_POS_JOINTS * D, 256, 256, 256]))
    add("box_net.bbox_center", tn.Sequential(tn.Conv2d(256, 3, 1)))
    for head in ("lhand_size", "rhand_size", "face_size"):
        add(f"box_net.{head}", linear_stack([256, 256, 2]))

    add("face_regressor.expr_out", linear_stack([512, h4w.EXPR_CODE_DIM]))
    add("face_regressor.jaw_pose_out", linear_stack([512, 6]))

    variables = convert_hand4whole(sd)
    img = jnp.zeros((1, h4w.INPUT_IMG_SHAPE[0], h4w.INPUT_IMG_SHAPE[1], 3))
    out = h4w.Hand4Whole().apply(variables, img)
    assert out["body_pose"].shape == (1, h4w.NUM_BODY_ROT_JOINTS * 3)
    assert np.isfinite(np.asarray(out["cam_trans"])).all()


# --------------------------------------------------------------------------
# COAP
# --------------------------------------------------------------------------

class TorchResnetBlockFC(tn.Module):
    def __init__(self, size_in, size_out):
        super().__init__()
        size_h = min(size_in, size_out)
        self.fc_0 = tn.Linear(size_in, size_h)
        self.fc_1 = tn.Linear(size_h, size_out)
        self.shortcut = (
            None if size_in == size_out else tn.Linear(size_in, size_out, bias=False)
        )

    def forward(self, x):
        dx = self.fc_1(torch.relu(self.fc_0(torch.relu(x))))
        s = x if self.shortcut is None else self.shortcut(x)
        return s + dx


class TorchResnetPointnet(tn.Module):
    def __init__(self, dim, hidden, out):
        super().__init__()
        self.fc_pos = tn.Linear(dim, 2 * hidden)
        self.block_0 = TorchResnetBlockFC(2 * hidden, hidden)
        self.block_1 = TorchResnetBlockFC(2 * hidden, hidden)
        self.block_3 = TorchResnetBlockFC(2 * hidden, hidden)
        self.block_4 = TorchResnetBlockFC(2 * hidden, hidden)
        self.fc_c = tn.Linear(hidden, out)

    def forward(self, p):
        def pc(n):
            return torch.cat([n, n.max(1, keepdim=True)[0].expand(n.size())], 2)

        net = self.block_0(self.fc_pos(p))
        net = self.block_4(pc(self.block_3(pc(self.block_1(pc(net))))))
        return self.fc_c(torch.relu(net.max(1)[0]))


class TorchImplicitNet(tn.Module):
    def __init__(self, d_in, d_out, dims, skip_in=()):
        super().__init__()
        dims = [d_in] + list(dims) + [d_out]
        self.num_layers = len(dims)
        self.skip_in = skip_in
        self.d_in = d_in
        for layer in range(self.num_layers - 1):
            out_dim = dims[layer + 1] - (d_in if layer + 1 in skip_in else 0)
            setattr(self, f"lin{layer}", tn.Linear(dims[layer], out_dim))
        self.act = tn.Softplus(beta=100)

    def forward(self, x):
        inp = x
        for layer in range(self.num_layers - 1):
            if layer in self.skip_in:
                x = torch.cat([x, inp], -1) / np.sqrt(2)
            x = getattr(self, f"lin{layer}")(x)
            if layer < self.num_layers - 2:
                x = self.act(x)
        return x


def test_resnet_pointnet_parity(rng):
    from coma_tpu.models.coap import ResnetPointnet

    t = TorchResnetPointnet(3, 16, 8).eval()
    sd = {f"encoder.{k}": v for k, v in t.state_dict().items()}
    p = rng.normal(size=(2, 11, 3)).astype(np.float32)
    with torch.no_grad():
        yt = t(torch.from_numpy(p)).numpy()
    yj = ResnetPointnet(8, 16).apply(
        {"params": convert_resnet_pointnet(sd, "encoder.")}, jnp.asarray(p)
    )
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5)


def test_implicit_net_parity(rng):
    from coma_tpu.models.coap import ImplicitNet

    t = TorchImplicitNet(7, 4, [16, 16, 16], skip_in=(2,)).eval()
    sd = {f"dec.{k}": v for k, v in t.state_dict().items()}
    x = rng.normal(size=(5, 7)).astype(np.float32)
    with torch.no_grad():
        yt = t(torch.from_numpy(x)).numpy()
    yj = ImplicitNet(4, (16, 16, 16), (2,)).apply(
        {"params": convert_implicit_net(sd, "dec.")}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5)


def test_convert_coap_full(rng):
    """Full COAPOccupancy apply with converted published-layout weights,
    checked against a torch reimplementation of coap.py:query:688-725."""
    from coma_tpu.models.coap import COAPConfig, COAPOccupancy

    K, T, Q, code = 4, 9, 6, 16
    cfg = COAPConfig(num_parts=K, code_dim=code, hidden_dim=16,
                     query_dims=(32, 32, 32), query_skip=(2,), query_out=12,
                     decoder_dims=(20, 20, 20, 20), decoder_skip=(3,))
    enc = TorchResnetPointnet(3, 16, code).eval()
    qenc = TorchImplicitNet(3 + 1 + K + code, 12, [32, 32, 32], (2,)).eval()
    dec = TorchImplicitNet(3 + 12, 1, [20, 20, 20, 20], (3,)).eval()
    sd = {}
    for pre, mod in (("encoder", enc), ("query_encoder", qenc), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v

    part_points = rng.normal(size=(K, T, 3)).astype(np.float32)
    queries = rng.normal(size=(K, Q, 3)).astype(np.float32)
    inside = (rng.random((K, Q)) > 0.3).astype(np.float32)

    with torch.no_grad():
        codes = enc(torch.from_numpy(part_points))                     # (K, code)
        lq = torch.from_numpy(queries)
        ib = torch.from_numpy(inside)
        z = torch.cat(
            [lq, ib[..., None],
             torch.eye(K)[:, None, :].expand(K, Q, K),
             codes[:, None, :].expand(K, Q, code)], -1)
        z = torch.cat([lq, qenc(z)], -1)
        occ_t = (torch.sigmoid(-dec(z)[..., 0]) * ib).max(0)[0].numpy()

    occ_j = COAPOccupancy(cfg).apply(
        convert_coap(sd), jnp.asarray(part_points), jnp.asarray(queries),
        jnp.asarray(inside),
    )
    assert occ_j.shape == (Q,)
    np.testing.assert_allclose(np.asarray(occ_j), occ_t, atol=1e-5)


# --------------------------------------------------------------------------
# native param store + convert_weights CLI
# --------------------------------------------------------------------------

def test_param_store_roundtrip(tmp_path, rng):
    from coma_tpu.utils.checkpoint import load_params, save_params

    tree = {
        "a": {"kernel": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
              "bias": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))},
        "b": {"w": jnp.asarray(rng.normal(size=(2, 2)), jnp.bfloat16)},
    }
    p = str(tmp_path / "store")
    save_params(tree, p)
    back = load_params(p)
    np.testing.assert_array_equal(np.asarray(back["a"]["kernel"]),
                                  np.asarray(tree["a"]["kernel"]))
    assert back["b"]["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["b"]["w"], np.float32),
                                  np.asarray(tree["b"]["w"], np.float32))


def test_convert_weights_cli_coap(tmp_path, rng):
    """Full CLI path: torch ckpt file -> store -> COAPOccupancy.apply."""
    from coma_tpu.cli import convert_weights as cli_cw
    from coma_tpu.models.coap import COAPConfig, COAPOccupancy
    from coma_tpu.utils.checkpoint import load_params

    K, code = 4, 16
    cfg = COAPConfig(num_parts=K, code_dim=code, hidden_dim=16,
                     query_dims=(32, 32, 32), query_skip=(2,), query_out=12,
                     decoder_dims=(20, 20, 20, 20), decoder_skip=(3,))
    enc = TorchResnetPointnet(3, 16, code)
    qenc = TorchImplicitNet(3 + 1 + K + code, 12, [32, 32, 32], (2,))
    dec = TorchImplicitNet(3 + 12, 1, [20, 20, 20, 20], (3,))
    sd = {}
    for pre, mod in (("encoder", enc), ("query_encoder", qenc), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v
    src = str(tmp_path / "last.ckpt")
    torch.save({"state_dict": sd}, src)
    out = str(tmp_path / "coap_store")
    cli_cw.main(["--kind", "coap", "--src", src, "--out", out])

    tree = load_params(out)
    occ = COAPOccupancy(cfg).apply(
        tree,
        jnp.asarray(rng.normal(size=(K, 9, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(K, 6, 3)).astype(np.float32)),
        jnp.ones((K, 6)),
    )
    assert occ.shape == (6,) and np.isfinite(np.asarray(occ)).all()
