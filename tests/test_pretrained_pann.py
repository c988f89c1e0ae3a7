"""PANN torch checkpoint conversion (train/pretrained.py::pann_to_flax).

The reference warm-starts its encoders from pretrained PANN audio-tagger
checkpoints (``models/encoder.py:651-707`` Cnn10, ``:1351-1362`` loads
``ResNet38_mAP=0.434.pth``).  These tests build torch modules with PANN's
exact parameter naming, convert the state dict, and check (a) numeric parity
of the full Cnn10 forward with copied weights and (b) that every converted
tensor lands in our parameter trees for all three architectures.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from acvae_tpu.models.encoders import Cnn10, Cnn14, ResNet38  # noqa: E402
from acvae_tpu.train.pretrained import (  # noqa: E402
    flatten_params, merge_pretrained, pann_to_flax)


class TorchConvBlock(nn.Module):
    """PANN ConvBlock with the reference's naming (encoder.py:606-649)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x, pool_size=(2, 2)):
        x = F.relu_(self.bn1(self.conv1(x)))
        x = F.relu_(self.bn2(self.conv2(x)))
        return F.avg_pool2d(x, pool_size)


class TorchCnn10(nn.Module):
    """PANN Cnn10 with the reference head naming (encoder.py:651-707)."""

    def __init__(self):
        super().__init__()
        self.bn0 = nn.BatchNorm2d(64)
        self.conv_block1 = TorchConvBlock(1, 64)
        self.conv_block2 = TorchConvBlock(64, 128)
        self.conv_block3 = TorchConvBlock(128, 256)
        self.conv_block4 = TorchConvBlock(256, 512)
        self.embed_pooled = nn.Linear(512, 512)

    def forward(self, x, lens):
        x = x.unsqueeze(1)                       # [N, 1, T, F]
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        for blk in (self.conv_block1, self.conv_block2,
                    self.conv_block3, self.conv_block4):
            x = blk(x)
        x = x.mean(3)                            # [N, C, T']
        # masked max+mean over valid frames (matching our masked head)
        tmax = x.shape[2]
        mask = (torch.arange(tmax)[None] < lens[:, None]).float()
        xm = x * mask[:, None]
        x1 = (xm + (mask[:, None] - 1) * 1e9).max(2).values
        x2 = xm.sum(2) / lens[:, None].float()
        out = F.relu_(self.embed_pooled(x1 + x2))
        return x.transpose(1, 2), out            # temporal [N, T', C], pooled


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d,)):
            m.running_mean.copy_(torch.tensor(
                rng.normal(size=m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 2.0, size=m.running_var.shape)
                .astype(np.float32)))


def test_cnn10_conversion_numeric_parity(rng):
    tmodel = TorchCnn10().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.normal(size=(2, 32, 64)).astype(np.float32)
    lens = np.array([2, 1])  # post-subsampling (/16) valid frames
    with torch.no_grad():
        t_temporal, t_pooled = tmodel(torch.tensor(x),
                                      torch.tensor(lens))

    tree = pann_to_flax(tmodel.state_dict())
    enc = Cnn10()
    v = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 jnp.asarray(x), jnp.asarray(lens * 16), train=False)
    params, n_p, total_p = merge_pretrained(v["params"], tree["params"],
                                            log=lambda *a: None)
    stats, n_s, total_s = merge_pretrained(v["batch_stats"],
                                           tree["batch_stats"],
                                           log=lambda *a: None)
    assert n_p == total_p and n_s == total_s  # every tensor converted

    out = enc.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), jnp.asarray(lens * 16), train=False)
    np.testing.assert_allclose(np.asarray(out["audio_embeds"]),
                               t_temporal.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["audio_embeds_pooled"]),
                               t_pooled.numpy(), rtol=1e-4, atol=1e-4)


def _structural_check(tree, flax_module, t_mel):
    feats = jnp.zeros((1, t_mel, 64))
    v = flax_module.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, jnp.array([t_mel]), train=False)
    for col in ("params", "batch_stats"):
        ours = flatten_params(v[col])
        converted = flatten_params(tree[col])
        for path, leaf in converted.items():
            assert path in ours, f"{col} {'/'.join(path)} missing"
            assert np.shape(leaf) == np.shape(ours[path]), "/".join(path)
    return v


def test_cnn14_conversion_structure():
    sd = {}
    plan = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024),
            (1024, 2048)]
    sd["bn0.weight"] = np.ones(64, np.float32)
    sd["bn0.bias"] = np.zeros(64, np.float32)
    sd["bn0.running_mean"] = np.zeros(64, np.float32)
    sd["bn0.running_var"] = np.ones(64, np.float32)
    for i, (cin, cout) in enumerate(plan):
        p = f"conv_block{i + 1}"
        sd[f"{p}.conv1.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        sd[f"{p}.conv2.weight"] = np.zeros((cout, cout, 3, 3), np.float32)
        for j in (1, 2):
            sd[f"{p}.bn{j}.weight"] = np.ones(cout, np.float32)
            sd[f"{p}.bn{j}.bias"] = np.zeros(cout, np.float32)
            sd[f"{p}.bn{j}.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{p}.bn{j}.running_var"] = np.ones(cout, np.float32)
    sd["fc1.weight"] = np.zeros((2048, 2048), np.float32)
    sd["fc1.bias"] = np.zeros(2048, np.float32)
    tree = pann_to_flax(sd)
    _structural_check(tree, Cnn14(), 32)


def test_resnet38_conversion_structure():
    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def add_block(name, cin, cout):
        sd[f"{name}.conv1.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        sd[f"{name}.conv2.weight"] = np.zeros((cout, cout, 3, 3), np.float32)
        add_bn(f"{name}.bn1", cout)
        add_bn(f"{name}.bn2", cout)

    add_bn("bn0", 64)
    add_block("conv_block1", 1, 64)
    cin = 64
    for layer, (planes, blocks) in enumerate(
            [(64, 3), (128, 4), (256, 6), (512, 3)], start=1):
        for b in range(blocks):
            name = f"resnet.layer{layer}.{b}"
            add_block(name, cin if b == 0 else planes, planes)
            if b == 0 and (layer > 1 or cin != planes):
                sd[f"{name}.downsample.0.weight"] = np.zeros(
                    (planes, cin, 1, 1), np.float32)
                add_bn(f"{name}.downsample.1", planes)
        cin = planes
    add_block("conv_block_after1", 512, 2048)
    sd["fc1.weight"] = np.zeros((2048, 2048), np.float32)
    sd["fc1.bias"] = np.zeros(2048, np.float32)
    tree = pann_to_flax(sd)
    _structural_check(tree, ResNet38(), 64)
