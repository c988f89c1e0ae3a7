"""Encoder zoo: shapes, lens subsampling, dict contract, LPPool math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.core.registry import ENCODERS
from acvae_tpu.models.encoders import _lp_pool

N, T, F = 2, 64, 64


@pytest.fixture
def feats(rng):
    return (jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32)),
            jnp.array([T, 32]))


CONFIGS = [
    ("Cnn10", {"embed_size": 16, "channels": (4, 8, 8, 16)}, 16, T // 16),
    ("Cnn14", {"embed_size": 2048}, 2048, T // 32),
    ("CRNNEncoder", {"embed_size": 256}, 256, T // 4),
    ("CNN10QEncoder", {"embed_size": 16, "channels": (4, 8, 8, 16)}, 16, T // 16),
    ("CNN10DEncoder", {"embed_size": 24, "channels": (4, 8, 8, 16)}, 16, T // 16),
    ("CRNN8_Sub4", {"embed_size": 16, "channels": (4, 8, 8, 16)}, 16, T // 4),
    ("RNNEncoder", {"embed_size": 12, "hidden_size": 8}, 12, T),
    ("TransformerEncoder", {"embed_size": 16, "nhead": 2, "nlayers": 1}, 16, T),
    ("CNN10Encoder", {"embed_size": 512}, 512, T // 4),
    ("E2EASREncoder", {"embed_size": 24, "hidden_size": 16, "nlayers": 1},
     24, T // 4),
    ("M2TransformerEncoder", {"embed_size": 16, "nhead": 2, "nlayers": 1,
                              "dim_feedforward": 32, "memory_slots": 5},
     16, T),
    ("ResNetEncoder", {"embed_size": 16, "channels": (4, 8, 8, 16)}, 16, 2),
]


@pytest.mark.parametrize("name,args,embed,t_out", CONFIGS)
def test_encoder_contract(feats, name, args, embed, t_out):
    x, lens = feats
    enc = ENCODERS.build(name, inputdim=F, **args)
    variables = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, lens, train=False)
    out = enc.apply(variables, x, lens, train=False)
    assert set(out) >= {"audio_embeds", "audio_embeds_pooled",
                        "audio_embeds_lens"}
    assert out["audio_embeds"].shape[0] == N
    assert out["audio_embeds"].shape[1] == t_out
    assert out["audio_embeds_pooled"].shape[0] == N
    assert jnp.all(jnp.isfinite(out["audio_embeds"].astype(jnp.float32)))
    # subsampled lens
    if name in ("Cnn10", "CNN10QEncoder", "CNN10DEncoder"):
        assert int(out["audio_embeds_lens"][1]) == 32 // 16
    # train mode with batch stats mutates
    out2, updates = enc.apply(
        variables, x, lens, train=True,
        rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    assert "batch_stats" in updates or not variables.get("batch_stats")


def test_pretrained_cnn_frozen_trunk(feats):
    """PreTrainedCNN: frozen trunk (no grads reach it), fresh head trains."""
    from acvae_tpu.models.encoders import CNN10Encoder, PreTrainedCNN
    x, lens = feats
    enc = PreTrainedCNN(trunk=CNN10Encoder(), embed_size=8)
    v = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, lens, train=False)

    def loss(params):
        out = enc.apply({"params": params,
                         "batch_stats": v.get("batch_stats", {})},
                        x, lens, train=False)
        return jnp.sum(out["audio_embeds_pooled"] ** 2)

    grads = jax.grad(loss)(v["params"])
    trunk_norm = sum(float(jnp.abs(g).sum())
                     for g in jax.tree.leaves(grads["trunk"]))
    head_norm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree.leaves(grads["outputlayer"]))
    assert trunk_norm == 0.0 and head_norm > 0.0


def test_cnn10crnn_fusion(feats):
    from acvae_tpu.models.encoders import (CNN10CRNNEncoder, CNN10Encoder,
                                           CRNNEncoder)
    x, lens = feats
    enc = CNN10CRNNEncoder(crnn=CRNNEncoder(embed_size=256),
                           cnn=CNN10Encoder())
    assert enc.embed_size == 256 + 512
    v = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, lens, train=False)
    out = enc.apply(v, x, lens, train=False)
    assert out["audio_embeds"].shape[-1] == 768
    assert out["audio_embeds_pooled"].shape == (N, 768)


def test_cnnencoder_glu(feats):
    x, lens = feats
    enc = ENCODERS.build("CNNEncoder", inputdim=F, embed_size=8,
                         filters=(8, 8, 8), filtersizes=(5, 3, 3))
    variables = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, lens, train=False)
    out = enc.apply(variables, x, lens, train=False)
    assert out["audio_embeds_pooled"].shape == (N, 8)


def test_lp_pool_matches_torch(rng):
    import torch
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    ours = _lp_pool(jnp.asarray(x), 4.0, (2, 4))
    # torch LPPool2d operates NCHW
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torch.nn.LPPool2d(4, (2, 4))(tx).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_luong_decoder_step(rng):
    from acvae_tpu.models.decoders import RNNLuongAttnDecoder
    dec = RNNLuongAttnDecoder(vocab_size=17, enc_mem_size=8, embed_size=8,
                              hidden_size=8, attn_hidden_size=8)
    enc_mem = jnp.asarray(rng.normal(size=(3, 5, 8)).astype(np.float32))
    enc_mask = jnp.ones((3, 5), bool)
    word = jnp.array([1, 2, 3])

    def run(dec, word):
        proj = dec.project_enc(enc_mem)
        return dec.step(word, dec.init_state(3), enc_mem, proj, enc_mask)

    variables = jax.jit(lambda: None)  # noqa - keep simple
    import flax.linen as nn
    v = nn.init(run, dec)(jax.random.key(0), word)
    out = nn.apply(run, dec)(v, word)
    assert out["logits"].shape == (3, 17)


class TestResNetEncoderParity:
    """Torch-golden parity for ResNetEncoder (encoder.py:808-863): the torch
    network below re-expresses the reference's torchvision-style trunk; our
    flax module must reproduce it numerically with copied weights, and the
    (lens-1)//2+1 x5 length arithmetic exactly."""

    CH = (4, 8, 8, 16)

    def _torch_model(self):
        import torch
        import torch.nn as tnn

        def conv3x3(i, o, s=1):
            return tnn.Conv2d(i, o, 3, stride=s, padding=1, bias=False)

        class BasicBlock(tnn.Module):
            def __init__(self, i, o, stride=1, downsample=None):
                super().__init__()
                self.conv1 = conv3x3(i, o, stride)
                self.bn1 = tnn.BatchNorm2d(o)
                self.conv2 = conv3x3(o, o)
                self.bn2 = tnn.BatchNorm2d(o)
                self.downsample = downsample

            def forward(self, x):
                idt = x
                out = torch.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                if self.downsample is not None:
                    idt = self.downsample(x)
                return torch.relu(out + idt)

        c = self.CH
        layers = [
            tnn.Conv2d(1, c[0], 7, stride=2, padding=3, bias=False),
            tnn.BatchNorm2d(c[0]),
            tnn.ReLU(),
            tnn.MaxPool2d(3, stride=2, padding=1),
            tnn.Sequential(BasicBlock(c[0], c[0]), BasicBlock(c[0], c[0])),
        ]
        inp = c[0]
        for o in c[1:]:
            ds = tnn.Sequential(tnn.Conv2d(inp, o, 1, stride=2, bias=False),
                                tnn.BatchNorm2d(o))
            layers.append(tnn.Sequential(BasicBlock(inp, o, 2, ds),
                                         BasicBlock(o, o)))
            inp = o
        net = tnn.Sequential(*layers)
        # randomize BN running stats so eval-mode normalization is nontrivial
        g = torch.Generator().manual_seed(5)
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean = torch.randn(m.num_features, generator=g) * .3
                m.running_var = torch.rand(m.num_features, generator=g) + .5
                with torch.no_grad():
                    m.weight.copy_(torch.rand(m.num_features, generator=g) + .5)
                    m.bias.copy_(torch.randn(m.num_features, generator=g) * .1)
        return net

    @staticmethod
    def _bn_vars(m):
        return ({"scale": m.weight.detach().numpy(),
                 "bias": m.bias.detach().numpy()},
                {"mean": m.running_mean.numpy(), "var": m.running_var.numpy()})

    @staticmethod
    def _conv_kernel(m):
        # torch [O, I, KF, KT] (H=mel, W=time) -> flax HWIO with H=time, W=mel
        return m.weight.detach().numpy().transpose(3, 2, 1, 0)

    def _copy(self, net):
        params, stats = {}, {}
        params["stem_conv"] = {"kernel": self._conv_kernel(net[0])}
        params["stem_bn"], stats["stem_bn"] = self._bn_vars(net[1])
        for stage in range(4):
            for b in range(2):
                blk = net[4 + stage][b]
                name = f"layer{stage + 1}_{b}"
                p = {"conv1": {"kernel": self._conv_kernel(blk.conv1)},
                     "conv2": {"kernel": self._conv_kernel(blk.conv2)}}
                s = {}
                p["bn1"], s["bn1"] = self._bn_vars(blk.bn1)
                p["bn2"], s["bn2"] = self._bn_vars(blk.bn2)
                if blk.downsample is not None:
                    p["ds_conv"] = {"kernel": self._conv_kernel(blk.downsample[0])}
                    p["ds_bn"], s["ds_bn"] = self._bn_vars(blk.downsample[1])
                params[name], stats[name] = p, s
        return {"params": params, "batch_stats": stats}

    def test_matches_torch_reference(self, rng):
        import torch
        from acvae_tpu.models.encoders import ResNetEncoder

        torch.manual_seed(3)
        net = self._torch_model().eval()
        Nn, Tt, Ff = 2, 70, 64  # odd-ish T exercises the padding arithmetic
        x = rng.normal(size=(Nn, Tt, Ff)).astype(np.float32)
        with torch.no_grad():
            tx = torch.tensor(x).unsqueeze(1).transpose(2, 3)  # [N,1,F,T]
            ty = net(tx)
            ty = torch.nn.AdaptiveAvgPool2d((1, None))(ty)
            ty = ty.squeeze(2).transpose(-1, -2).numpy()  # [N, T', C]

        enc = ResNetEncoder(inputdim=Ff, embed_size=self.CH[-1],
                            channels=self.CH)
        lens = jnp.array([Tt, 37])
        out = enc.apply(self._copy(net), jnp.asarray(x), lens, train=False)
        np.testing.assert_allclose(np.asarray(out["audio_embeds"]), ty,
                                   rtol=2e-4, atol=2e-4)
        # (lens-1)//2+1 applied 5 times: 70->35->18->9->5->3, 37->...->2
        np.testing.assert_array_equal(np.asarray(out["audio_embeds_lens"]),
                                      [3, 2])
