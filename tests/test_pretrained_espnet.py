"""ESPnet encoder checkpoint conversion (train/pretrained.py::espnet_to_flax).

The reference wraps a pretrained espnet ASR encoder
(``models/encoder.py:14-54`` ``load_espnet_encoder``); our
:class:`E2EASREncoder` is the same vggbgrup architecture built natively.
These tests assemble a torch VGG2L+RNNP(GRU) encoder with espnet's exact
parameter naming, convert, and check (a) every flax leaf loads and (b) the
full forward matches to f32 tolerance — including the channel-major vs
freq-major flatten permutation on the first GRU layer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from acvae_tpu.models.encoders import E2EASREncoder  # noqa: E402
from acvae_tpu.train.pretrained import (  # noqa: E402
    _looks_like_espnet, espnet_to_flax, flatten_params, merge_pretrained)

FDIM, EMB, HID, NL = 64, 32, 32, 2
N, T = 2, 16


class TorchVGG2L(nn.Module):
    """espnet/nets/pytorch_backend/rnn/encoders.py VGG2L naming."""

    def __init__(self):
        super().__init__()
        self.conv1_1 = nn.Conv2d(1, 64, 3, padding=1)
        self.conv1_2 = nn.Conv2d(64, 64, 3, padding=1)
        self.conv2_1 = nn.Conv2d(64, 128, 3, padding=1)
        self.conv2_2 = nn.Conv2d(128, 128, 3, padding=1)

    def forward(self, x):  # x: [N, T, F]
        x = x.unsqueeze(1)  # [N, 1, T, F]
        x = F.relu(self.conv1_1(x))
        x = F.relu(self.conv1_2(x))
        x = F.max_pool2d(x, 2, stride=2)
        x = F.relu(self.conv2_1(x))
        x = F.relu(self.conv2_2(x))
        x = F.max_pool2d(x, 2, stride=2)
        # espnet flattens CHANNEL-major: [N, C, T', F'] -> [N, T', C*F']
        x = x.transpose(1, 2).contiguous()
        return x.reshape(x.shape[0], x.shape[1], -1)


class TorchRNNP(nn.Module):
    """espnet RNNP naming (birnn{i} + bt{i}), GRU flavor, tanh projection."""

    def __init__(self, in_dim):
        super().__init__()
        for i in range(NL):
            idim = in_dim if i == 0 else EMB
            setattr(self, f"birnn{i}",
                    nn.GRU(idim, HID, bidirectional=True, batch_first=True))
            setattr(self, f"bt{i}", nn.Linear(2 * HID, EMB))

    def forward(self, x, lens):
        for i in range(NL):
            packed = nn.utils.rnn.pack_padded_sequence(
                x, lens, batch_first=True, enforce_sorted=False)
            out, _ = getattr(self, f"birnn{i}")(packed)
            x, _ = nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=x.shape[1])
            x = torch.tanh(getattr(self, f"bt{i}")(x))
        return x


class TorchEspnetEncoder(nn.Module):
    """Encoder = ModuleList([VGG2L, RNNP]) -> state dict keys enc.0/enc.1."""

    def __init__(self):
        super().__init__()
        self.enc = nn.ModuleList([TorchVGG2L(),
                                  TorchRNNP(128 * (FDIM // 4))])

    def forward(self, x, lens):
        h = self.enc[0](x)
        return self.enc[1](h, lens // 4)


def test_detection_and_conversion_numeric_parity(rng):
    tmodel = TorchEspnetEncoder().eval()
    sd = tmodel.state_dict()
    assert _looks_like_espnet(sd)

    tree = espnet_to_flax(sd, inputdim=FDIM, log=lambda *a: None)
    enc = E2EASREncoder(inputdim=FDIM, embed_size=EMB, hidden_size=HID,
                        nlayers=NL)
    feats = rng.normal(size=(N, T, FDIM)).astype(np.float32)
    feat_lens = np.array([T, T - 4])
    v = enc.init({"params": jax.random.key(0)}, jnp.asarray(feats),
                 jnp.asarray(feat_lens), train=False)
    params, n_p, t_p = merge_pretrained(v["params"], tree["params"],
                                        log=print)
    assert n_p == t_p, f"only {n_p}/{t_p} leaves imported"

    with torch.no_grad():
        ref = tmodel(torch.tensor(feats), torch.tensor(feat_lens)).numpy()
    out = enc.apply({"params": params}, jnp.asarray(feats),
                    jnp.asarray(feat_lens), train=False)
    ours = np.asarray(out["audio_embeds"])
    # compare valid frames only (espnet's pad_packed zero-fill vs our masked
    # scan agree on the valid region)
    for i, ln in enumerate(feat_lens // 4):
        np.testing.assert_allclose(ours[i, :ln], ref[i, :ln],
                                   rtol=1e-4, atol=1e-4)


def test_lstm_checkpoint_is_rejected_with_reason(rng):
    """vggblstmp (espnet's default LSTM flavor) cannot load into the GRU
    architecture — the converter says so instead of silently half-loading."""

    class TorchLSTMP(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.ModuleList([TorchVGG2L(), nn.Module()])
            self.enc[1].add_module(
                "birnn0", nn.LSTM(128 * (FDIM // 4), HID,
                                  bidirectional=True, batch_first=True))
            self.enc[1].add_module("bt0", nn.Linear(2 * HID, EMB))

    sd = TorchLSTMP().state_dict()
    msgs = []
    tree = espnet_to_flax(sd, inputdim=FDIM, log=msgs.append)
    assert any("not a GRU" in m for m in msgs)
    assert "bgru0" not in tree["params"]
    # the convs still convert (they are flavor-independent)
    assert "vgg0_conv1" in tree["params"]


def test_non_multiple_of_4_inputdim_rejected(rng):
    """espnet ceil-pools freq (ceil(ceil(83/2)/2)=21) while E2EASREncoder
    floor-pools (20): the flatten layouts cannot line up, so conversion
    must refuse instead of silently mis-permuting (ADVICE r3)."""
    import pytest

    from acvae_tpu.train.pretrained import espnet_to_flax
    with pytest.raises(ValueError, match="not divisible by 4"):
        espnet_to_flax({}, inputdim=83, log=lambda *a: None)
