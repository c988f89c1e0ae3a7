"""Full-model torch checkpoint import (train/pretrained.py::acvae_to_flax).

Round-trip proof for VERDICT r2 task 3: assemble the reference flagship
(Hybrid_VAEModel = Cnn10 + PosteriorRNN + PriorRNN + VAERNNBahdanauAttnDecoder
+ global head, ``models/vae_model.py:674-1048``) in torch with the
reference's exact parameter NAMING, convert the state dict, and check

* every parameter/batch-stat leaf of our flax model loads (no fresh-init
  leftovers), and
* teacher-forced logits match to f32 tolerance (the torch forward below
  re-expresses the reference math, as in tests/test_module_parity.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from acvae_tpu.models.build import build_model  # noqa: E402
from acvae_tpu.train.pretrained import acvae_to_flax, merge_pretrained  # noqa: E402
from tests.test_pretrained_pann import TorchCnn10, _randomize_bn_stats  # noqa: E402

V, E, N, L = 25, 512, 2, 6
TMEL, FDIM = 32, 64  # -> T' = 2 encoder frames


class TorchSeq2SeqAttention(nn.Module):
    """attn_model.py:6-46 naming (h2attn, v)."""

    def __init__(self, hs_enc, hs_dec, attn_size):
        super().__init__()
        self.h2attn = nn.Linear(hs_enc + hs_dec, attn_size)
        self.v = nn.Parameter(torch.randn(attn_size))

    def forward(self, h_dec, h_enc, lens):
        S = h_enc.shape[1]
        q = h_dec.unsqueeze(1).repeat(1, S, 1)
        score = torch.tanh(self.h2attn(torch.cat((q, h_enc), -1))) @ self.v
        mask = torch.arange(S)[None, :] < lens[:, None]
        score = score.masked_fill(~mask, -1e10)
        w = torch.softmax(score, -1)
        ctx = (w.unsqueeze(1) @ h_enc).squeeze(1)
        return ctx, w


class TorchVAEDecoder(nn.Module):
    """VAERNNBahdanauAttnDecoder naming (decoder.py:164-203)."""

    def __init__(self):
        super().__init__()
        self.word_embeddings = nn.Embedding(V, E)
        self.attn = TorchSeq2SeqAttention(E, E, E)
        self.model = nn.GRU(3 * E, E, batch_first=True)
        self.classifier = nn.Linear(E, V)

    def step(self, word, state, enc_mem, lens, z):
        emb = self.word_embeddings(word)
        ctx, _ = self.attn(state, enc_mem, lens)
        x = torch.cat([emb, ctx, z], -1)
        out, h = self.model(x.unsqueeze(1), state.unsqueeze(0))
        h = h.squeeze(0)
        return self.classifier(h), h


class TorchPosterior(nn.Module):
    """PosteriorRNN naming (text_encoder.py:96-154)."""

    def __init__(self):
        super().__init__()
        self.word_embedding = nn.Embedding(V, E)
        self.network = nn.GRU(E, E, bidirectional=True, batch_first=True)
        self.mean_log_out = nn.Linear(E + 2 * E, 2 * E)

    def forward(self, caps, lens, eps):
        x = self.word_embedding(caps[:, :-1])
        packed = nn.utils.rnn.pack_padded_sequence(
            x, lens - 1, batch_first=True, enforce_sorted=False)
        out, _ = self.network(packed)
        hid, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=caps.shape[1] - 1)
        z_prev = torch.zeros(caps.shape[0], E)
        zs = []
        for t in range(caps.shape[1] - 1):
            ml = self.mean_log_out(torch.cat([hid[:, t], z_prev], -1))
            mean, log = ml[:, :E], ml[:, E:]
            z_t = eps[:, t] * torch.exp(0.5 * log) + mean
            zs.append(z_t)
            z_prev = z_t
        return torch.stack(zs, 1)


class TorchPrior(nn.Module):
    """PriorRNN naming (text_encoder.py:218-268)."""

    def __init__(self):
        super().__init__()
        self.word_embedding = nn.Embedding(V, E)
        self.word_attn = TorchSeq2SeqAttention(E, E, E)
        self.network = nn.LSTM(3 * E, E, batch_first=True)
        self.mean_log_out = nn.Linear(E, 2 * E)

    def step(self, word, enc_mem, lens, state, last_z):
        emb = self.word_embedding(word)
        ctx, _ = self.word_attn(emb, enc_mem, lens)
        x = torch.cat([emb, ctx, last_z], -1)
        out, (h, c) = self.network(x.unsqueeze(1), state)
        ml = self.mean_log_out(h.squeeze(0))
        return ml[:, :E], (h, c)  # eps=0 -> z = mean


class TorchFlagship(nn.Module):
    """Hybrid_VAEModel top-level naming (vae_model.py:674-696)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchCnn10()
        self.decoder = TorchVAEDecoder()
        self.qnet = TorchPosterior()
        self.pnet = TorchPrior()
        self.mean_log_out = nn.Linear(E, 2 * E)  # global head (:693)


def _flagship_conf():
    return {
        "model": "Hybrid_VAEModel",
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": E},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": E, "hidden_size": E},
        "model_args": {"posterior_model": "PosteriorRNN",
                       "posterior_args": {"hidden_size": E},
                       "prior_model": "PriorRNN",
                       "prior_args": {"hidden_size": E}},
        "seed": 1,
    }


@pytest.fixture(scope="module")
def imported():
    rng = np.random.default_rng(7)
    tmodel = TorchFlagship().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    conf = _flagship_conf()
    tree = acvae_to_flax(tmodel.state_dict(), conf, log=lambda *a: None)

    model = build_model(conf, V, FDIM)
    feats = rng.normal(size=(N, TMEL, FDIM)).astype(np.float32)
    feat_lens = np.array([TMEL, TMEL // 2])
    caps = rng.integers(3, V, size=(N, L)).astype(np.int32)
    cap_lens = np.array([L, L - 2])
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(feats), jnp.asarray(feat_lens), jnp.asarray(caps),
        jnp.asarray(cap_lens), train=False)
    params, n_p, t_p = merge_pretrained(variables["params"], tree["params"],
                                        log=print)
    stats, n_s, t_s = merge_pretrained(variables["batch_stats"],
                                       tree["batch_stats"], log=print)
    return (tmodel, model, {"params": params, "batch_stats": stats},
            (n_p, t_p, n_s, t_s),
            (feats, feat_lens, caps, cap_lens))


def test_every_leaf_loads(imported):
    _, _, _, (n_p, t_p, n_s, t_s), _ = imported
    assert n_p == t_p, f"params: only {n_p}/{t_p} leaves imported"
    assert n_s == t_s, f"batch_stats: only {n_s}/{t_s} leaves imported"


def test_teacher_forced_logits_match(imported):
    """Full-model forward parity: encoder -> posterior z-chain -> per-step
    prior + decoder (teacher forcing, dis_ratio=0 so the decoder consumes
    q_z; prior eps=0 so the carried last_z is the prior mean)."""
    tmodel, model, variables, _, (feats, feat_lens, caps, cap_lens) = imported
    rng = np.random.default_rng(11)
    eps_q = rng.normal(size=(N, L - 1, E)).astype(np.float32)

    # ---- torch forward (reference math, vae_model.py:57-139) ----
    with torch.no_grad():
        enc_mem, _ = tmodel.encoder(torch.tensor(feats),
                                    torch.tensor(feat_lens // 16))
        enc_lens = torch.tensor(feat_lens // 16)
        q_z = tmodel.qnet(torch.tensor(caps).long(),
                          torch.tensor(cap_lens), torch.tensor(eps_q))
        state = torch.zeros(N, E)
        p_state = (torch.zeros(1, N, E), torch.zeros(1, N, E))
        last_z = torch.zeros(N, E)
        logits_ref = []
        for t in range(L - 1):
            word = torch.tensor(caps[:, t]).long()
            p_mean, p_state = tmodel.pnet.step(word, enc_mem, enc_lens,
                                               p_state, last_z)
            logit, state = tmodel.decoder.step(word, state, enc_mem,
                                               enc_lens, q_z[:, t])
            logits_ref.append(logit)
            last_z = p_mean
        logits_ref = torch.stack(logits_ref, 1).numpy()

    # ---- ours through the imported params ----
    def forced(m, feats, feat_lens, caps, cap_lens, eps_q):
        encoded = m.encode(feats, feat_lens, train=False)
        enc_mem, enc_mask, p_proj, d_proj = m._prep_ctx(encoded)
        qnetout = m.qnet(caps, cap_lens, eps_q)
        dt = m.decoder.state_dtype()
        dec_h = m.decoder.init_state(N, dt)
        p_state = m.pnet.init_state(N, dt)
        last_z = jnp.zeros((N, E), dt)
        zero_eps = jnp.zeros((N, E), dt)
        logits = []
        for t in range(L - 1):
            p, d = m._step_pair(caps[:, t], dec_h, p_state, last_z,
                                zero_eps, lambda p: qnetout["q_z"][:, t],
                                enc_mem, enc_mask, p_proj, d_proj,
                                train=False)
            logits.append(d["logits"])
            dec_h, p_state, last_z = d["state"], p["state"], p["z"]
        return jnp.stack(logits, 1)

    logits = model.apply(variables, jnp.asarray(feats),
                         jnp.asarray(feat_lens), jnp.asarray(caps),
                         jnp.asarray(cap_lens), jnp.asarray(eps_q),
                         method=forced)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-3, atol=1e-3)


def test_import_torch_cli(tmp_path, imported):
    """cli import_torch writes an experiment dir evaluate() can read."""
    tmodel, *_ = imported
    pth = tmp_path / "best.pth"
    # the reference dumps {"model": state_dict, ...} (pytorch_runner_vae
    # .py:380-388)
    torch.save({"model": tmodel.state_dict()}, pth)

    import yaml

    conf = _flagship_conf()
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(conf, f)

    from acvae_tpu.data.vocab import Vocabulary
    vocabulary = Vocabulary()
    for w in [f"w{i}" for i in range(V - 4)]:
        vocabulary.add_word(w)
    vocab_path = tmp_path / "vocab.pkl"
    vocabulary.save(str(vocab_path))

    from acvae_tpu.cli.main import Runner
    out = Runner().import_torch(str(pth), str(cfg_path),
                             str(tmp_path / "exp"), str(vocab_path),
                             data_dim=FDIM, mel_bucket=TMEL)
    assert out["params_loaded"] == out["params_total"]
    assert (tmp_path / "exp" / "best").exists()
    assert (tmp_path / "exp" / "config.yaml").exists()
    assert (tmp_path / "exp" / "vocab.pkl").exists()
