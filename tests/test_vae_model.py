"""End-to-end model tests: init, train forward, greedy/sample/beam/DBS decode,
gradient flow — on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu import END_IDX
from acvae_tpu.models.decoders import VAERNNBahdanauAttnDecoder
from acvae_tpu.models.encoders import Cnn10
from acvae_tpu.models.latent import PosteriorRNN, PosteriorRNNHybrid, PriorRNN, PosteriorSentence
from acvae_tpu.models.vae import SimpleVAECaptionModel, VAECaptionModel
from acvae_tpu.ops.losses import label_smoothing_loss, normal_kl_loss
from acvae_tpu.ops.masked import length_mask

V = 23   # vocab
E = 16   # embed
N = 3    # batch
TMEL = 64  # mel frames (divisible by 16)
F = 64   # mel bins
L = 8    # caption length (incl <start>/<end>)


def tiny_model(global_constraint=False):
    enc = Cnn10(inputdim=F, embed_size=E, channels=(4, 8, 8, E))
    dec = VAERNNBahdanauAttnDecoder(vocab_size=V, enc_mem_size=E, embed_size=E,
                                    hidden_size=E)
    qnet = (PosteriorRNNHybrid if global_constraint else PosteriorRNN)(
        vocab_size=V, word_dim=E, embed_size=E, hidden_size=E)
    pnet = PriorRNN(vocab_size=V, word_dim=E, audiofeats_size=E, embed_size=E,
                    hidden_size=E)
    return VAECaptionModel(encoder=enc, decoder=dec, qnet=qnet, pnet=pnet,
                           global_constraint=global_constraint)


@pytest.fixture
def batch(rng):
    feats = jnp.asarray(rng.normal(size=(N, TMEL, F)).astype(np.float32))
    feat_lens = jnp.array([TMEL, 48, 32])
    caps = jnp.asarray(rng.integers(4, V, size=(N, L)))
    caps = caps.at[:, 0].set(1)
    lens = jnp.array([L, 5, 6])
    mask = length_mask(lens, L)
    caps = jnp.where(mask, caps, 0)
    caps = caps.at[jnp.arange(N), lens - 1].set(2)  # <end>
    return feats, feat_lens, caps, lens


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    r = np.random.default_rng(1)
    feats = jnp.asarray(r.normal(size=(N, TMEL, F)).astype(np.float32))
    feat_lens = jnp.array([TMEL, 48, 32])
    caps = jnp.asarray(r.integers(4, V, size=(N, L)))
    lens = jnp.full((N,), L)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        feats, feat_lens, caps, lens, train=False)
    return model, variables


class TestTrainForward:
    def test_shapes_and_finiteness(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, caps, cap_lens = batch
        out, _ = model.apply(
            variables, feats, feat_lens, caps, cap_lens,
            ss_ratio=0.7, dis_ratio=0.3, train=True,
            rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        T = L - 1
        assert out["logits"].shape == (N, T, V)
        assert out["q_means"].shape == (N, T, E)
        assert out["p_means"].shape == (N, T, E)
        assert out["p_z"].shape == (N, T, E)
        assert out["seqs"].shape == (N, T)
        for k in ("logits", "q_means", "q_logs", "p_means", "p_logs"):
            assert jnp.all(jnp.isfinite(out[k])), k

    def test_loss_and_grads(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, caps, cap_lens = batch
        mask = length_mask(cap_lens - 1, L - 1)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, feat_lens, caps, cap_lens,
                ss_ratio=1.0, dis_ratio=0.0, train=True,
                rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
                mutable=["batch_stats"])
            ce = label_smoothing_loss(out["logits"], caps[:, 1:], 0.1, mask)
            kl = normal_kl_loss(out["q_means"], out["q_logs"],
                                out["p_means"], out["p_logs"], mask)
            return ce + 0.5 * kl

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert jnp.isfinite(loss)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
        # posterior, prior, decoder and encoder all receive gradient
        nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
        assert nonzero > len(leaves) * 0.8

    def test_hybrid_global_constraint(self, batch):
        model = tiny_model(global_constraint=True)
        feats, feat_lens, caps, cap_lens = batch
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            feats, feat_lens, caps, cap_lens, train=False)
        out, _ = model.apply(
            variables, feats, feat_lens, caps, cap_lens,
            ss_ratio=1.0, dis_ratio=0.0, train=True,
            rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        assert out["q_means_utt"].shape == (N, 2 * E)
        assert out["p_means_utt"].shape == (N, 2 * E)


class TestInference:
    def test_greedy_finished_semantics(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch
        out = model.apply(variables, feats, feat_lens, decode_method="greedy",
                          max_length=12, rngs={"sample": jax.random.key(5)})
        seqs = np.asarray(out["seqs"])
        assert seqs.shape == (N, 12)
        # once <end> appears, everything after must be <end>
        for row in seqs:
            ended = False
            for w in row:
                if ended:
                    assert w == END_IDX
                if w == END_IDX:
                    ended = True

    def test_sample_differs_across_keys(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch
        a = model.apply(variables, feats, feat_lens, decode_method="sample",
                        max_length=12, temp=2.0, rngs={"sample": jax.random.key(5)})
        b = model.apply(variables, feats, feat_lens, decode_method="sample",
                        max_length=12, temp=2.0, rngs={"sample": jax.random.key(6)})
        assert not np.array_equal(np.asarray(a["seqs"]), np.asarray(b["seqs"]))

    def test_beam_search(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch
        out = model.apply(variables, feats, feat_lens, decode_method="beam",
                          beam_size=3, max_length=10,
                          rngs={"sample": jax.random.key(5)})
        assert out["seqs"].shape == (N, 3, 10)
        assert out["scores"].shape == (N, 3)
        # beams sorted: beam 0 has the highest raw score
        s = np.asarray(out["scores"])
        assert np.all(s[:, 0] >= s[:, -1])

    def test_dbs(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch
        out = model.apply(variables, feats, feat_lens, decode_method="dbs",
                          beam_size=4, group_size=2, max_length=8,
                          group_nbest=True, rngs={"sample": jax.random.key(5)})
        assert out["seqs"].shape == (N, 4, 8)
        out2 = model.apply(variables, feats, feat_lens, decode_method="dbs",
                           beam_size=4, group_size=2, max_length=8,
                           group_nbest=False, rngs={"sample": jax.random.key(5)})
        assert out2["seqs"].shape == (N, 2, 8)

    def test_jit_greedy(self, model_and_params, batch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch

        @jax.jit
        def decode(v, f, fl, key):
            return model.apply(v, f, fl, decode_method="greedy", max_length=12,
                               rngs={"sample": key})

        out = decode(variables, feats, feat_lens, jax.random.key(5))
        assert out["seqs"].shape == (N, 12)


class TestSimpleVAE:
    def test_train_and_beam(self, batch):
        feats, feat_lens, caps, cap_lens = batch
        enc = Cnn10(inputdim=F, embed_size=E, channels=(4, 8, 8, E))
        from acvae_tpu.models.decoders import VAERNNBahdanauAttnDecoder
        dec = VAERNNBahdanauAttnDecoder(vocab_size=V, enc_mem_size=E,
                                        embed_size=E, hidden_size=E)
        qnet = PosteriorSentence(vocab_size=V, word_dim=E, embed_size=E,
                                 hidden_size=E)
        model = SimpleVAECaptionModel(encoder=enc, decoder=dec, qnet=qnet)
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            feats, feat_lens, caps, cap_lens, train=False)
        out, _ = model.apply(
            variables, feats, feat_lens, caps, cap_lens, ss_ratio=1.0,
            train=True,
            rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        assert out["q_means"].shape == (N, E)
        assert out["logits"].shape == (N, L - 1, V)
        beam = model.apply(variables, feats, feat_lens, decode_method="beam",
                           beam_size=2, max_length=6,
                           rngs={"sample": jax.random.key(4)})
        assert beam["seqs"].shape == (N, 2, 6)


class TestFusedStep:
    """ACVAE_FUSED_STEP=1 batches the prior-LSTM and decoder-GRU gate
    matmuls into one MXU call, leaving only the z rows of the GRU input
    projection on the z-critical path (models/vae.py::_fused_gate_step).
    Zero padding contributes exact zeros, so every decode flavor must match
    the sequential path to float tolerance — and token-exactly at test
    scale."""

    def _decode(self, model, variables, feats, feat_lens, fused,
                monkeypatch, method="beam", **kw):
        if fused:
            monkeypatch.setenv("ACVAE_FUSED_STEP", "1")
        else:
            monkeypatch.delenv("ACVAE_FUSED_STEP", raising=False)
        return model.apply(variables, feats, feat_lens,
                           decode_method=method, max_length=6,
                           rngs={"sample": jax.random.key(5)}, **kw)

    def test_all_decode_flavors_match(self, model_and_params, batch,
                                      monkeypatch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch
        for method, kw in (("beam", {"beam_size": 3}), ("greedy", {}),
                           ("dbs", {"beam_size": 4, "group_size": 2})):
            a = self._decode(model, variables, feats, feat_lens, False,
                             monkeypatch, method, **kw)
            b = self._decode(model, variables, feats, feat_lens, True,
                             monkeypatch, method, **kw)
            np.testing.assert_array_equal(
                np.asarray(a["seqs"]), np.asarray(b["seqs"]),
                err_msg=f"{method} tokens diverged under fused step")

    def test_train_forward_unaffected(self, model_and_params, batch,
                                      monkeypatch):
        """The fused step is inference-only; train_forward must be
        bit-identical with the env var set."""
        model, variables = model_and_params
        feats, feat_lens, caps, cap_lens = batch

        def train_out():
            out, _ = model.apply(
                variables, feats, feat_lens, caps, cap_lens, ss_ratio=1.0,
                train=True,
                rngs={"sample": jax.random.key(2),
                      "dropout": jax.random.key(3)},
                mutable=["batch_stats"])
            return out

        monkeypatch.delenv("ACVAE_FUSED_STEP", raising=False)
        a = train_out()
        monkeypatch.setenv("ACVAE_FUSED_STEP", "1")
        b = train_out()
        np.testing.assert_array_equal(np.asarray(a["logits"]),
                                      np.asarray(b["logits"]))


class TestFusedAttention:
    """ACVAE_FUSED_ATTN=1 computes the prior and decoder attention reads as
    one stacked pass (models/attention.py stacked_attention_read) — same
    math, fewer serial ops; every decode flavor must match the sequential
    path to float tolerance, and beam tokens exactly (at these scales)."""

    def _decode(self, model, variables, feats, feat_lens, fused,
                monkeypatch, method="beam", **kw):
        if fused:
            monkeypatch.setenv("ACVAE_FUSED_ATTN", "1")
        else:
            monkeypatch.delenv("ACVAE_FUSED_ATTN", raising=False)
        return model.apply(variables, feats, feat_lens,
                           decode_method=method, max_length=6,
                           rngs={"sample": jax.random.key(5)}, **kw)

    def test_beam_and_greedy_match(self, model_and_params, batch,
                                   monkeypatch):
        model, variables = model_and_params
        feats, feat_lens, _, _ = batch
        for method, kw in (("beam", {"beam_size": 3}), ("greedy", {}),
                           ("dbs", {"beam_size": 4, "group_size": 2})):
            a = self._decode(model, variables, feats, feat_lens, False,
                             monkeypatch, method, **kw)
            b = self._decode(model, variables, feats, feat_lens, True,
                             monkeypatch, method, **kw)
            np.testing.assert_array_equal(
                np.asarray(a["seqs"]), np.asarray(b["seqs"]),
                err_msg=f"{method} tokens diverged under fused attention")

    def test_train_forward_matches(self, model_and_params, batch,
                                   monkeypatch):
        model, variables = model_and_params
        feats, feat_lens, caps, lens = batch

        def fwd():
            return model.apply(variables, feats, feat_lens, caps, lens,
                               ss_ratio=0.8, dis_ratio=0.3, train=False,
                               rngs={"sample": jax.random.key(3)})
        monkeypatch.delenv("ACVAE_FUSED_ATTN", raising=False)
        a = fwd()
        monkeypatch.setenv("ACVAE_FUSED_ATTN", "1")
        b = fwd()
        for k in ("logits", "p_means", "p_logs"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=2e-5, atol=2e-6, err_msg=k)
        np.testing.assert_array_equal(np.asarray(a["seqs"]),
                                      np.asarray(b["seqs"]))
