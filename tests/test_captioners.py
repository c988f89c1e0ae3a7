"""Non-VAE captioners + transformer VAE: train forward, decode, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.models.build import build_model
from acvae_tpu.ops.masked import length_mask

V, E, N, TMEL, F, L = 23, 16, 3, 64, 64, 8


def _batch(rng):
    feats = jnp.asarray(rng.normal(size=(N, TMEL, F)).astype(np.float32))
    feat_lens = jnp.array([TMEL, 48, 32])
    caps = jnp.asarray(rng.integers(4, V, size=(N, L)))
    caps = caps.at[:, 0].set(1)
    lens = jnp.array([L, 5, 6])
    caps = jnp.where(length_mask(lens, L), caps, 0)
    caps = caps.at[jnp.arange(N), lens - 1].set(2)
    return feats, feat_lens, caps, lens


def _cfg(model, decoder, **model_args):
    return {
        "model": model,
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
        "decoder": decoder,
        "decoder_args": {"embed_size": E, "hidden_size": E, "nhead": 2,
                         "nlayers": 1}
        if "Transformer" in decoder else {"embed_size": E, "hidden_size": E},
        "model_args": model_args,
    }


def _init(model, batch):
    feats, feat_lens, caps, lens = batch
    return model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        feats, feat_lens, caps, lens, train=False)


@pytest.mark.parametrize("name,decoder", [
    ("Seq2SeqAttnModel", "RNNBahdanauAttnDecoder"),
    ("TransformerModel", "TransformerDecoder"),
])
class TestPlainCaptioners:
    def test_train_and_decode(self, rng, name, decoder):
        cfg = _cfg(name, decoder)
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        feats, feat_lens, caps, lens = batch
        variables = _init(model, batch)
        out, _ = model.apply(
            variables, feats, feat_lens, caps, lens, ss_ratio=1.0, train=True,
            rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        assert out["logits"].shape == (N, L - 1, V)
        assert jnp.all(jnp.isfinite(out["logits"]))

        greedy = model.apply(variables, feats, feat_lens,
                             decode_method="greedy", max_length=10,
                             rngs={"sample": jax.random.key(4)})
        assert greedy["seqs"].shape == (N, 10)
        beam = model.apply(variables, feats, feat_lens, decode_method="beam",
                           beam_size=3, max_length=9,
                           rngs={"sample": jax.random.key(5)})
        assert beam["seqs"].shape == (N, 3, 9)

    def test_gradients(self, rng, name, decoder):
        from acvae_tpu.ops.losses import cross_entropy
        cfg = _cfg(name, decoder)
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        feats, feat_lens, caps, lens = batch
        variables = _init(model, batch)
        mask = length_mask(lens - 1, L - 1)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, feat_lens, caps, lens, ss_ratio=1.0, train=True,
                rngs={"sample": jax.random.key(2),
                      "dropout": jax.random.key(3)},
                mutable=["batch_stats"])
            return cross_entropy(out["logits"], caps[:, 1:], mask)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert jnp.isfinite(loss)
        assert all(jnp.all(jnp.isfinite(g))
                   for g in jax.tree_util.tree_leaves(grads))


class TestTransVAE:
    def test_train_decode_beam(self, rng):
        cfg = _cfg("TransVAEModel", "VAETransformerDecoder",
                   posterior_model="PosteriorRNN",
                   posterior_args={"hidden_size": E},
                   prior_model="PriorRNN", prior_args={"hidden_size": E})
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        feats, feat_lens, caps, lens = batch
        variables = _init(model, batch)
        out, _ = model.apply(
            variables, feats, feat_lens, caps, lens,
            ss_ratio=0.8, dis_ratio=0.2, train=True,
            rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        assert out["logits"].shape == (N, L - 1, V)
        assert out["q_means"].shape == (N, L - 1, E)
        assert out["p_means"].shape == (N, L - 1, E)
        assert jnp.all(jnp.isfinite(out["logits"]))

        greedy = model.apply(variables, feats, feat_lens,
                             decode_method="greedy", max_length=8,
                             rngs={"sample": jax.random.key(4)})
        assert greedy["seqs"].shape == (N, 8)
        beam = model.apply(variables, feats, feat_lens, decode_method="beam",
                           beam_size=2, max_length=7,
                           rngs={"sample": jax.random.key(5)})
        assert beam["seqs"].shape == (N, 2, 7)

    def test_gmm_prior_trains_and_decodes(self, rng):
        """Regression: TransVAEModel + GMMPriorRNN must re-layout the
        [K, T, N, E] scanned prior moments to [K, N, T, E] and surface
        p_mixture_logits, or the trainer's gmm_kl_loss branch crashes
        (same post-scan handling as models/vae.py)."""
        from acvae_tpu.train.trainer import (TrainState, build_optimizer,
                                             make_train_step)
        K = 2
        cfg = _cfg("TransVAEModel", "VAETransformerDecoder",
                   posterior_model="PosteriorRNN",
                   posterior_args={"hidden_size": E},
                   prior_model="GMMPriorRNN",
                   prior_args={"hidden_size": E, "gmm_kernel": K})
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        feats, feat_lens, caps, lens = batch
        variables = _init(model, batch)
        out, _ = model.apply(
            variables, feats, feat_lens, caps, lens,
            ss_ratio=0.8, dis_ratio=0.2, train=True,
            rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        assert out["p_means"].shape == (K, N, L - 1, E)
        assert out["p_mixture_logits"].shape == (K,)
        assert out["q_means"].shape == (N, L - 1, E)

        beam = model.apply(variables, feats, feat_lens, decode_method="beam",
                           beam_size=2, max_length=7,
                           rngs={"sample": jax.random.key(5)})
        assert beam["seqs"].shape == (N, 2, 7)

        # one full trainer step through the gmm_kl_loss branch (donates
        # `variables`' buffers — keep it last)
        tx = build_optimizer("Adam", 1e-3, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        step = make_train_step(model)
        arrays = {"feats": feats, "feat_lens": feat_lens,
                  "caps": caps, "cap_lens": lens}
        state, metrics = step(state, arrays, jax.random.key(7),
                              1.0, 0.0, 0.5, 0.0)
        assert np.isfinite(float(metrics["kl"]))
        assert np.isfinite(float(metrics["ce"]))
