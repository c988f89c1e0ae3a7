"""SCST: replay must reproduce the rollout exactly; reward math; full step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu import END_IDX
from acvae_tpu.data import CaptionDataset, CaptionLoader, make_synthetic_clotho
from acvae_tpu.models.build import build_model
from acvae_tpu.train.scst import (batch_cider, make_rollout, make_scst_step,
                                  scst_reward, scst_train_step)
from acvae_tpu.train.trainer import TrainState, build_optimizer

E = 16


@pytest.fixture(scope="module")
def setup():
    feats, info, vocab = make_synthetic_clotho(num_audios=4, mel_frames=128)
    ds = CaptionDataset(caption_info=info, vocabulary=vocab, features=feats)
    cfg = {
        "model": "VAEModel",
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": E, "hidden_size": E},
        "model_args": {"posterior_model": "PosteriorRNN",
                       "posterior_args": {"hidden_size": E},
                       "prior_model": "PriorRNN",
                       "prior_args": {"hidden_size": E}},
    }
    model = build_model(cfg, len(vocab), 64)
    loader = CaptionLoader(ds, batch_size=6, buckets=(128,))
    batch = next(iter(loader))
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(batch.feats), jnp.asarray(batch.feat_lens),
        jnp.asarray(batch.caps), jnp.asarray(batch.cap_lens), train=False)
    return model, variables, ds, vocab, loader


class TestReplayEquivalence:
    def test_replay_reproduces_rollout_logprobs(self, setup):
        model, variables, ds, vocab, loader = setup
        batch = next(iter(loader))
        feats = jnp.asarray(batch.feats)
        feat_lens = jnp.asarray(batch.feat_lens)
        key = jax.random.key(7)
        rolled = model.apply(variables, feats, feat_lens,
                             decode_method="sample", max_length=12, temp=1.0,
                             rngs={"sample": key})
        replay = model.apply(variables, feats, feat_lens,
                             jnp.asarray(rolled["seqs"]),
                             method=model.forced_decode,
                             rngs={"sample": key})
        seqs = np.asarray(rolled["seqs"])
        lp_roll = np.asarray(rolled["sampled_logprobs"])
        lp_replay = np.asarray(replay["sampled_logprobs"])
        # mask: position 0 always valid; then prev != end
        mask = np.concatenate(
            [np.ones((seqs.shape[0], 1), bool), seqs[:, :-1] != END_IDX], 1)
        np.testing.assert_allclose(lp_replay[mask], lp_roll[mask],
                                   rtol=1e-4, atol=1e-5)


class TestReward:
    def test_batch_cider_dedup(self):
        refs = {"a": ["a dog barks"], "b": ["rain falls"]}
        scores = batch_cider(["a dog barks", "a cat", "rain falls"],
                             ["a", "a", "b"], refs, dedup=True)
        assert scores[0] == scores[1]  # duplicate key shares first score

    def test_nscst_leave_one_out(self):
        refs = {"a": ["a dog barks loudly today"]}
        sampled = np.array([[1, 5, 2, 2], [1, 6, 2, 2]])

        class FakeVocab:
            idx2word = {5: "dog", 6: "cat"}

            def decode(self, ids):
                return [self.idx2word.get(int(i), "x") for i in ids
                        if int(i) not in (1, 2)]

        out = scst_reward(sampled, None, ["a"], refs, FakeVocab(), sample_n=2)
        # with n=2 the baselines swap: reward[0] = s0 - s1, reward[1] = s1 - s0
        np.testing.assert_allclose(out["reward"][0], -out["reward"][1],
                                   rtol=1e-6)


class TestFullStep:
    def test_scst_step_runs(self, setup):
        model, variables, ds, vocab, loader = setup
        tx = build_optimizer("Adam", 1e-4, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        rollout = make_rollout(model, sample_n=1, max_length=12)
        step = make_scst_step(model, sample_n=1)
        batch = next(iter(loader))
        key2refs = ds.refs()
        state, metrics = scst_train_step(
            state, rollout, step,
            lambda s: {"params": s.params, "batch_stats": s.batch_stats},
            batch, batch.audio_ids, key2refs, vocab, jax.random.key(3))
        assert np.isfinite(metrics["loss"])
        assert "reward" in metrics

    def test_nscst_step_runs(self, setup):
        model, variables, ds, vocab, loader = setup
        tx = build_optimizer("Adam", 1e-4, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        rollout = make_rollout(model, sample_n=3, max_length=12)
        step = make_scst_step(model, sample_n=3)
        batch = next(iter(loader))
        state, metrics = scst_train_step(
            state, rollout, step,
            lambda s: {"params": s.params, "batch_stats": s.batch_stats},
            batch, batch.audio_ids, ds.refs(), vocab, jax.random.key(3),
            sample_n=3)
        assert np.isfinite(metrics["loss"])


def _family_cfg(name):
    dec_args = {"embed_size": E, "hidden_size": E}
    if name == "Seq2SeqAttnModel":
        return {"model": name, "decoder": "RNNBahdanauAttnDecoder",
                "decoder_args": dec_args, "model_args": {}}
    if name == "TransformerModel":
        return {"model": name, "decoder": "TransformerDecoder",
                "decoder_args": {**dec_args, "nhead": 2, "nlayers": 1},
                "model_args": {}}
    if name == "TransVAEModel":
        return {"model": name, "decoder": "VAETransformerDecoder",
                "decoder_args": {**dec_args, "nhead": 2, "nlayers": 1},
                "model_args": {"posterior_model": "PosteriorRNN",
                               "posterior_args": {"hidden_size": E},
                               "prior_model": "PriorRNN",
                               "prior_args": {"hidden_size": E}}}
    if name == "SimpleVAEModel":
        return {"model": name, "decoder": "VAERNNBahdanauAttnDecoder",
                "decoder_args": dec_args,
                "model_args": {"posterior_model": "PosteriorSentence",
                               "posterior_args": {"hidden_size": E}}}
    raise ValueError(name)


@pytest.mark.parametrize("name", ["Seq2SeqAttnModel", "TransformerModel",
                                  "TransVAEModel", "SimpleVAEModel"])
class TestReplayAllFamilies:
    """The reference's ScstWrapper wraps ANY caption model
    (seq_train_model.py:10-93) — every family must support the
    rollout → exact-replay contract, not just the RNN VAE."""

    def test_replay_reproduces_rollout_logprobs(self, setup, name):
        _, _, ds, vocab, loader = setup
        cfg = dict(_family_cfg(name), encodermodel="Cnn10",
                   encoder_args={"embed_size": E, "channels": (4, 8, 8, E)})
        model = build_model(cfg, len(vocab), 64)
        batch = next(iter(loader))
        feats = jnp.asarray(batch.feats)
        feat_lens = jnp.asarray(batch.feat_lens)
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            feats, feat_lens, jnp.asarray(batch.caps),
            jnp.asarray(batch.cap_lens), train=False)
        key = jax.random.key(11)
        rolled = model.apply(variables, feats, feat_lens,
                             decode_method="sample", max_length=10, temp=1.0,
                             rngs={"sample": key})
        replay = model.apply(variables, feats, feat_lens,
                             jnp.asarray(rolled["seqs"]),
                             method=model.forced_decode,
                             rngs={"sample": key})
        seqs = np.asarray(rolled["seqs"])
        lp_roll = np.asarray(rolled["sampled_logprobs"])
        lp_replay = np.asarray(replay["sampled_logprobs"])
        mask = np.concatenate(
            [np.ones((seqs.shape[0], 1), bool), seqs[:, :-1] != END_IDX], 1)
        np.testing.assert_allclose(lp_replay[mask], lp_roll[mask],
                                   rtol=1e-4, atol=1e-5)
