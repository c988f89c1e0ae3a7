"""Ensemble decode + stage1/global-vae/scst CLI commands on synthetic data."""
import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from acvae_tpu.cli.main import Runner
from acvae_tpu.data.aux_datasets import CaptionCorpus, Stage1Dataset
from acvae_tpu.data.synthetic import make_synthetic_clotho
from acvae_tpu.data.vocab import Vocabulary
from acvae_tpu.decoding.ensemble import ensemble_decode
from acvae_tpu.models.build import build_model

E = 16


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ens")
    feats, info, vocab = make_synthetic_clotho(num_audios=6, mel_frames=128)
    h5path = str(root / "mels.h5")
    with h5py.File(h5path, "w") as f:
        for aid, mel in feats.items():
            f[aid] = mel
    import pandas as pd
    pd.DataFrame({"audio_id": list(feats), "hdf5_path": h5path}).to_csv(
        root / "mels.csv", sep="\t", index=False)
    with open(root / "text.json", "w") as f:
        json.dump({"audios": info}, f)
    vocab.save(str(root / "vocab.pkl"))
    config = {
        "model": "VAEModel",
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": E, "channels": [4, 8, 8, E]},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": E, "hidden_size": E},
        "model_args": {"posterior_model": "PosteriorRNN",
                       "posterior_args": {"hidden_size": E},
                       "prior_model": "PriorRNN",
                       "prior_args": {"hidden_size": E}},
        "h5_csv": str(root / "mels.csv"),
        "caption_file": str(root / "text.json"),
        "vocab_file": str(root / "vocab.pkl"),
        "outputpath": str(root / "experiments"),
        "epochs": 1, "batch_size": 8, "train_percent": 80,
        # real scheduler + args: the scst command must drop these when it
        # switches to a constant fine-tuning lr (regression for the
        # constant_schedule(final_lr=...) TypeError)
        "scheduler": "ExponentialDecayScheduler",
        "scheduler_args": {"final_lr": 5.0e-7, "warmup_iters": 2},
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    return root


class TestAuxDatasets:
    def test_caption_corpus(self, workspace):
        info = json.load(open(workspace / "text.json"))["audios"]
        vocab = Vocabulary.load(str(workspace / "vocab.pkl"))
        corpus = CaptionCorpus(info, vocab)
        assert len(corpus) == 30
        caps, lens = next(corpus.batches(8))
        assert caps.shape == (8, 22)
        assert np.all(caps[:, 0] == 1)

    def test_stage1_groups(self, workspace):
        info = json.load(open(workspace / "text.json"))["audios"]
        vocab = Vocabulary.load(str(workspace / "vocab.pkl"))
        ds = Stage1Dataset(info, vocab, uttnumbers=5)
        caps, lens = next(ds.batches(audios_per_batch=2))
        assert caps.shape == (10, 22)


class TestEnsemble:
    def test_two_member_ensemble(self, workspace):
        info = json.load(open(workspace / "text.json"))["audios"]
        vocab = Vocabulary.load(str(workspace / "vocab.pkl"))
        cfg = yaml.safe_load(open(workspace / "config.yaml"))
        feats = jnp.asarray(np.random.default_rng(0).normal(
            size=(3, 128, 64)).astype(np.float32))
        feat_lens = jnp.array([128, 96, 64])
        members = []
        for seed in (0, 1):
            model = build_model(cfg, len(vocab), 64)
            caps = jnp.ones((3, 8), jnp.int32)
            lens = jnp.full((3,), 8)
            variables = model.init(
                {"params": jax.random.key(seed),
                 "sample": jax.random.key(seed + 10)},
                feats, feat_lens, caps, lens, train=False)
            members.append((model, variables))
        out = ensemble_decode(members, feats, feat_lens, jax.random.key(5),
                              decode_method="beam", beam_size=2, max_length=8)
        assert out["seqs"].shape == (3, 2, 8)
        out_g = ensemble_decode(members, feats, feat_lens, jax.random.key(5),
                                decode_method="greedy", max_length=8)
        assert out_g["seqs"].shape == (3, 8)


class TestAuxCommands:
    def test_stage1_and_extract(self, workspace, tmp_path):
        out = Runner().stage1(str(workspace / "text.json"),
                              str(workspace / "vocab.pkl"),
                              output_dir=str(tmp_path / "s1"),
                              epochs=2, audios_per_batch=3, embed_size=8)
        assert os.path.exists(os.path.join(out, "stage1_params.pkl"))
        emb_dir = Runner().extract_embedding(
            out, str(workspace / "text.json"), str(workspace / "vocab.pkl"),
            str(tmp_path / "emb"), embed_size=8)
        first = json.load(open(workspace / "text.json"))["audios"][0]
        assert os.path.exists(os.path.join(emb_dir, first["audio_id"],
                                           "0.npy"))
        assert os.path.exists(os.path.join(emb_dir, first["audio_id"],
                                           "caption.npy"))
        eer = Runner().stage1_test(out, str(workspace / "text.json"),
                                   str(workspace / "vocab.pkl"),
                                   audios_per_batch=3, uttnumbers=4,
                                   embed_size=8)
        assert 0.0 <= eer <= 1.0
        pngs = Runner().tsne(emb_dir,
                             output_prefix=str(tmp_path / "tsne"),
                             num_audios=4)
        assert all(os.path.exists(p) for p in pngs)

    def test_global_vae_pretrain(self, workspace, tmp_path):
        out = Runner().global_vae(str(workspace / "text.json"),
                                  str(workspace / "vocab.pkl"),
                                  output_dir=str(tmp_path / "gv"),
                                  epochs=2, batch_size=10, latent_size=8)
        assert os.path.exists(os.path.join(out, "global_vae_params.pkl"))

    def test_train_then_scst_and_ensemble(self, workspace):
        exp_dir = Runner().train(str(workspace / "config.yaml"), seed=5)
        scst_dir = Runner().scst(exp_dir, epochs=1, sample_n=1,
                                 checkpoint="last", max_length=10)
        assert os.path.isdir(os.path.join(scst_dir, "last"))
        scores = Runner().ensemble(exp_dir, exp_dir, checkpoint="last",
                                   beam_size=2, max_length=8,
                                   output=str(workspace / "ens.txt"))
        assert "CIDEr" in scores

    def test_report_results(self, workspace):
        root = workspace / "experiments" / "VAEModel" / "tpu_0.5"
        for seed_dir in root.glob("seed_*"):
            with open(seed_dir / "scores_beam_3.txt", "w") as f:
                f.write("CIDEr: 0.500\nBleu_4: 0.100\n")
        out = Runner().report_results(str(root))
        assert "CIDEr" in out
        assert (root / "aggregated_scores.txt").exists()

    def test_report_results_tagged_score_file(self, workspace):
        """A non-default score_file (e.g. the held-out --tag=test eval)
        aggregates into its own file instead of overwriting the default
        aggregation."""
        root = workspace / "experiments" / "VAEModel" / "tpu_0.5"
        for seed_dir in root.glob("seed_*"):
            with open(seed_dir / "scores_beam_3_test.txt", "w") as f:
                f.write("CIDEr: 0.250\n")
        out = Runner().report_results(
            str(root), score_file="scores_beam_3_test.txt")
        assert "CIDEr" in out
        assert (root / "aggregated_scores_beam_3_test.txt").exists()


class TestDiscriminatorCLI:
    """train_discriminator + the adverse_loss train path: the adversarial
    stack end-to-end (reference defines the discriminator family and
    AdverseLossWrapper, loss.py:279-319, but never wires the training)."""

    def test_aud2cap_then_adversarial_train(self, workspace, tmp_path):
        dsc_dir = Runner().train_discriminator(
            str(workspace / "config.yaml"), mode="aud2cap", epochs=2,
            remark="dsc", outputpath=str(tmp_path / "dexp"),
            **{"discriminator_args.word_dim": 16,
               "discriminator_args.hidden_size": 8,
               "discriminator_args.embed_size": 16})
        assert os.path.isdir(os.path.join(dsc_dir, "last"))
        log = open(os.path.join(dsc_dir, "train_dscrm.log")).read()
        assert "Epoch" in log

        # generator training consumes the frozen discriminator
        exp = Runner().train(
            str(workspace / "config.yaml"), seed=6, remark="adv",
            outputpath=str(tmp_path / "gexp"),
            **{"adverse_loss.discriminator": dsc_dir,
               "adverse_loss.alpha": 0.5,
               "adverse_loss.sample_method": "gumbel"})
        rec = json.loads(open(os.path.join(exp, "metrics.jsonl")).readline())
        assert np.isfinite(rec["train_loss"])
        log = open(os.path.join(exp, "train_caption.log")).read()
        assert "adverse_loss: discriminator from" in log

    def test_cap2cap_mode(self, workspace, tmp_path):
        dsc_dir = Runner().train_discriminator(
            str(workspace / "config.yaml"), mode="cap2cap", epochs=1,
            remark="dsc2", outputpath=str(tmp_path / "dexp2"),
            audios_per_batch=3,
            **{"discriminator_args.word_dim": 16,
               "discriminator_args.hidden_size": 8,
               "discriminator_args.embed_size": 16})
        assert os.path.isdir(os.path.join(dsc_dir, "last"))


class TestAdversarialDimMismatch:
    def test_adverse_loss_with_ln_adapter(self, workspace, tmp_path):
        """Regression: the discriminator consumes RAW encoder-dim embeds;
        with encoder embed != decoder embed (ln adapter present) the
        adversarial train path must still compose."""
        dsc_dir = Runner().train_discriminator(
            str(workspace / "config.yaml"), mode="aud2cap", epochs=1,
            remark="dscmm", outputpath=str(tmp_path / "dexp"),
            **{"discriminator_args.word_dim": 16,
               "discriminator_args.hidden_size": 8,
               "discriminator_args.embed_size": 16})
        exp = Runner().train(
            str(workspace / "config.yaml"), seed=7, remark="advmm",
            outputpath=str(tmp_path / "gexp"),
            **{"decoder_args.embed_size": 24,
               "decoder_args.hidden_size": 24,
               "model_args.posterior_args.hidden_size": 24,
               "model_args.prior_args.hidden_size": 24,
               "adverse_loss.discriminator": dsc_dir,
               "adverse_loss.alpha": 0.5})
        rec = json.loads(open(os.path.join(exp, "metrics.jsonl")).readline())
        assert np.isfinite(rec["train_loss"])
