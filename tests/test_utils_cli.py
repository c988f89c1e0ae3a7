"""human_eval / split_dataset / concat / sweep-lite CLI commands + embedding
regularization path."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.cli.main import Runner
from acvae_tpu.data import CaptionDataset, CaptionLoader, make_synthetic_clotho
from acvae_tpu.evaluation.human_eval import human_diversity, human_scores


@pytest.fixture(scope="module")
def textjson(tmp_path_factory):
    root = tmp_path_factory.mktemp("utils")
    _, info, vocab = make_synthetic_clotho(num_audios=6)
    with open(root / "text.json", "w") as f:
        json.dump({"audios": info}, f)
    return root, info, vocab


class TestHumanEval:
    def test_scores_and_diversity(self, textjson):
        root, info, _ = textjson
        key2refs = {a["audio_id"]: [c["tokens"] for c in a["captions"]]
                    for a in info}
        s = human_scores(key2refs)
        assert 0 <= s["CIDEr"] <= 10
        d = human_diversity(key2refs)
        assert 0 < d["Div1"] <= 1

    def test_cli(self, textjson, tmp_path):
        root, _, _ = textjson
        out = Runner().human_eval(str(root / "text.json"),
                                  str(tmp_path / "h.txt"))
        assert "CIDEr" in out


class TestSplitConcat:
    def test_split(self, textjson, tmp_path):
        root, _, _ = textjson
        prefix = str(tmp_path / "split")
        Runner().split_dataset(str(root / "text.json"), prefix)
        hard = json.load(open(prefix + "_hard.json"))["audios"]
        easy = json.load(open(prefix + "_easy.json"))["audios"]
        assert len(hard) + len(easy) == 6

    def test_concat(self, textjson, tmp_path):
        root, _, _ = textjson
        out = Runner().concat_json(str(root / "text.json"),
                                   str(root / "text.json"),
                                   output=str(tmp_path / "cat.json"))
        assert len(json.load(open(out))["audios"]) == 12


class TestEmbeddingRegularization:
    def test_loader_carries_embeddings(self, textjson, tmp_path):
        root, info, vocab = textjson
        feats, info2, vocab2 = make_synthetic_clotho(num_audios=4)
        emb_root = tmp_path / "emb"
        rng = np.random.default_rng(0)
        for a in info2:
            d = emb_root / a["audio_id"]
            d.mkdir(parents=True)
            for i in range(len(a["captions"])):
                np.save(d / f"{i}.npy",
                        rng.normal(size=(16,)).astype(np.float32))
        ds = CaptionDataset(caption_info=info2, vocabulary=vocab2,
                            features=feats, embedding_path=str(emb_root))
        batch = next(iter(CaptionLoader(ds, batch_size=6, buckets=(256,))))
        assert batch.cap_embeds is not None
        assert batch.cap_embeds.shape == (6, 16)
        assert "cap_embeds" in batch.arrays()

    def test_train_step_with_embedding_loss(self, textjson, tmp_path):
        from acvae_tpu.models.build import build_model
        from acvae_tpu.train.trainer import (TrainState, build_optimizer,
                                             make_train_step)
        E = 16
        feats, info, vocab = make_synthetic_clotho(num_audios=3)
        cfg = {"model": "VAEModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "VAERNNBahdanauAttnDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E},
               "model_args": {"posterior_model": "PosteriorRNN",
                              "posterior_args": {"hidden_size": E},
                              "prior_model": "PriorRNN",
                              "prior_args": {"hidden_size": E}}}
        model = build_model(cfg, len(vocab), 64)
        ds = CaptionDataset(caption_info=info, vocabulary=vocab,
                            features=feats)
        batch = next(iter(CaptionLoader(ds, batch_size=6, buckets=(256,))))
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
        # fake caption embeddings matching decoder hidden size
        arrays["cap_embeds"] = jnp.asarray(
            np.random.default_rng(0).normal(size=(6, E)).astype(np.float32))
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            arrays["feats"], arrays["feat_lens"], arrays["caps"],
            arrays["cap_lens"], train=False)
        state = TrainState.create(variables,
                                  build_optimizer("Adam", 1e-3))
        step = make_train_step(model, embedding_loss="Cosine", dec_par=0.5)
        state, metrics = step(state, arrays, jax.random.key(2),
                              1.0, 0.0, 0.5, 0.0)
        assert "embed" in metrics and np.isfinite(float(metrics["embed"]))


def test_tokenize_caption(tmp_path):
    """cli tokenize_caption writes tokens in place (utils/tokenize_caption.py)."""
    import json
    from acvae_tpu.cli.main import Runner
    p = tmp_path / "text.json"
    p.write_text(json.dumps({"audios": [
        {"audio_id": "a.wav", "captions": [
            {"caption": "A Dog, barks LOUDLY!", "cap_id": "1"}]}]}))
    Runner().tokenize_caption(str(p))
    info = json.loads(p.read_text())
    assert info["audios"][0]["captions"][0]["tokens"] == "a dog barks loudly"


def test_extract_sentence_embedding(tmp_path):
    """Mean-of-words sentence embedding trees (utils/word2vec, utils/Glove):
    tree layout consumed by CaptionDataset(embedding_path=...)."""
    import json
    import numpy as np
    from acvae_tpu.cli.main import Runner
    from acvae_tpu.data.vocab import Vocabulary

    vocab = Vocabulary()
    for w in ("a", "dog", "barks"):
        vocab.add_word(w)
    vocab.save(str(tmp_path / "vocab.pkl"))
    # GloVe-style text embeddings
    (tmp_path / "glove.txt").write_text(
        "a 1 0\ndog 0 2\nbarks 0 4\n")
    (tmp_path / "text.json").write_text(json.dumps({"audios": [
        {"audio_id": "x.wav", "captions": [
            {"caption": "a dog", "tokens": "a dog"},
            {"caption": "a barks", "tokens": "a barks"}]}]}))
    Runner().extract_sentence_embedding(
        str(tmp_path / "text.json"), str(tmp_path / "vocab.pkl"),
        str(tmp_path / "glove.txt"), str(tmp_path / "emb"))
    e0 = np.load(tmp_path / "emb" / "x.wav" / "0.npy")
    e1 = np.load(tmp_path / "emb" / "x.wav" / "1.npy")
    mean = np.load(tmp_path / "emb" / "x.wav" / "caption.npy")
    np.testing.assert_allclose(e0, [0.5, 1.0])
    np.testing.assert_allclose(e1, [0.5, 2.0])
    np.testing.assert_allclose(mean, (e0 + e1) / 2)


def test_zh_character_tokenization():
    """zh=True: CJK chars become single tokens, latin spans stay words
    (character fallback for the reference's CoreNLP path)."""
    from acvae_tpu.data.vocab import build_vocab, tokenize
    assert tokenize("狗在叫, dog barks!", zh=True) == [
        "狗", "在", "叫", "dog", "barks"]
    info = [{"audio_id": "a", "captions": [{"caption": "狗叫"}]}]
    vocab = build_vocab(info, zh=True)
    assert info[0]["captions"][0]["tokens"] == "狗 叫"
    assert len(vocab) == 6  # 4 specials + 2 chars


def test_cli_build_vocab_zh_raw_captions(tmp_path):
    """cli build_vocab --zh on a RAW caption file (no pre-made tokens) must
    character-tokenize; regression for load_caption_info pre-synthesizing
    english whole-sentence tokens before the zh flag could apply."""
    import json

    from acvae_tpu.cli.main import Runner
    from acvae_tpu.data.vocab import Vocabulary
    text = tmp_path / "text.json"
    text.write_text(json.dumps({"audios": [
        {"audio_id": "a.wav", "captions": [{"caption": "狗在叫"}]}]},
        ensure_ascii=False))
    out = Runner().build_vocab(str(text), str(tmp_path / "vocab.pkl"),
                               zh=True)
    vocab = Vocabulary.load(out)
    assert len(vocab) == 7  # 4 specials + 3 chars, not one sentence-token
    back = json.loads(text.read_text())
    assert back["audios"][0]["captions"][0]["tokens"] == "狗 在 叫"


def test_hf_sentence_embedding_local_model(tmp_path):
    """extract_sentence_embedding detects a local HF model dir and writes
    mean-pooled contextual embeddings (the reference's bert path)."""
    transformers = pytest.importorskip("transformers")
    import json as _json

    from transformers import BertConfig, BertModel, BertTokenizerFast

    mdir = tmp_path / "tinybert"
    mdir.mkdir()
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "dog", "barks", "water", "flows"]
    (mdir / "vocab.txt").write_text("\n".join(words))
    tok = BertTokenizerFast(vocab_file=str(mdir / "vocab.txt"))
    tok.save_pretrained(str(mdir))
    cfg = BertConfig(vocab_size=len(tok), hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=32)
    BertModel(cfg).save_pretrained(str(mdir))

    caps = {"audios": [{"audio_id": "a1", "captions": [
        {"caption": "a dog barks", "cap_id": "1"},
        {"caption": "water flows", "cap_id": "2"}]}]}
    cap_file = tmp_path / "text.json"
    cap_file.write_text(_json.dumps(caps))

    from acvae_tpu.cli.main import Runner
    out = Runner().extract_sentence_embedding(
        str(cap_file), "unused", str(mdir), str(tmp_path / "emb"))
    import numpy as np
    e0 = np.load(tmp_path / "emb" / "a1" / "0.npy")
    mean = np.load(tmp_path / "emb" / "a1" / "caption.npy")
    assert e0.shape == (16,) and mean.shape == (16,)
    assert np.isfinite(e0).all()


def test_export_embeddings_projector_tsvs(tmp_path):
    """export_embeddings writes TB-projector vector/metadata TSV pairs from
    a <dir>/<audio_id>/<i>.npy tree."""
    root = tmp_path / "emb"
    for aid in ("a1", "a2"):
        (root / aid).mkdir(parents=True)
        for i in range(3):
            np.save(root / aid / f"{i}.npy", np.full((4,), i, np.float32))
    from acvae_tpu.cli.main import Runner
    prefix = str(tmp_path / "proj")
    Runner().export_embeddings(str(root), prefix)
    vecs = np.loadtxt(prefix + "_vectors.tsv", delimiter="\t")
    assert vecs.shape == (6, 4)
    meta = open(prefix + "_metadata.tsv").read().splitlines()
    assert meta[0] == "audio_id\tcap_idx" and len(meta) == 7


class TestMultiParamSweep:
    """`cli sweep --space=...`: joint multi-param search replacing the
    reference's NNI search space (pytorch_runner_vae.py:130-133)."""

    def _stub_runner(self, tmp_path, monkeypatch):
        import json as _json

        from acvae_tpu.cli.main import Runner
        calls = []

        def fake_train(self, config, **kw):
            calls.append({k: v for k, v in kw.items() if k != "remark"})
            d = tmp_path / kw["remark"]
            d.mkdir(exist_ok=True)
            # deterministic "score" from the params: peak at beta=.5, s=.1
            score = (1.0 - abs(kw.get("beta", 0) - 0.5)
                     - abs(kw.get("smoothing", 0) - 0.1))
            (d / "metrics.jsonl").write_text(
                _json.dumps({"epoch": 1, "val_cider": score}) + "\n")
            return str(d)

        monkeypatch.setattr(Runner, "train", fake_train)
        return Runner(), calls

    def test_grid_space(self, tmp_path, monkeypatch):
        import yaml as _yaml
        runner, calls = self._stub_runner(tmp_path, monkeypatch)
        space = tmp_path / "space.yaml"
        space.write_text(_yaml.safe_dump(
            {"beta": [0.3, 0.5], "smoothing": [0.1, 0.2]}))
        results = runner.sweep("cfg.yaml", space=str(space))
        assert len(results) == 4  # 2x2 cartesian product
        assert len(calls) == 4
        assert all({"beta", "smoothing"} <= set(c) for c in calls)
        best = max(results.values(), key=lambda r: r["best"])
        assert best["params"] == {"beta": 0.5, "smoothing": 0.1}

    def test_random_space(self, tmp_path, monkeypatch):
        runner, calls = self._stub_runner(tmp_path, monkeypatch)
        results = runner.sweep(
            "cfg.yaml", space="{beta: [0.1, 0.5, 0.9], smoothing: [0.1]}",
            mode="random", n_trials=5, seed=3)
        assert len(calls) == 5
        assert all(c["beta"] in (0.1, 0.5, 0.9) and c["smoothing"] == 0.1
                   for c in calls)

    def test_single_param_form_still_works(self, tmp_path, monkeypatch):
        runner, calls = self._stub_runner(tmp_path, monkeypatch)
        results = runner.sweep("cfg.yaml", param="beta", values="0.3,0.5")
        assert len(results) == 2
        assert [c["beta"] for c in calls] == [0.3, 0.5]

    def test_bad_space_rejected(self, tmp_path, monkeypatch):
        import pytest as _pytest
        runner, _ = self._stub_runner(tmp_path, monkeypatch)
        with _pytest.raises(ValueError):
            runner.sweep("cfg.yaml", space="{beta: 0.5}")
        with _pytest.raises(ValueError):
            runner.sweep("cfg.yaml")

    def test_tpe_mode_feeds_history(self, tmp_path, monkeypatch):
        """mode=tpe runs sequentially and concentrates later trials near
        the objective's peak (beta=0.5, smoothing=0.1)."""
        runner, calls = self._stub_runner(tmp_path, monkeypatch)
        results = runner.sweep(
            "cfg.yaml",
            space="{beta: [0.1, 0.3, 0.5, 0.7, 0.9], "
                  "smoothing: [0.05, 0.1, 0.3]}",
            mode="tpe", n_trials=14, seed=1)
        assert len(calls) == 14
        # after the 5 random startup trials TPE should favor the peak —
        # at least a third of the guided trials land on beta=0.5
        guided = calls[5:]
        hits = sum(1 for c in guided if c["beta"] == 0.5)
        assert hits >= len(guided) // 3, (hits, guided)
        best = max(results.values(), key=lambda r: r["best"])
        assert best["params"]["beta"] == 0.5

    def test_anneal_mode_refines_incumbent(self, tmp_path, monkeypatch):
        runner, calls = self._stub_runner(tmp_path, monkeypatch)
        runner.sweep(
            "cfg.yaml",
            space="{beta: [0.1, 0.3, 0.5, 0.7, 0.9], "
                  "smoothing: [0.05, 0.1, 0.3]}",
            mode="anneal", n_trials=12, seed=2)
        assert len(calls) == 12
        # late trials mutate little: the final trial shares at least one
        # coordinate with the best seen before it
        import json as _json
        # recompute scores like the stub does
        def score(c):
            return (1.0 - abs(c.get("beta", 0) - 0.5)
                    - abs(c.get("smoothing", 0) - 0.1))
        best_before_last = max(calls[:-1], key=score)
        last = calls[-1]
        assert any(last[k] == best_before_last[k]
                   for k in ("beta", "smoothing"))


class TestTPEAdvisorUnit:
    """Pure advisor behavior (train/sweep_advisor.py), no CLI."""

    def test_startup_is_random_then_guided(self):
        from acvae_tpu.train.sweep_advisor import TPEAdvisor
        space = {"x": [0, 1, 2, 3, 4]}
        adv = TPEAdvisor(space, seed=0, n_startup=3)
        hist = []
        for _ in range(40):
            s = adv.suggest(hist)
            # objective: peak at x=3
            hist.append((s, 1.0 - abs(s["x"] - 3) / 4.0))
        xs = [h[0]["x"] for h in hist[10:]]
        # guided phase concentrates on the peak
        assert xs.count(3) + xs.count(2) + xs.count(4) > len(xs) * 0.6
        assert xs.count(3) == max(xs.count(v) for v in space["x"])

    def test_densities_smoothing_never_zero(self):
        from acvae_tpu.train.sweep_advisor import TPEAdvisor
        adv = TPEAdvisor({"x": [0, 1]}, seed=0, n_startup=1)
        pg, pb = adv._densities([({"x": 0}, 1.0), ({"x": 0}, 0.5)], "x")
        assert (pg > 0).all() and (pb > 0).all()
        assert abs(pg.sum() - 1) < 1e-9 and abs(pb.sum() - 1) < 1e-9


class TestDoctor:
    """cli doctor: bounded device diagnostic (the probe runs in a subprocess
    so a wedged tunneled runtime cannot hang the command)."""

    def test_healthy_cpu_probe(self, monkeypatch, capsys):
        import json as _json

        from acvae_tpu.cli.main import Runner

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        report = Runner().doctor(probe_timeout=120)
        assert report["ok"] is True
        assert report["device"]["platform"] == "cpu"
        assert report["device"]["dispatch_ms_p50"] >= 0
        _json.loads(capsys.readouterr().out)  # machine-readable output

    def test_wedged_device_bounded_and_nonzero(self, monkeypatch):
        import subprocess
        import sys as _sys

        import pytest as _pytest

        from acvae_tpu.cli.main import Runner

        real_run = subprocess.run

        def hang(cmd, **kw):  # simulate a wedged runtime: probe times out
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 1))

        monkeypatch.setattr(subprocess, "run", hang)
        with _pytest.raises(SystemExit) as e:
            Runner().doctor(probe_timeout=1)
        assert e.value.code == 1
        monkeypatch.setattr(subprocess, "run", real_run)


class TestMethodAlias:
    def test_explicit_default_still_conflicts(self):
        """--decode_method=beam --method=greedy must raise, not silently
        decode greedy (the None-sentinel regression)."""
        import pytest as _pytest

        from acvae_tpu.cli.main import _method_alias

        assert _method_alias(None, None) == "beam"
        assert _method_alias(None, "dbs") == "dbs"
        assert _method_alias("greedy", None) == "greedy"
        assert _method_alias("dbs", "dbs") == "dbs"
        with _pytest.raises(ValueError):
            _method_alias("greedy", "beam")


class TestMakeSynthetic:
    def test_writes_trainable_artifacts(self, tmp_path):
        """cli make_synthetic materializes the exact train/evaluate inputs
        (mels.h5 + mels.csv + text.json + vocab.pkl) reproducibly."""
        import h5py
        from acvae_tpu.data.vocab import Vocabulary, load_caption_info

        out = Runner().make_synthetic(str(tmp_path / "corpus"), num_audios=4,
                                      mel_frames=64, rich=True, seed=7)
        info = load_caption_info(os.path.join(out, "text.json"))
        vocab = Vocabulary.load(os.path.join(out, "vocab.pkl"))
        assert len(info) == 4 and len(vocab) > 20
        with h5py.File(os.path.join(out, "mels.h5")) as f:
            assert len(f) == 4
            feats = {k: f[k][()] for k in f}
        ds = CaptionDataset(features=feats, caption_info=info,
                            vocabulary=vocab)
        batch = next(iter(CaptionLoader(ds, batch_size=8)))
        assert batch.feats.shape[0] == 8 and batch.caps.shape[0] == 8


class TestMedianStopAssessor:
    """NNI MedianstopAssessor semantics over a synthetic history
    (train/sweep_advisor.py::MedianStopAssessor)."""

    def test_no_stops_before_min_trials(self):
        from acvae_tpu.train.sweep_advisor import MedianStopAssessor
        a = MedianStopAssessor(min_trials=3, min_epochs=2)
        for hist in ([0.5, 0.6], [0.4, 0.5]):
            a.trial_begin()
            for s in hist:
                assert not a.assess(s)
            a.trial_end()
        # 2 completed < min_trials=3: a terrible third trial still runs
        a.trial_begin()
        assert not a.assess(0.0)
        assert not a.assess(0.0)

    def test_bad_trial_stopped_good_trial_survives(self):
        from acvae_tpu.train.sweep_advisor import MedianStopAssessor
        a = MedianStopAssessor(min_trials=3, min_epochs=2)
        for hist in ([0.5, 0.6, 0.7], [0.4, 0.5, 0.6], [0.45, 0.55, 0.65]):
            a.trial_begin()
            for s in hist:
                a.assess(s)
            a.trial_end()
        # bad trial: best-so-far 0.1 < median running avg -> stop at epoch 2
        a.trial_begin()
        assert not a.assess(0.1)      # min_epochs gate
        assert a.assess(0.1)
        assert a.last_stop
        a.trial_end()
        # good trial: above median -> never stopped
        a.trial_begin()
        for s in (0.6, 0.7, 0.8):
            assert not a.assess(s)
        assert not a.last_stop
        assert a.stopped_trials == 1

    def test_min_epochs_gate(self):
        from acvae_tpu.train.sweep_advisor import MedianStopAssessor
        a = MedianStopAssessor(min_trials=1, min_epochs=3)
        a.trial_begin()
        for s in (0.9, 0.9, 0.9):
            a.assess(s)
        a.trial_end()
        a.trial_begin()
        assert not a.assess(0.0)
        assert not a.assess(0.0)
        assert a.assess(0.0)  # epoch 3 = min_epochs -> eligible, below median


class TestSweepAssessorWiring:
    def test_median_assessor_stops_bad_trials(self, tmp_path, monkeypatch):
        """cli sweep --assessor=median: the train stub polls the assessor
        like the real train loop does and bad trials are cut short +
        marked stopped_early in the summary."""
        import json as _json

        from acvae_tpu.cli.main import Runner
        epochs_run = []

        def fake_train(self, config, **kw):
            d = tmp_path / kw["remark"]
            d.mkdir(exist_ok=True)
            base = kw["beta"]  # score == beta, constant over epochs
            lines = []
            stopper = getattr(self, "_trial_assessor", None)
            for e in range(1, 6):
                lines.append(_json.dumps({"epoch": e, "val_cider": base}))
                if stopper is not None and stopper.assess(base):
                    break
            (d / "metrics.jsonl").write_text("\n".join(lines) + "\n")
            epochs_run.append(len(lines))
            return str(d)

        monkeypatch.setattr(Runner, "train", fake_train)
        results = Runner().sweep(
            "cfg.yaml", param="beta",
            values="0.6,0.62,0.61,0.05,0.63", assessor="median",
            assessor_min_trials=3, assessor_min_epochs=2)
        # the 0.05 trial (4th) stops at epoch 2; the others run all 5
        assert epochs_run == [5, 5, 5, 2, 5]
        stopped = [tag for tag, r in results.items()
                   if r.get("stopped_early")]
        assert len(stopped) == 1 and "0.05" in stopped[0]

    def test_unknown_assessor_rejected(self, tmp_path, monkeypatch):
        import pytest as _pytest

        from acvae_tpu.cli.main import Runner
        monkeypatch.setattr(Runner, "train",
                            lambda self, config, **kw: str(tmp_path))
        with _pytest.raises(ValueError, match="unknown --assessor"):
            Runner().sweep("cfg.yaml", param="beta", values="0.5",
                           assessor="curve")
