"""First-contact test for the EXACT upstream AudioCaption artifact layout.

The reference consumes (runners/base_runner.py:37-136):
* ``h5_csv`` — a TAB-separated table with columns ``audio_id`` /
  ``hdf5_path``;
* HDF5 feature files with one dataset per ``audio_id``;
* ``text.json`` — ``{"audios": [{"audio_id", "captions": [{"cap_id",
  "caption", "tokens"}]}]}`` with ``tokens`` a space-joined string
  (datasets/caption_dataset.py:99);
* ``vocab.pkl`` — a pickled ``utils.build_vocab.Vocabulary`` INSTANCE
  (build_vocab.py:108-112), i.e. a pickle that references a module path
  this framework does not have.

This test builds that layout byte-for-byte (including the foreign-module
vocab pickle) and drives ``cli train`` + ``cli evaluate`` over it with no
repo-invented format knobs — de-risking first contact with real Clotho
artifacts (VERDICT r3 "missing #4" / task 6).
"""
import json
import pickle
import sys
import types

import h5py
import numpy as np
import pytest
import yaml


def _make_upstream_workspace(root):
    """Fixture files in the exact upstream layout."""
    rng = np.random.default_rng(0)
    words = ["a", "dog", "barks", "water", "drips", "loudly", "softly",
             "machine", "hums", "birds", "sing"]
    audios = []
    with h5py.File(root / "features.h5", "w") as f:
        for i in range(8):
            aid = f"upstream_{i:03d}"
            f[aid] = rng.normal(size=(128, 64)).astype(np.float32)
            caps = []
            for ci in range(2):
                toks = [words[(i + 2 * ci + k) % len(words)]
                        for k in range(4)]
                caps.append({"cap_id": f"{aid}_{ci}",
                             "caption": " ".join(toks) + ".",
                             "tokens": " ".join(toks)})
            audios.append({"audio_id": aid, "captions": caps})
    # TSV exactly as pandas.read_csv(sep="\t") expects
    with open(root / "h5.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        for a in audios:
            f.write(f"{a['audio_id']}\t{root / 'features.h5'}\n")
    with open(root / "text.json", "w") as f:
        json.dump({"audios": audios}, f)

    # the foreign vocab pickle: build a stand-in utils.build_vocab module
    # with the reference's Vocabulary class, pickle an instance, then
    # remove the module so unpickling cannot import it (exactly the
    # situation an upstream vocab.pkl presents)
    mod_utils = types.ModuleType("utils")
    mod_bv = types.ModuleType("utils.build_vocab")

    class Vocabulary:  # the reference class, build_vocab.py:9-28
        def __init__(self):
            self.word2idx = {}
            self.idx2word = {}
            self.idx = 0

        def add_word(self, word):
            if word not in self.word2idx:
                self.word2idx[word] = self.idx
                self.idx2word[self.idx] = word
                self.idx += 1

    Vocabulary.__module__ = "utils.build_vocab"
    Vocabulary.__qualname__ = "Vocabulary"
    mod_bv.Vocabulary = Vocabulary
    mod_utils.build_vocab = mod_bv
    sys.modules["utils"] = mod_utils
    sys.modules["utils.build_vocab"] = mod_bv
    try:
        v = Vocabulary()
        for tok in ("<pad>", "<start>", "<end>", "<unk>"):
            v.add_word(tok)  # the reference's order, build_vocab.py:100-103
        for w in words:
            v.add_word(w)
        with open(root / "vocab.pkl", "wb") as f:
            pickle.dump(v, f)
    finally:
        del sys.modules["utils"], sys.modules["utils.build_vocab"]
    return audios


def test_upstream_vocab_pickle_loads_without_module():
    import tempfile
    from pathlib import Path

    from acvae_tpu.data.vocab import Vocabulary

    with tempfile.TemporaryDirectory() as d:
        root = Path(d)
        _make_upstream_workspace(root)
        assert "utils.build_vocab" not in sys.modules
        vocab = Vocabulary.load(str(root / "vocab.pkl"))
        assert vocab("dog") == vocab.word2idx["dog"]
        assert vocab("<pad>") == 0 and vocab("<unk>") == 3
        assert len(vocab) == 4 + 11


def test_upstream_vocab_bad_special_order_rejected(tmp_path):
    from acvae_tpu.data.vocab import Vocabulary

    with open(tmp_path / "bad.pkl", "wb") as f:
        pickle.dump({"word2idx": {"<unk>": 0, "<pad>": 1, "<start>": 2,
                                  "<end>": 3, "dog": 4}}, f)
    with pytest.raises(ValueError, match="special token"):
        Vocabulary.load(str(tmp_path / "bad.pkl"))


def test_vocab_unpickler_rejects_code_execution_globals(tmp_path):
    """Upstream vocab.pkl files are untrusted input: a pickle referencing
    any global outside the safelist (containers + a Vocabulary class) must
    raise instead of importing it (ADVICE r4 — arbitrary-code-execution
    hardening).  ``os.system`` is the canonical RCE gadget."""
    import pickletools

    from acvae_tpu.data.vocab import Vocabulary

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    with open(tmp_path / "evil.pkl", "wb") as f:
        pickle.dump(Evil(), f)
    with pytest.raises(pickle.UnpicklingError, match="disallowed global"):
        Vocabulary.load(str(tmp_path / "evil.pkl"))
    # sanity: the pickle really does reference posix/os system
    ops = [a for _, a, _ in pickletools.genops(
        (tmp_path / "evil.pkl").read_bytes())]
    assert any("system" in str(a) for a in ops)


def test_vocab_own_instance_pickle_still_loads(tmp_path):
    """A pickled acvae Vocabulary INSTANCE (not our dict format) loads via
    the shell path even though the unpickler never imports the class."""
    from acvae_tpu.data import vocab as vmod

    v = vmod.Vocabulary()
    for w in ("<pad>", "<start>", "<end>", "<unk>", "rain"):
        v.add_word(w)
    with open(tmp_path / "inst.pkl", "wb") as f:
        pickle.dump(v, f)
    loaded = vmod.Vocabulary.load(str(tmp_path / "inst.pkl"))
    assert loaded.word2idx == v.word2idx


def test_train_and_evaluate_over_upstream_layout(tmp_path):
    """End-to-end: the upstream artifact set drives train + evaluate with
    only the standard config keys (h5_csv / caption_file / vocab_file)."""
    from acvae_tpu.cli.main import Runner

    _make_upstream_workspace(tmp_path)
    cfg = {
        "model": "Hybrid_VAEModel",
        "alpha": 0.5,
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": 16, "channels": [4, 8, 8, 16]},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": 16, "hidden_size": 16},
        "model_args": {"posterior_model": "PosteriorRNN_hybrid",
                       "posterior_args": {"hidden_size": 16},
                       "prior_model": "PriorRNN",
                       "prior_args": {"hidden_size": 16}},
        "h5_csv": str(tmp_path / "h5.csv"),
        "caption_file": str(tmp_path / "text.json"),
        "vocab_file": str(tmp_path / "vocab.pkl"),
        "outputpath": str(tmp_path / "exp"),
        "epochs": 1, "batch_size": 8, "train_percent": 80,
        "optimizer_args": {"lr": 1e-3},
        "scheduler": "constant", "scheduler_args": {},
    }
    with open(tmp_path / "c.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    exp = Runner().train(str(tmp_path / "c.yaml"))
    out = Runner().evaluate(exp, str(tmp_path / "h5.csv"),
                            str(tmp_path / "text.json"), max_length=8,
                            checkpoint="last")
    scores = (tmp_path / "exp").rglob("scores_beam_3.txt")
    txt = next(iter(scores)).read_text()
    assert "CIDEr" in txt
