"""Data pipeline: vocabulary, bucketing collate, host sharding, synthetic set."""
import numpy as np
import pytest

from acvae_tpu import END_IDX, PAD_IDX, START_IDX
from acvae_tpu.data import (CaptionDataset, CaptionLoader, Vocabulary,
                            build_vocab, make_synthetic_clotho, pick_bucket)


class TestVocabulary:
    def test_token_protocol(self):
        v = Vocabulary()
        assert v("<pad>") == 0 and v("<start>") == 1
        assert v("<end>") == 2 and v("<unk>") == 3
        assert v("never-seen-word") == 3

    def test_build_and_decode(self):
        info = [{"audio_id": "x", "captions": [{"caption": "A dog barks."}]}]
        v = build_vocab(info)
        assert info[0]["captions"][0]["tokens"] == "a dog barks"
        ids = [START_IDX, v("a"), v("dog"), v("barks"), END_IDX, PAD_IDX]
        assert v.decode(ids) == ["a", "dog", "barks"]

    def test_tokenize_matches_reference_punctuation(self):
        """build_vocab.py:80-88: punctuation (incl. parens) is replaced by a
        SPACE, so joined words split instead of merging."""
        import re

        from acvae_tpu.data.vocab import tokenize
        ours = tokenize("A man talks (loudly),then leaves; \"yes!\"")
        ref = re.sub("[{}]".format(",.():;?!\"'"), " ",
                     "a man talks (loudly),then leaves; \"yes!\"")
        ref = re.sub(" +", " ", ref).strip().split()
        assert ours == ref == ["a", "man", "talks", "loudly", "then",
                               "leaves", "yes"]

    def test_pad_to_multiple(self):
        """build_vocab(pad_to_multiple=M) rounds |V| up with inert <pad_k>
        tokens so vocab-sharded model_parallel placement divides evenly."""
        info = [{"audio_id": "x",
                 "captions": [{"caption": "A dog barks."}]}]
        v = build_vocab(info, pad_to_multiple=8)
        assert len(v) % 8 == 0
        assert "<pad_0>" in v.word2idx
        # pads are ordinary never-in-data words; real tokens keep their ids
        assert v("dog") < v("<pad_0>")
        # decode never leaks a literal <pad_k> into a caption
        ids = [START_IDX, v("a"), v("<pad_0>"), v("dog"), END_IDX]
        assert v.decode(ids) == ["a", "dog"]

    def test_save_load(self, tmp_path):
        v = build_vocab([{"audio_id": "x",
                          "captions": [{"caption": "water flows"}]}])
        p = str(tmp_path / "vocab.pkl")
        v.save(p)
        v2 = Vocabulary.load(p)
        assert v2.word2idx == v.word2idx


class TestBuckets:
    def test_pick_bucket(self):
        assert pick_bucket(100, (256, 512)) == 256
        assert pick_bucket(256, (256, 512)) == 256
        assert pick_bucket(257, (256, 512)) == 512
        assert pick_bucket(9999, (256, 512)) == 512  # crop to last


class TestSyntheticPipeline:
    def test_loader_shapes(self):
        feats, info, vocab = make_synthetic_clotho(num_audios=6)
        ds = CaptionDataset(caption_info=info, vocabulary=vocab,
                            features=feats)
        assert len(ds) == 6 * 5
        loader = CaptionLoader(ds, batch_size=4, shuffle=True, seed=0,
                               buckets=(128, 256))
        batches = list(loader)
        assert sum(b.feats.shape[0] for b in batches) == len(ds)
        for b in batches:
            assert b.feats.shape[1] in (128, 256)
            assert b.caps.shape[1] == ds.max_cap_len
            assert b.caps.dtype == np.int32
            assert np.all(b.caps[:, 0] == START_IDX)
            for i in range(b.caps.shape[0]):
                assert b.caps[i, b.cap_lens[i] - 1] == END_IDX

    def test_shuffle_deterministic_per_epoch(self):
        feats, info, vocab = make_synthetic_clotho(num_audios=6)
        ds = CaptionDataset(caption_info=info, vocabulary=vocab, features=feats)
        l1 = CaptionLoader(ds, batch_size=4, shuffle=True, seed=7)
        l2 = CaptionLoader(ds, batch_size=4, shuffle=True, seed=7)
        ids1 = [b.audio_ids for b in l1]
        ids2 = [b.audio_ids for b in l2]
        assert ids1 == ids2
        l1.set_epoch(1)
        assert [b.audio_ids for b in l1] != ids1

    def test_host_sharding_partitions(self):
        feats, info, vocab = make_synthetic_clotho(num_audios=6)
        ds = CaptionDataset(caption_info=info, vocabulary=vocab, features=feats)
        seen = []
        for host in range(3):
            loader = CaptionLoader(ds, batch_size=5, host_id=host,
                                   host_count=3)
            for b in loader:
                seen.extend(b.audio_ids)
        # every sample covered (padding may duplicate a few)
        assert len(seen) == 30
        refs = ds.refs()
        assert set(x for x in seen) == set(refs.keys())

    def test_hdf5_roundtrip(self, tmp_path):
        import h5py
        feats, info, vocab = make_synthetic_clotho(num_audios=3)
        h5path = str(tmp_path / "mels.h5")
        with h5py.File(h5path, "w") as f:
            for aid, mel in feats.items():
                f[aid] = mel
        h5dict = {aid: h5path for aid in feats}
        ds = CaptionDataset(h5file_dict=h5dict, caption_info=info,
                            vocabulary=vocab)
        aid, feat, cap = ds.get(0)
        np.testing.assert_array_equal(feat, feats[aid])


class TestKaldiIO:
    """data/kaldi.py: binary ark/scp matrix round-trip (the reference vendors
    utils/kaldi_io.py for this legacy path)."""

    def test_roundtrip_ark_and_scp(self, tmp_path, rng):
        from acvae_tpu.data.kaldi import (read_mat_ark, read_mat_scp,
                                          write_mat_ark)
        mats = {"utt1": rng.normal(size=(5, 4)).astype("float32"),
                "utt2": rng.normal(size=(3, 4)).astype("float64")}
        ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
        write_mat_ark(ark, mats, scp_path=scp)
        for reader in (read_mat_ark(ark), read_mat_scp(scp)):
            got = dict(reader)
            assert set(got) == {"utt1", "utt2"}
            for k in mats:
                assert got[k].dtype == mats[k].dtype
                import numpy as np
                np.testing.assert_array_equal(got[k], mats[k])

    def test_unsupported_header_errors(self, tmp_path):
        import pytest
        from acvae_tpu.data.kaldi import read_mat_ark
        p = tmp_path / "bad.ark"
        p.write_bytes(b"utt \x00BCM \x04")  # compressed matrix header
        with pytest.raises(ValueError, match="unsupported kaldi matrix"):
            list(read_mat_ark(str(p)))


def test_embedding_scaler(tmp_path, rng):
    """Standard-scaler fit over caption embeddings (run_sentence.py:54-73)."""
    import numpy as np
    from acvae_tpu.data.dataset import CaptionDataset
    from acvae_tpu.data.vocab import Vocabulary

    vocab = Vocabulary()
    vocab.add_word("x")
    info = [{"audio_id": "a", "captions": [
        {"caption": "x", "tokens": "x"}, {"caption": "x", "tokens": "x"}]}]
    emb_dir = tmp_path / "emb" / "a"
    emb_dir.mkdir(parents=True)
    np.save(emb_dir / "0.npy", np.array([1.0, 10.0], np.float32))
    np.save(emb_dir / "1.npy", np.array([3.0, 30.0], np.float32))
    ds = CaptionDataset(caption_info=info, vocabulary=vocab,
                        features={"a": rng.normal(size=(8, 4)).astype("float32")},
                        embedding_path=str(tmp_path / "emb"),
                        embedding_scaler=True)
    _, _, _, e0 = ds.get(0)
    _, _, _, e1 = ds.get(1)
    np.testing.assert_allclose(e0, [-1.0, -1.0])
    np.testing.assert_allclose(e1, [1.0, 1.0])


def test_prefetch_matches_direct_iteration(tmp_path):
    """loader.prefetch() yields the same batches as direct iteration and
    re-raises producer errors (it feeds the CLI train loop)."""
    import h5py

    from acvae_tpu.data.dataset import CaptionDataset, CaptionLoader
    from acvae_tpu.data.synthetic import make_synthetic_clotho

    feats, info, vocab = make_synthetic_clotho(num_audios=5, mel_frames=128)
    h5 = str(tmp_path / "m.h5")
    with h5py.File(h5, "w") as f:
        for aid, mel in feats.items():
            f[aid] = mel
    ds = CaptionDataset(h5file_dict={a: h5 for a in feats},
                        caption_info=info, vocabulary=vocab)
    loader = CaptionLoader(ds, 4, shuffle=True, seed=3)
    loader.set_epoch(2)
    direct = list(loader)
    fetched = list(loader.prefetch())
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a.feats, b.feats)
        np.testing.assert_array_equal(a.caps, b.caps)

    # mid-epoch resume fast-forward: skip_batches=k yields the exact tail
    # of the same epoch permutation without reading the skipped batches
    tail = list(loader.prefetch(skip_batches=2))
    assert len(tail) == len(direct) - 2
    for a, b in zip(direct[2:], tail):
        np.testing.assert_array_equal(a.feats, b.feats)
        np.testing.assert_array_equal(a.caps, b.caps)

    # early consumer exit must not leak a blocked producer thread (the
    # retry-around-a-wedged-device pattern breaks out of epochs repeatedly)
    import threading
    import time
    before = threading.active_count()
    for _ in range(3):
        gen = loader.prefetch(depth=1)
        next(gen)
        gen.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, \
        "prefetch producer threads leaked after early consumer exit"

    class Boom(CaptionLoader):
        def __iter__(self):
            yield direct[0]
            raise RuntimeError("producer boom")

    boom = Boom(ds, 4)
    it = boom.prefetch()
    next(it)
    with pytest.raises(RuntimeError, match="producer boom"):
        list(it)


def test_prefetch_stage_runs_in_producer_thread(tmp_path):
    """prefetch(stage=...) applies the hook off the consumer thread and
    preserves order/values — the device-upload overlap path
    (cli.main._stage_to_device)."""
    import threading

    import h5py

    from acvae_tpu.cli.main import _stage_to_device
    from acvae_tpu.data.dataset import CaptionDataset, CaptionLoader
    from acvae_tpu.data.synthetic import make_synthetic_clotho

    feats, info, vocab = make_synthetic_clotho(num_audios=5, mel_frames=128)
    h5 = str(tmp_path / "m.h5")
    with h5py.File(h5, "w") as f:
        for aid, mel in feats.items():
            f[aid] = mel
    ds = CaptionDataset(h5file_dict={a: h5 for a in feats},
                        caption_info=info, vocabulary=vocab)
    loader = CaptionLoader(ds, 4, shuffle=True, seed=3)
    loader.set_epoch(1)
    direct = list(loader)

    stage_threads = []

    def stage(b):
        stage_threads.append(threading.get_ident())
        return _stage_to_device(b)

    staged = list(loader.prefetch(stage=stage))
    assert len(staged) == len(direct)
    main_tid = threading.get_ident()
    assert stage_threads and all(t != main_tid for t in stage_threads)
    for a, b in zip(direct, staged):
        assert not isinstance(b.feats, np.ndarray)  # device-put happened
        np.testing.assert_array_equal(a.feats, np.asarray(b.feats))
        np.testing.assert_array_equal(a.caps, np.asarray(b.caps))
        assert b.audio_ids == a.audio_ids

    # bf16 upload cast happens host-side before the put
    import ml_dtypes
    b16 = _stage_to_device(direct[0], feats_dtype=ml_dtypes.bfloat16)
    assert np.asarray(b16.feats).dtype == ml_dtypes.bfloat16


def test_fasttext_vec_text_format(tmp_path):
    """fastText .vec (text) loads through the GloVe path, skipping the
    'count dim' header line."""
    from acvae_tpu.data.embeddings import load_word_embeddings
    from acvae_tpu.data.vocab import Vocabulary

    vocab = Vocabulary()
    vocab.add_word("dog")
    vec = tmp_path / "ft.vec"
    vec.write_text("2 3\ndog 1.0 2.0 3.0\ncat 4.0 5.0 6.0\n")
    m = load_word_embeddings(str(vec), vocab)
    assert m.shape == (len(vocab), 3)
    np.testing.assert_array_equal(m[vocab("dog")], [1.0, 2.0, 3.0])


def test_batch_carries_instance_metadata(tmp_path):
    """CaptionInstanceDataset payload (caption_dataset.py:187-197): every
    batch exposes each sample's caption position and cap_id tag."""
    from acvae_tpu.data.dataset import CaptionDataset, CaptionLoader
    from acvae_tpu.data.synthetic import make_synthetic_clotho

    feats, info, vocab = make_synthetic_clotho(num_audios=3, mel_frames=64)
    for a in info:
        for ci, c in enumerate(a["captions"]):
            c["cap_id"] = f"{a['audio_id']}_{ci}" + ("_aug" if ci == 1 else "")
    ds = CaptionDataset(features=feats, caption_info=info, vocabulary=vocab)
    loader = CaptionLoader(ds, batch_size=64)
    batch = next(iter(loader))
    assert batch.cap_indices is not None and len(batch.cap_indices) == len(ds)
    # positions enumerate each audio's captions
    assert sorted(set(batch.cap_indices.tolist())) == [0, 1, 2, 3, 4]
    assert all(t.endswith("_aug") == (i == 1)
               for t, i in zip(batch.cap_ids, batch.cap_indices))


class TestRichSynthetic:
    """make_synthetic_clotho_rich: realistic language statistics while
    staying audio-derivable (VERDICT r1 weak #7 — the small grammar's exact
    caption consensus inflates CIDEr far above the real-data regime)."""

    def test_structure_and_determinism(self):
        from acvae_tpu.data.synthetic import make_synthetic_clotho_rich

        feats, info, vocab = make_synthetic_clotho_rich(num_audios=8,
                                                        mel_frames=128,
                                                        seed=3)
        assert len(feats) == 8 and len(info) == 8
        for a in info:
            assert len(a["captions"]) == 5
            assert a["audio_id"] in feats
            mel = feats[a["audio_id"]]
            assert mel.ndim == 2 and mel.shape[1] == 64
        # same seed -> bit-identical corpus
        feats2, info2, _ = make_synthetic_clotho_rich(num_audios=8,
                                                      mel_frames=128, seed=3)
        for k in feats:
            np.testing.assert_array_equal(feats[k], feats2[k])
        assert info == info2

    def test_vocab_and_caption_variation(self):
        from acvae_tpu.data.synthetic import (make_synthetic_clotho,
                                              make_synthetic_clotho_rich)

        _, info, vocab = make_synthetic_clotho_rich(num_audios=60,
                                                    mel_frames=64, seed=0)
        _, _, small_vocab = make_synthetic_clotho(num_audios=60,
                                                  mel_frames=64, seed=0)
        # realistic-regime vocabulary: an order of magnitude past the small
        # grammar (which tops out around 39 words)
        assert len(vocab) > 150 > len(small_vocab)
        # synonym/template variation: a clip's five captions are not all
        # identical for the vast majority of clips
        varied = sum(len({c["caption"] for c in a["captions"]}) > 1
                     for a in info)
        assert varied >= 0.9 * len(info)
