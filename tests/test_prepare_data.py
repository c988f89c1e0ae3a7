"""wav → log-mel preprocessing CLI."""
import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

from acvae_tpu.cli.main import Runner


def test_prepare_data_roundtrip(tmp_path):
    sr = 32000
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        dur = 0.5 + 0.3 * i
        t = np.arange(int(sr * dur)) / sr
        wave = (0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t)
                + 0.05 * rng.normal(size=t.shape))
        wavfile.write(str(wav_dir / f"clip{i}.wav"), sr,
                      (wave * 32767).astype(np.int16))
    out_csv = Runner().prepare_data(str(wav_dir), str(tmp_path / "mels.h5"),
                                    str(tmp_path / "mels.csv"))
    df = pd.read_csv(out_csv, sep="\t")
    assert len(df) == 3
    import h5py
    with h5py.File(tmp_path / "mels.h5") as f:
        mel = f["clip0.wav"][()]
        assert mel.shape[1] == 64
        assert np.all(np.isfinite(mel))
        # a 0.5 s clip at hop 320 has ~50 frames
        assert 45 <= mel.shape[0] <= 55
        # pure-tone clip: the mel band at ~300 Hz dominates
        assert mel.mean() < mel.max()
