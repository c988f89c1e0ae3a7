"""Regenerate tests/data/mel_golden.npz — the pinned log-mel frontend golden.

The image has no librosa, so a literal librosa dump is not producible here;
this fixture pins the *verified* frontend instead: stft_power is golden-tested
against torch.stft (tests/test_augment.py::test_stft_matches_torch) and the
filterbank is the Slaney formula written out twice (ops/audio.py and the
independent re-derivation in TestLogMel).  When librosa IS available the
filterbank test compares against it directly; this file regenerates the pin
after an intentional frontend change:

    python tests/data/make_mel_fixture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")

from acvae_tpu.ops.audio import log_mel_spectrogram, mel_filterbank  # noqa: E402


def chirp(sr=32000, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    f0, f1 = 100.0, 8000.0
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * seconds))
    return (np.sin(phase) * np.hanning(len(t))).astype(np.float32)


def main():
    fb = mel_filterbank(32000, 1024, 64, fmin=50)
    wave = chirp()[None]
    logmel = np.asarray(log_mel_spectrogram(
        jax.numpy.asarray(wave), top_db=None))
    out = os.path.join(os.path.dirname(__file__), "mel_golden.npz")
    np.savez_compressed(out, filterbank=fb, wave=wave[0], logmel=logmel[0])
    print(f"wrote {out}: fb{fb.shape} logmel{logmel.shape}")


if __name__ == "__main__":
    main()
