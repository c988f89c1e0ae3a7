"""Waveform → log-mel frontend, on device.

The reference consumes *precomputed* HDF5 log-mels (preprocessing delegated to
wsntxxn/AudioCaption, README.md:13-15; the PANN encoders carry commented-out
Spectrogram/LogmelFilterBank stages, encoder.py:877-889).  BASELINE.json asks
for the frontend on device: here framing + Hann window + rFFT + mel filterbank
run under jit — the filterbank projection is one MXU matmul, and XLA fuses the
window/|·|²/log elementwise chain around the FFT.

Defaults mirror the PANN/librosa convention (sr=32k, n_fft=1024, hop=320,
64 slaney-normalized mel bands, log10 with amin/top_db clipping).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 50.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_fft//2+1, n_mels].

    Cached: the host-side numpy construction (a python loop over n_mels)
    would otherwise rerun on every ``log_mel_spectrogram`` call."""
    fmax = fmax or sr / 2
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                    n_mels + 2))
    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2: n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    out = weights.T.astype(np.float32)  # [n_freqs, n_mels]
    out.setflags(write=False)           # cached object must stay immutable
    return out


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft_power(wave: jnp.ndarray, n_fft: int = 1024, hop_length: int = 320,
               center: bool = True) -> jnp.ndarray:
    """Power spectrogram [N, frames, n_fft//2+1] with a Hann window."""
    if center:
        pad = n_fft // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    N, L = wave.shape
    n_frames = 1 + (L - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = wave[:, idx]                                  # [N, frames, n_fft]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.abs(spec) ** 2


def log_mel_spectrogram(wave: jnp.ndarray, sr: int = 32000, n_fft: int = 1024,
                        hop_length: int = 320, n_mels: int = 64,
                        fmin: float = 50.0, fmax: Optional[float] = None,
                        amin: float = 1e-10, top_db: Optional[float] = None,
                        ref: float = 1.0) -> jnp.ndarray:
    """wave [N, L] -> log-mel [N, frames, n_mels] (librosa power_to_db
    convention: 10·log10(max(S, amin)/ref), optional top_db floor)."""
    power = stft_power(wave, n_fft, hop_length)
    fbank = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = power @ fbank                                    # MXU matmul
    log_mel = 10.0 * jnp.log10(jnp.maximum(mel, amin) / ref)
    if top_db is not None:
        log_mel = jnp.maximum(log_mel,
                              jnp.max(log_mel, axis=(1, 2), keepdims=True)
                              - top_db)
    return log_mel
