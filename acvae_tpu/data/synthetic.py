"""Synthetic Clotho-mini dataset for tests and benchmarks.

The reference has no test data story (SURVEY §4); this generator produces a
deterministic miniature audio-captioning dataset whose captions are *derivable
from the audio features*, so an end-to-end overfit test can drive CIDEr up:

Each clip is built from 1-2 "events" (kept at the generator's original
draw — changing it would silently invalidate every RESULTS.md number
measured on this corpus); each event stamps a characteristic
band-limited energy pattern into the log-mel and contributes a fixed phrase to
every caption of that clip.  Captions paraphrase the same events with varied
templates — giving the 5-captions-per-audio structure diversity metrics need.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from acvae_tpu.data.vocab import Vocabulary, build_vocab

_EVENTS = [
    ("dog", "barking loudly"),
    ("rain", "falling on a roof"),
    ("car", "driving past quickly"),
    ("birds", "singing in trees"),
    ("people", "talking in a room"),
    ("water", "flowing down a stream"),
    ("wind", "blowing through leaves"),
    ("machine", "humming steadily"),
]
_TEMPLATES = [
    "a {} is {}",
    "the {} is {}",
    "some {} can be heard {}",
    "a {} keeps {}",
    "there is a {} {}",
]


def make_synthetic_clotho(num_audios: int = 12, captions_per_audio: int = 5,
                          mel_frames: int = 256, mel_bins: int = 64,
                          seed: int = 0
                          ) -> Tuple[Dict[str, np.ndarray], List[dict], Vocabulary]:
    """Returns (features {audio_id: [T, F]}, caption_info, vocabulary)."""
    rng = np.random.default_rng(seed)
    features: Dict[str, np.ndarray] = {}
    caption_info: List[dict] = []
    for a in range(num_audios):
        audio_id = f"synthetic_{a:04d}.wav"
        n_events = int(rng.integers(1, 3))
        event_ids = rng.choice(len(_EVENTS), size=n_events, replace=False)
        T = int(mel_frames * (0.5 + 0.5 * rng.random())) // 32 * 32
        T = max(T, 64)
        mel = rng.normal(-4.0, 0.5, size=(T, mel_bins)).astype(np.float32)
        for k, e in enumerate(event_ids):
            # event e stamps energy into its own frequency band
            band = slice(int(e * mel_bins / len(_EVENTS)),
                         int((e + 1) * mel_bins / len(_EVENTS)))
            t0 = int(rng.integers(0, max(T // 2, 1)))
            t1 = min(T, t0 + T // 2)
            mod = 1.0 + 0.5 * np.sin(
                np.linspace(0, (e + 2) * np.pi, t1 - t0))[:, None]
            mel[t0:t1, band] += 4.0 * mod.astype(np.float32)
        features[audio_id] = mel
        captions = []
        for c in range(captions_per_audio):
            phrases = [_TEMPLATES[(c + k) % len(_TEMPLATES)].format(*_EVENTS[e])
                       for k, e in enumerate(event_ids)]
            text = " and ".join(phrases)
            captions.append({"cap_id": c + 1, "caption": text})
        caption_info.append({"audio_id": audio_id, "captions": captions})
    vocab = build_vocab(caption_info)
    return features, caption_info, vocab
