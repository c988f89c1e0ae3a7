"""Auxiliary datasets: caption-only corpus + GE2E grouped captions.

Equivalents of ``datasets/global_dataset.py`` (caption-only corpus for
pretraining the global sentence VAE; hard-coded author paths replaced by
explicit arguments) and ``datasets/stage1_dataset.py`` (``uttnumbers``
captions grouped per audio with random permutation, for GE2E training).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np

from acvae_tpu import END_IDX, PAD_IDX, START_IDX
from acvae_tpu.data.vocab import Vocabulary


class CaptionCorpus:
    """Flat caption corpus (global_dataset.py:20-78): tokenized captions with
    <start>/<end>, padded to max_cap_len."""

    def __init__(self, caption_info: List[dict], vocabulary: Vocabulary,
                 max_cap_len: int = 22):
        self.vocab = vocabulary
        self.max_cap_len = max_cap_len
        self.captions = [c["tokens"].split() for a in caption_info
                         for c in a["captions"]]

    def __len__(self):
        return len(self.captions)

    def encode(self, idx: int) -> Tuple[np.ndarray, int]:
        toks = self.captions[idx]
        ids = ([START_IDX] + [self.vocab(t) for t in toks] + [END_IDX])
        ids = ids[: self.max_cap_len]
        out = np.full((self.max_cap_len,), PAD_IDX, np.int32)
        out[: len(ids)] = ids
        return out, len(ids)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(idx)
        for s in range(0, len(idx), batch_size):
            chunk = idx[s: s + batch_size]
            encoded = [self.encode(i) for i in chunk]
            caps = np.stack([c for c, _ in encoded])
            lens = np.asarray([l for _, l in encoded], np.int32)
            yield caps, lens


class Stage1Dataset:
    """GE2E groups (stage1_dataset.py:14-58): per batch, `audios_per_batch`
    audios × `uttnumbers` randomly permuted captions each."""

    def __init__(self, caption_info: List[dict], vocabulary: Vocabulary,
                 uttnumbers: int = 5, max_cap_len: int = 22):
        self.vocab = vocabulary
        self.utt = uttnumbers
        self.max_cap_len = max_cap_len
        self.audios = [[c["tokens"].split() for c in a["captions"]]
                       for a in caption_info
                       if len(a["captions"]) >= uttnumbers]

    def __len__(self):
        return len(self.audios)

    def _encode(self, toks):
        ids = ([START_IDX] + [self.vocab(t) for t in toks] + [END_IDX])
        ids = ids[: self.max_cap_len]
        out = np.full((self.max_cap_len,), PAD_IDX, np.int32)
        out[: len(ids)] = ids
        return out, len(ids)

    def require_batch(self, audios_per_batch: int, seed: int = 0,
                      epoch: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """First batch, with an actionable error instead of a bare
        StopIteration when the dataset is too small to form one."""
        if len(self.audios) < audios_per_batch:
            raise ValueError(
                f"Stage1Dataset has only {len(self.audios)} audios with >= "
                f"{self.utt} captions, fewer than audios_per_batch="
                f"{audios_per_batch}; lower audios_per_batch or uttnumbers")
        return next(self.batches(audios_per_batch, seed, epoch))

    def batches(self, audios_per_batch: int, seed: int = 0, epoch: int = 0
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (caps [A*M, L], lens [A*M]) row-major by audio group."""
        # NOTE: yields nothing when fewer qualifying audios than
        # audios_per_batch (a small val split legitimately produces zero
        # batches); callers that *require* a batch use require_batch()
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(len(self.audios))
        for s in range(0, len(order) - audios_per_batch + 1, audios_per_batch):
            caps, lens = [], []
            for ai in order[s: s + audios_per_batch]:
                group = self.audios[ai]
                perm = rng.permutation(len(group))[: self.utt]
                for ci in perm:
                    c, l = self._encode(group[ci])
                    caps.append(c)
                    lens.append(l)
            yield np.stack(caps), np.asarray(lens, np.int32)
