"""Clotho data pipeline: HDF5 log-mel features + caption pairs → static-shape
device batches.

Replaces the reference's torch ``Dataset``/``Sampler``/``collate_fn``
(``datasets/caption_dataset.py``) with a TPU-first pipeline:

* the (audio, caption) pair index — 5 captions/audio become 5 samples
  (``CaptionSampler``, caption_dataset.py:199-224) — is a flat numpy array,
  shuffled deterministically per epoch;
* variable mel lengths are padded to a small set of **time buckets** (XLA
  needs static shapes; each bucket compiles once) and captions to a fixed
  ``max_length + 2``;
* per-host sharding for multi-host data parallelism replaces the reference's
  half-finished ``CaptionDistributedSampler`` (caption_dataset.py:226-276,
  SURVEY §2.9): each host takes a deterministic stride of the pair index;
* optional CPU-side augmentation hook (on-device SpecAugment lives in
  ``acvae_tpu.ops.specaug`` and is preferred).
"""
from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from acvae_tpu import END_IDX, MAX_LENGTH, PAD_IDX, START_IDX
from acvae_tpu.data.vocab import Vocabulary

# default mel-time buckets: multiples of 32 covering Clotho's ≲2900 frames
DEFAULT_BUCKETS = (256, 512, 768, 1024, 1536, 2048, 2560, 3072)


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ length (last bucket crops longer clips)."""
    i = bisect.bisect_left(buckets, length)
    return buckets[min(i, len(buckets) - 1)]


@dataclass
class Batch:
    """Host-side batch; ``audio_ids`` stays on host, arrays go to device."""
    feats: np.ndarray        # [N, T_bucket, F] float32
    feat_lens: np.ndarray    # [N] int32
    caps: np.ndarray         # [N, L] int32
    cap_lens: np.ndarray     # [N] int32
    audio_ids: List[str] = field(default_factory=list)
    cap_embeds: Optional[np.ndarray] = None  # [N, E] (embedding_path)
    # per-sample caption position within its audio + the caption's cap_id
    # tag — the CaptionInstanceDataset payload (caption_dataset.py:187-197)
    # and the AugmentLossWrapper's aug-tag source (loss.py:81-83)
    cap_indices: Optional[np.ndarray] = None  # [N] int32
    cap_ids: Optional[List[str]] = None

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {"feats": self.feats, "feat_lens": self.feat_lens,
               "caps": self.caps, "cap_lens": self.cap_lens}
        if self.cap_embeds is not None:
            out["cap_embeds"] = self.cap_embeds
        return out


class CaptionDataset:
    """HDF5-backed (audio, caption) pair dataset (caption_dataset.py:66-116).

    h5file_dict: {audio_id: hdf5_path}; caption_info: text.json "audios" list.
    Features may alternatively be provided in-memory via ``features``
    ({audio_id: np.ndarray [T, F]}) for tests/benchmarks.
    """

    def __init__(self, h5file_dict: Optional[Dict[str, str]] = None,
                 caption_info: Optional[List[dict]] = None,
                 vocabulary: Optional[Vocabulary] = None,
                 features: Optional[Dict[str, np.ndarray]] = None,
                 transform: Optional[List[Callable]] = None,
                 max_cap_len: int = MAX_LENGTH + 2,
                 embedding_path: Optional[str] = None,
                 embedding_scaler: bool = False):
        self._h5file_dict = h5file_dict or {}
        self._features = features
        self._caption_info = caption_info or []
        self._vocabulary = vocabulary
        self._transform = transform or []
        # per-caption embedding .npy tree (caption_dataset.py:105-110):
        # <embedding_path>/<audio_id>/<cap_idx>.npy
        self._embedding_path = embedding_path
        # standard-scaler fit over the caption embeddings (the reference's
        # sklearn StandardScaler pass, run_sentence.py:54-73)
        self._emb_mean = self._emb_std = None
        if embedding_scaler and embedding_path is not None:
            import os
            embs = []
            for info in self._caption_info:
                for ci in range(len(info["captions"])):
                    p = os.path.join(embedding_path, info["audio_id"],
                                     f"{ci}.npy")
                    if os.path.exists(p):
                        embs.append(np.load(p))
            if embs:
                stack = np.stack(embs)
                self._emb_mean = stack.mean(0)
                self._emb_std = np.maximum(stack.std(0), 1e-8)
        self._h5_cache: Dict[str, object] = {}
        self.max_cap_len = max_cap_len
        # flat (audio_idx, cap_idx) pair index (CaptionSampler semantics)
        self.pairs = np.array(
            [(ai, ci) for ai, info in enumerate(self._caption_info)
             for ci in range(len(info["captions"]))], dtype=np.int64)
        first = self._caption_info[0]["audio_id"] if self._caption_info else None
        self.data_dim = (self._load_feature(first).shape[-1]
                         if first is not None else None)

    def __len__(self) -> int:
        return len(self.pairs)

    def _load_feature(self, audio_id: str) -> np.ndarray:
        if self._features is not None:
            return np.asarray(self._features[audio_id])
        import h5py
        path = self._h5file_dict[audio_id]
        if path not in self._h5_cache:
            self._h5_cache[path] = h5py.File(path, "r")
        return np.asarray(self._h5_cache[path][audio_id]).squeeze()

    def get(self, pair_idx: int):
        ai, ci = self.pairs[pair_idx]
        info = self._caption_info[ai]
        audio_id = info["audio_id"]
        feature = self._load_feature(audio_id).astype(np.float32)
        for t in self._transform:
            feature = t(feature)
        tokens = info["captions"][ci]["tokens"].split()
        cap = ([START_IDX] + [self._vocabulary(t) for t in tokens] + [END_IDX])
        cap = cap[: self.max_cap_len]
        if self._embedding_path is not None:
            import os
            emb = np.load(os.path.join(self._embedding_path, audio_id,
                                       f"{ci}.npy"))
            if self._emb_mean is not None:
                emb = (emb - self._emb_mean) / self._emb_std
            return audio_id, feature, np.asarray(cap, np.int32), emb
        return audio_id, feature, np.asarray(cap, np.int32)

    def feat_len(self, pair_idx: int) -> int:
        """Mel frame count of a pair's audio from HDF5 *shape metadata* only
        (no data read) — lets every host compute the global batch's time
        bucket cheaply in multi-host runs."""
        ai, _ = self.pairs[pair_idx]
        audio_id = self._caption_info[ai]["audio_id"]
        if not hasattr(self, "_len_cache"):
            self._len_cache: Dict[str, int] = {}
        if audio_id not in self._len_cache:
            if self._features is not None:
                shape = np.asarray(self._features[audio_id]).shape
            else:
                import h5py
                path = self._h5file_dict[audio_id]
                if path not in self._h5_cache:
                    self._h5_cache[path] = h5py.File(path, "r")
                shape = self._h5_cache[path][audio_id].shape
            dims = [s for s in shape if s != 1]  # mirror .squeeze()
            self._len_cache[audio_id] = int(dims[-2]) if len(dims) >= 2 else 1
        return self._len_cache[audio_id]

    def cap_tag(self, pair_idx: int) -> str:
        """The caption's ``cap_id`` tag (augmented captions carry "aug" in
        it, loss.py:81-83), falling back to the caption position."""
        ai, ci = self.pairs[pair_idx]
        c = self._caption_info[ai]["captions"][ci]
        return str(c.get("cap_id", ci))

    def refs(self) -> Dict[str, List[str]]:
        """audio_id → list of reference token strings (for scoring)."""
        return {info["audio_id"]: [c["tokens"] for c in info["captions"]]
                for info in self._caption_info}


class CaptionLoader:
    """Batches a CaptionDataset with bucketing, shuffling and host sharding."""

    def __init__(self, dataset: CaptionDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 host_id: int = 0, host_count: int = 1,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.buckets = tuple(buckets)
        self.host_id = host_id
        self.host_count = host_count
        self.drop_last = drop_last
        self.epoch = 0
        if host_count > 1 and getattr(dataset, "_transform", None):
            # multi-host bucketing reads HDF5 *shape metadata* only
            # (feat_len) so every host agrees on each batch's bucket; a
            # CPU-side transform that changes the time length would make
            # that metadata wrong and silently truncate features.  The
            # supported augmentation path is the on-device one
            # (ops/specaug.build_augment), which runs after collation.
            raise ValueError(
                "CaptionLoader(host_count>1) does not support CPU-side "
                "dataset transforms (bucket choice uses HDF5 shape "
                "metadata); use the on-device augment pipeline instead")

    def __len__(self) -> int:
        n = len(self.dataset)
        per_host = (n + self.host_count - 1) // self.host_count
        if self.drop_last:
            return per_host // self.batch_size
        return (per_host + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _global_perm(self) -> np.ndarray:
        """The epoch's global pair permutation, padded to a host_count
        multiple — identical on every host (shared seed), so each host can
        reason about every other host's shard."""
        cached = getattr(self, "_perm_cache", None)
        if cached is not None and cached[0] == self.epoch:
            return cached[1]
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        pad = (-len(idx)) % self.host_count
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        self._perm_cache = (self.epoch, idx)
        return idx

    def _indices(self) -> np.ndarray:
        # this host's stride of the global permutation (deterministic
        # per-host shard — the CaptionDistributedSampler the reference
        # never wired up)
        return self._global_perm()[self.host_id::self.host_count]

    def prefetch(self, depth: int = 2, skip_batches: int = 0,
                 stage: Optional[Callable[[Batch], Batch]] = None
                 ) -> Iterator[Batch]:
        """Iterate with a background-thread prefetcher — the TPU-side
        replacement for torch DataLoader workers (HDF5 reads + numpy collate
        overlap with device compute).  ``skip_batches`` fast-forwards a
        mid-epoch resume at the *index* level: the skipped batches are never
        read from HDF5 or collated (the epoch permutation is deterministic,
        so batch k of the resumed epoch is batch k of the original one).

        ``stage`` runs on each batch *in the producer thread* before it is
        queued — pass a ``jax.device_put`` wrapper to overlap the
        host→device upload with the previous step's compute (the dominant
        per-step cost on upload-bound links; see ``cli.main`` train).  The
        staged result replaces the batch in iteration order."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()
        error: list = []

        # plain iteration when not skipping, so subclass __iter__ overrides
        # keep working through prefetch()
        source = (self if not skip_batches
                  else self._iter_batches(skip_batches))

        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone —
            otherwise an early consumer exit (break / raised train step)
            would leave the thread blocked in q.put() forever, pinning
            `depth` multi-MB batches for the process lifetime."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in source:
                    if stage is not None:
                        batch = stage(batch)
                    if not put(batch):
                        return
            except BaseException as e:  # re-raised on the consumer side
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[Batch]:
        return self._iter_batches(0)

    def _iter_batches(self, skip_batches: int = 0) -> Iterator[Batch]:
        idx = self._indices()
        L = self.dataset.max_cap_len
        for start in range(skip_batches * self.batch_size, len(idx),
                           self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            items = [self.dataset.get(i) for i in chunk]
            max_t = max(item[1].shape[0] for item in items)
            if self.host_count > 1:
                # multi-host: all hosts must pick the SAME bucket for this
                # batch position (the shards are assembled into one global
                # array) — take the max over every host's chunk, via shape
                # metadata only
                perm = self._global_perm()
                rows = np.concatenate(
                    [perm[h::self.host_count][start:start + self.batch_size]
                     for h in range(self.host_count)])
                max_t = max(self.dataset.feat_len(int(i)) for i in rows)
            bucket = pick_bucket(max_t, self.buckets)
            N = len(items)
            F = items[0][1].shape[1]
            has_emb = len(items[0]) == 4
            feats = np.zeros((N, bucket, F), np.float32)
            feat_lens = np.zeros((N,), np.int32)
            caps = np.full((N, L), PAD_IDX, np.int32)
            cap_lens = np.zeros((N,), np.int32)
            embs = (np.zeros((N, items[0][3].shape[-1]), np.float32)
                    if has_emb else None)
            ids = []
            for i, item in enumerate(items):
                aid, feat, cap = item[:3]
                t = min(feat.shape[0], bucket)
                feats[i, :t] = feat[:t]
                feat_lens[i] = t
                caps[i, : len(cap)] = cap
                cap_lens[i] = len(cap)
                if has_emb:
                    embs[i] = item[3]
                ids.append(aid)
            cap_indices = np.asarray(
                [self.dataset.pairs[int(i)][1] for i in chunk], np.int32)
            cap_ids = [self.dataset.cap_tag(int(i)) for i in chunk]
            yield Batch(feats, feat_lens, caps, cap_lens, ids, embs,
                        cap_indices, cap_ids)
