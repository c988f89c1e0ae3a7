"""Pretrained word-embedding matrices.

Equivalent of the reference's embedding extractors
(``utils/word2vec/create_word_embedding.py``, ``utils/Glove``,
``utils/fasttext``, ``utils/bert`` — SURVEY §2.8): build a ``[vocab, dim]``
matrix aligned to the Vocabulary, consumed through the
``pretrained_word_embedding`` / ``freeze_word_embedding`` config keys
(``pytorch_runner_vae.py:51-56``; ``decoder.load_word_embeddings``,
decoder.py:50-64).

Backends (auto-detected):

* ``gensim`` word2vec/fasttext models or KeyedVectors files when the package
  and a model path are available (the reference's word2vec/fasttext paths);
* plain-text GloVe files (``word<space>floats`` lines);
* ``trained``: the repo's own Stage1/global-VAE embedding tables.

Words missing from the backend get N(0, 1) rows (the reference's behavior for
OOV — create_word_embedding.py random-initializes misses).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from acvae_tpu.data.vocab import Vocabulary


def from_gensim(vocabulary: Vocabulary, model_path: str,
                seed: int = 0) -> np.ndarray:
    import gensim
    try:
        kv = gensim.models.KeyedVectors.load(model_path)
    except Exception:
        kv = gensim.models.KeyedVectors.load_word2vec_format(
            model_path, binary=model_path.endswith(".bin"))
    dim = kv.vector_size
    rng = np.random.default_rng(seed)
    out = rng.normal(size=(len(vocabulary), dim)).astype(np.float32)
    for word, idx in vocabulary.word2idx.items():
        if word in kv:
            out[idx] = kv[word]
    return out


def from_glove_txt(vocabulary: Vocabulary, path: str,
                   seed: int = 0) -> np.ndarray:
    vectors = {}
    dim = None
    with open(path) as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < 3:
                continue
            vectors[parts[0]] = np.asarray(parts[1:], np.float32)
            dim = dim or len(parts) - 1
    rng = np.random.default_rng(seed)
    out = rng.normal(size=(len(vocabulary), dim)).astype(np.float32)
    for word, idx in vocabulary.word2idx.items():
        if word in vectors:
            out[idx] = vectors[word]
    return out


def load_word_embeddings(path: str, vocabulary: Optional[Vocabulary] = None
                         ) -> np.ndarray:
    """Dispatch on file type; .npy matrices load directly (the format the
    runner consumes, pytorch_runner_vae.py:52)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith((".txt", ".vec")):
        # GloVe txt and fastText .vec share the word-per-line text format
        # (the reference's utils/fasttext path uses gensim over .bin; the
        # .bin subword model needs gensim, absent on this image)
        assert vocabulary is not None
        return from_glove_txt(vocabulary, path)
    assert vocabulary is not None
    return from_gensim(vocabulary, path)


def set_embedding_param(params: dict, module: str, matrix: np.ndarray,
                        name: str = "word_embeddings") -> dict:
    """Install a [vocab, dim] matrix into a module's embedding table
    (shape-checked like load_word_embeddings, decoder.py:51)."""
    out = dict(params)
    sub = dict(out[module])
    emb = dict(sub[name])
    assert emb["embedding"].shape == matrix.shape, \
        f"embedding shape {matrix.shape} != {emb['embedding'].shape}"
    emb["embedding"] = matrix.astype(np.float32)
    sub[name] = emb
    out[module] = sub
    return out


def freeze_mask(params, frozen_paths: tuple) -> dict:
    """Trainable-mask pytree: True = trainable, False = frozen.
    Used for freeze_word_embedding / freeze_encoder
    (pytorch_runner_vae.py:55, word_model.py:37-39)."""
    import jax

    def mark(path, leaf):
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        return not any(f in joined for f in frozen_paths)

    return jax.tree_util.tree_map_with_path(mark, params)
