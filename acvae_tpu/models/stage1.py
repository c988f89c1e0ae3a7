"""Stage-1 caption embedder + GE2E contrastive loss.

Reconstruction of the pyc-only ``models/stage1_model.py`` (SURVEY §2.1):
``Stage1Encoder`` = word embedding → LSTM → Linear → BatchNorm1d with
mean+max pooling over tokens, trained with the GE2E loss over
[audios × utterances] caption groups (``runners/stage1_runner.py``); the
vectorized centroid/cossim/loss math follows ``models/utils.py:170-274``.

The trained embedder's per-caption embeddings regularize caption training
through ``embedding_path`` (SURVEY §3.5).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from acvae_tpu.models.rnn import GRU
from acvae_tpu.ops.masked import max_with_lens, mean_with_lens


class Stage1Encoder(nn.Module):
    """Caption → fixed-size embedding."""
    vocab_size: int
    word_dim: int = 512
    hidden_size: int = 512
    embed_size: int = 512

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        # bidirectional GRU stands in for the reference's LSTM trunk: both
        # produce per-token states; the pooled projection below matches.
        self.rnn = GRU(self.hidden_size, self.word_dim, bidirectional=True)
        self.projection = nn.Dense(self.embed_size,
                                   kernel_init=nn.initializers.kaiming_uniform())
        self.bn = nn.BatchNorm(momentum=0.9)

    def __call__(self, caps: jnp.ndarray, cap_lens: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """caps: [N, L] -> caption_embeds [N, E] (mean+max pooled, projected,
        batch-normed)."""
        x = self.word_embedding(caps)
        hidden, _ = self.rnn(x, cap_lens)
        pooled = mean_with_lens(hidden, cap_lens) + max_with_lens(hidden, cap_lens)
        out = self.projection(pooled)
        return self.bn(out, use_running_average=not train)


def get_centroids(embeddings: jnp.ndarray) -> jnp.ndarray:
    """[A, M, E] -> [A, E] (models/utils.py:170-172)."""
    return jnp.mean(embeddings, axis=1)


def get_utterance_centroids(embeddings: jnp.ndarray) -> jnp.ndarray:
    """Leave-one-out centroids [A, M, E] (models/utils.py:183-200)."""
    total = jnp.sum(embeddings, axis=1, keepdims=True)
    return (total - embeddings) / (embeddings.shape[1] - 1)


def _cos(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    num = jnp.sum(a * b, -1)
    return num / jnp.maximum(jnp.linalg.norm(a, axis=-1)
                             * jnp.linalg.norm(b, axis=-1), eps)


def get_cossim(embeddings: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """[A, M, E] × [A, E] -> [A, M, A] similarity matrix where the diagonal
    (own-speaker) entries use leave-one-out centroids
    (models/utils.py:214-257)."""
    A, M, E = embeddings.shape
    cos_diff = _cos(embeddings[:, :, None, :], centroids[None, None, :, :])
    own = _cos(embeddings, get_utterance_centroids(embeddings))   # [A, M]
    eye = jnp.eye(A, dtype=bool)[:, None, :]
    cos_diff = jnp.where(eye, own[:, :, None], cos_diff)
    return cos_diff + 1e-6


class GE2ELoss(nn.Module):
    """sim = w·cos + b with w clamped positive; softmax-contrast loss
    (models/utils.py:268-274)."""

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w", lambda k: jnp.asarray(10.0))
        b = self.param("b", lambda k: jnp.asarray(-5.0))
        w = jnp.maximum(w, 1e-6)
        sim = w * get_cossim(embeddings, get_centroids(embeddings)) + b
        A = sim.shape[0]
        pos = sim[jnp.arange(A), :, jnp.arange(A)]            # [A, M]
        neg = jnp.log(jnp.sum(jnp.exp(sim), axis=2) + 1e-6)   # [A, M]
        return jnp.sum(-(pos - neg))


def equal_error_rate(sim_matrix: jnp.ndarray) -> Tuple[float, float]:
    """EER of a verification similarity matrix — the reference's threshold
    sweep (stage1_runner.py:190-207) exactly: thresholds 0.00..0.99, strict
    ``sim > thr``; FAR = off-diagonal accepts / ((A−1)·Mv·A), FRR = diagonal
    rejects / (Mv·A); pick the threshold minimizing \\|FAR − FRR\\| and report
    EER = (FAR + FRR)/2 there.

    ``sim_matrix``: [A, Mv, A] cosine similarities of A audios × Mv
    verification captions against the A enrollment centroids (diagonal
    [i, :, i] = genuine trials).  Returns ``(eer, threshold)``.
    """
    import numpy as np
    sim = np.asarray(sim_matrix)
    a, mv, _ = sim.shape
    if a < 2:
        raise ValueError("EER needs at least 2 audios (FAR divides by A-1)")
    diag = sim[np.arange(a), :, np.arange(a)]        # [A, Mv] genuine
    # (diff, eer, thr); diff starts at inf so degenerate matrices (every
    # threshold gives |FAR-FRR| == 1) still report their true EER of 0.5
    # instead of the reference's silent 0.0 (stage1_runner.py:190 inits
    # diff=1 with a strict comparison — documented divergence)
    best = (float("inf"), 0.5, 0.0)
    for thr in (0.01 * i for i in range(100)):
        acc = sim > thr
        diag_acc = diag > thr
        far = (acc.sum() - diag_acc.sum()) / (a - 1.0) / mv / a
        frr = (mv * a - diag_acc.sum()) / mv / a
        diff = abs(far - frr)
        if diff < best[0]:
            best = (diff, (far + frr) / 2, thr)
    return float(best[1]), float(best[2])
