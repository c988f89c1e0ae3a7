"""Caption discriminators for adversarial / condition-aware training.

Reconstruction of the pyc-only ``models/discriminator_model.py``
(SURVEY §2.1): ``DiscriminatorBaseModel`` / ``DiscriminatorRNNModel`` /
``DiscriminatorModel`` — an audio→caption classifier (``aud2capclassifier``)
and caption→caption classifier (``cap2capclassifier``) built from a GRU
caption context with normalize+matmul (cosine) similarity, optionally through
a sigmoid.  Consumed by ``AdverseLossWrapper`` / ``ConditionLossWrapper``
(``losses/loss.py:127-155,279-319``).

Captions arrive as one-hot / soft distributions [N, T, V] (straight-through
argmax or gumbel samples from the generator) or as int ids [N, T].
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu.models.rnn import GRU
from acvae_tpu.ops.masked import max_with_lens, mean_with_lens


def _embed_soft(embedding: nn.Embed, caps: jnp.ndarray) -> jnp.ndarray:
    """ids [N, T] -> embed lookup; distributions [N, T, V] -> soft mix
    (differentiable path for straight-through samples)."""
    if caps.ndim == 2:
        return embedding(caps)
    return caps @ embedding.embedding


class CaptionContext(nn.Module):
    """Caption branch: (soft-)embedding → BiGRU → mean+max pooling."""
    vocab_size: int
    word_dim: int = 512
    hidden_size: int = 256
    embed_size: int = 512

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.rnn = GRU(self.hidden_size, self.word_dim, bidirectional=True)
        self.proj = nn.Dense(self.embed_size,
                             kernel_init=nn.initializers.kaiming_uniform())

    def __call__(self, caps: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
        x = _embed_soft(self.word_embedding, caps)
        hidden, _ = self.rnn(x, lens)
        pooled = mean_with_lens(hidden, lens) + max_with_lens(hidden, lens)
        return self.proj(pooled)


def _cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a * b, axis=-1)


class DiscriminatorRNNModel(nn.Module):
    """Audio↔caption and caption↔caption similarity discriminator
    (raw scores; ``DiscriminatorModel`` adds the sigmoid)."""
    vocab_size: int
    audio_dim: int = 512
    word_dim: int = 512
    hidden_size: int = 256
    embed_size: int = 512

    def setup(self):
        self.cap_context = CaptionContext(self.vocab_size, self.word_dim,
                                          self.hidden_size, self.embed_size)
        self.aud_proj = nn.Dense(self.embed_size,
                                 kernel_init=nn.initializers.kaiming_uniform())
        self.scale = self.param("scale", lambda k: jnp.asarray(10.0))
        self.bias = self.param("bias", lambda k: jnp.asarray(-5.0))

    def aud2cap(self, audio_feats: jnp.ndarray, feats_lens: jnp.ndarray,
                caps: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
        """audio_feats: [N, S, D] temporal (pooled internally) or [N, D]."""
        if audio_feats.ndim == 3:
            audio = mean_with_lens(audio_feats, feats_lens)
        else:
            audio = audio_feats
        audio = self.aud_proj(audio)
        cap = self.cap_context(caps, lens)
        return jnp.maximum(self.scale, 1e-6) * _cosine(audio, cap) + self.bias

    def cap2cap(self, caps_a, lens_a, caps_b, lens_b) -> jnp.ndarray:
        a = self.cap_context(caps_a, lens_a)
        b = self.cap_context(caps_b, lens_b)
        return jnp.maximum(self.scale, 1e-6) * _cosine(a, b) + self.bias

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self.aud2cap(batch["audio_feats"], batch.get("feats_lens"),
                            batch["caps"], batch["lens"])


class DiscriminatorModel(DiscriminatorRNNModel):
    """+ sigmoid → probability (losses expect probs: loss.py:134,152)."""

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return jax.nn.sigmoid(super().__call__(batch))


class Aud2CapDiscriminatorTrainer(nn.Module):
    """End-to-end audio↔caption discriminator training objective.

    Positives are the dataset's aligned (audio, caption) pairs; negatives
    pair each audio with the next sample's caption (batch roll) — the
    matching-classifier training the reference's discriminator family was
    built for but never wired (SURVEY §2.1, `cli train_discriminator`).
    Returns sigmoid probabilities for both."""
    encoder: nn.Module
    dscrm: DiscriminatorRNNModel

    def __call__(self, feats, feat_lens, caps, cap_lens, train: bool = True):
        enc = self.encoder(feats, feat_lens, train=train)
        a, al = enc["audio_embeds"], enc["audio_embeds_lens"]
        pos = self.dscrm.aud2cap(a, al, caps, cap_lens)
        neg = self.dscrm.aud2cap(a, al, jnp.roll(caps, 1, axis=0),
                                 jnp.roll(cap_lens, 1, axis=0))
        return jax.nn.sigmoid(pos), jax.nn.sigmoid(neg)


class Cap2CapDiscriminatorTrainer(nn.Module):
    """Caption↔caption discriminator objective over sibling groups.

    caps arrive grouped ``uttnumbers`` captions per audio (Stage1Dataset
    layout, [A·utt, L]): positives pair each caption with the next sibling
    of the same audio; negatives roll whole audio groups against each
    other."""
    dscrm: DiscriminatorRNNModel
    uttnumbers: int = 5

    def __call__(self, caps, cap_lens, train: bool = True):
        n = caps.shape[0]
        u = self.uttnumbers
        idx = jnp.arange(n)
        sibling = (idx // u) * u + (idx + 1) % u         # next cap, same audio
        other = (idx + u) % n                            # same slot, next audio
        pos = self.dscrm.cap2cap(caps, cap_lens,
                                 caps[sibling], cap_lens[sibling])
        neg = self.dscrm.cap2cap(caps, cap_lens,
                                 caps[other], cap_lens[other])
        return jax.nn.sigmoid(pos), jax.nn.sigmoid(neg)
