"""Stand-alone global sentence VAE.

Reconstruction of the pyc-only ``models/global_vae_model.py`` (SURVEY §2.1):
``Global_encoder`` (embedding → RNN → context) with ``context_to_mu`` /
``context_to_logvar`` heads, ``Global_decoder`` with word dropout on its
inputs, and an ``inference`` path.  Pretrained on the caption corpus
(``datasets/global_dataset.py``) and loaded into the Hybrid model via
``pretrained_global`` (``runners/pytorch_runner_vae.py:65-67``) — here that
load is the shape-filtered param merge in ``acvae_tpu.train.pretrained``.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, MAX_LENGTH, START_IDX, UNK_IDX
from acvae_tpu.decoding.sampling import sample_next_word
from acvae_tpu.models.common import scan_or_init
from acvae_tpu.models.rnn import GRU, GRUCell
from acvae_tpu.ops.masked import max_with_lens, mean_with_lens


class GlobalSentenceVAE(nn.Module):
    """Sentence-level VAE: q(z|sentence) BiGRU encoder, GRU decoder with word
    dropout, standard N(0,1) prior."""
    vocab_size: int
    word_dim: int = 512
    hidden_size: int = 512
    latent_size: int = 512
    word_dropout: float = 0.3

    pad_idx = 0
    start_idx = START_IDX
    end_idx = END_IDX
    unk_idx = UNK_IDX

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.encoder_rnn = GRU(self.hidden_size, self.word_dim,
                               bidirectional=True)
        self.context_to_mu = nn.Dense(self.latent_size,
                                      kernel_init=nn.initializers.xavier_uniform())
        self.context_to_logvar = nn.Dense(self.latent_size,
                                          kernel_init=nn.initializers.xavier_uniform())
        self.z_to_state = nn.Dense(self.hidden_size,
                                   kernel_init=nn.initializers.xavier_uniform())
        self.decoder_cell = GRUCell(self.hidden_size,
                                    self.word_dim + self.latent_size)
        self.outputlayer = nn.Dense(self.vocab_size,
                                    kernel_init=nn.initializers.kaiming_uniform())

    def encode(self, caps: jnp.ndarray, cap_lens: jnp.ndarray, eps: jnp.ndarray):
        x = self.word_embedding(caps)
        hidden, _ = self.encoder_rnn(x, cap_lens)
        context = mean_with_lens(hidden, cap_lens) + max_with_lens(hidden, cap_lens)
        mu = self.context_to_mu(context)
        logvar = self.context_to_logvar(context)
        z = mu + eps * jnp.exp(0.5 * logvar)
        return mu, logvar, z

    def __call__(self, caps: jnp.ndarray, cap_lens: jnp.ndarray,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        """Teacher-forced reconstruction with word dropout on decoder inputs."""
        N, L = caps.shape
        T = L - 1
        key = self.make_rng("sample")
        k_eps, k_drop = jax.random.split(key)
        mu, logvar, z = self.encode(caps, cap_lens,
                                    jax.random.normal(k_eps, (N, self.latent_size)))
        words_in = caps[:, :T]
        if train and self.word_dropout > 0:
            drop = jax.random.uniform(k_drop, (N, T)) < self.word_dropout
            keep_special = words_in < 4  # never drop pad/start/end/unk
            words_in = jnp.where(drop & ~keep_special, self.unk_idx, words_in)
        emb = self.word_embedding(words_in)
        z_seq = jnp.broadcast_to(z[:, None, :], (N, T, self.latent_size))
        gi = self.decoder_cell.input_proj(
            jnp.concatenate([emb, z_seq], axis=-1))
        h0 = jnp.tanh(self.z_to_state(z))

        def body(h, gi_t):
            h = self.decoder_cell.recur(gi_t, h)
            return h, h

        _, outs = jax.lax.scan(body, h0, jnp.moveaxis(gi, 0, 1)) \
            if not self.is_initializing() else (
                h0, jnp.broadcast_to(h0[None], (T,) + h0.shape))
        outs = jnp.moveaxis(outs, 0, 1)
        return {"logits": self.outputlayer(outs), "mu": mu, "logvar": logvar,
                "z": z}

    def inference(self, batch: int, max_length: Optional[int] = None,
                  decode_method: str = "sample", temp: float = 1.0
                  ) -> Dict[str, jnp.ndarray]:
        """Sample z ~ N(0,1) and decode a sentence."""
        T = max_length or MAX_LENGTH
        key = self.make_rng("sample")
        k_z, k_s = jax.random.split(key)
        z = jax.random.normal(k_z, (batch, self.latent_size))
        h0 = jnp.tanh(self.z_to_state(z))
        samp_keys = jax.random.split(k_s, T)

        def step(carry, key_t):
            h, prev_word, finished = carry
            emb = self.word_embedding(prev_word)
            h = self.decoder_cell(jnp.concatenate([emb, z], axis=-1), h)
            logits = self.outputlayer(h)
            w_t, lp = sample_next_word(logits, key_t, decode_method, temp)
            w_t = jnp.where(finished, self.end_idx, w_t)
            finished = finished | (w_t == self.end_idx)
            return (h, w_t, finished), {"seqs": w_t, "logits": logits}

        carry0 = (h0, jnp.full((batch,), self.start_idx, jnp.int32),
                  jnp.zeros((batch,), bool))
        _, ys = scan_or_init(self, step, carry0, samp_keys, T)
        return {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}
