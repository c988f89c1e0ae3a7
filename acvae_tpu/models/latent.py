"""Prior / posterior latent networks — the AC-VAE core modules.

TPU-native equivalents of ``models/text_encoder.py``:

* :class:`PosteriorRNN` — q(z_t | x, z_{<t}) (:96-154): BiGRU over the shifted
  caption, then a *sequential* z-chain where step t conditions on z_{t-1}.
  The reference runs the chain as a python loop; here it is a ``lax.scan``
  whose carry is z_{t-1} (SURVEY §7 "hard parts").
* :class:`PosteriorRNNHybrid` — token-level q without z-chaining (vectorized)
  plus the utterance embedding for the global constraint (:156-216).
* :class:`PriorRNN` — p(z_t | x_{<t}, A, z_{t-1}) (:218-268): word→audio
  Bahdanau attention, LSTM over [word; ctx; z_{t-1}], Linear → (μ, log σ²),
  reparameterized sample.  Exposed as a per-step function so caption models
  can drive it inside their own decode scan.
* :class:`GMMPriorRNN` — mixture-of-Gaussians prior (the reference's
  ``pnet.gmm_kernel`` path, ``models/vae_model.py:99-105``; the concrete class
  survives only in bytecode, so this is a faithful reconstruction: K mean/log
  heads + learned mixture logits, trained with ``gmm_kl_loss``).

Reparameterization uses explicit ``eps`` arguments (precomputed N(0,1) noise)
rather than internal RNG so decode scans can thread randomness as scanned xs.

NOTE: the reference's ``PriorRNN.init_hidden`` sizes the LSTM state with
``embed_size`` instead of ``hidden_size`` (text_encoder.py:240-245) — it only
works because configs set them equal.  We size with ``hidden_size``
(documented divergence; SURVEY §7 "known reference bugs").
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu.core.registry import LATENTS
from acvae_tpu.models.attention import AdditiveAttention
from acvae_tpu.models.common import scan_or_init
from acvae_tpu.models.rnn import GRU, LSTMCell
from acvae_tpu.ops.masked import max_with_lens, mean_with_lens


def reparameterize(mean: jnp.ndarray, log: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """z = μ + ε·exp(½·log σ²) (text_encoder.py:143-144)."""
    return eps * jnp.exp(0.5 * log) + mean


import os as _os

# The reference leaves log-variances unclamped (text_encoder.py:141-148) and
# nans at init; ±10 stopped the inf/nan but still let the z-CHAIN posterior
# feed z scales up to e^5 back through itself — measured STALLING the plain
# VAEModel at reference scale (KL stuck ~8e3, val CIDEr 0.13 for 8 epochs).
# ±4 keeps the chain bounded (z scale ≤ e^2) and the same run converges in
# one epoch (val CIDEr 5.77 — RESULTS.md "z-chain stability").  The trained
# regime satisfies |log σ²| ≪ 4, so the bound is inactive post-convergence;
# env-tunable for A/Bs (ACVAE_MAX_LOGVAR).
_MAX_LOGVAR = float(_os.environ.get("ACVAE_MAX_LOGVAR", 4.0))


def split_mean_log(ml: jnp.ndarray):
    """Split a stacked (μ, log σ²) projection and clamp the log-variance to
    ±10.  The reference leaves it unclamped (text_encoder.py:141-148), which
    makes the posterior z-chain ``z → Linear → ε·exp(½ log σ²) → z`` blow up
    to inf/nan at init for unlucky noise draws (the recursion is
    exponentially unstable; observed readily at small embed dims).  Inside
    the trained regime |log σ²| ≪ 10, so the clamp is inactive — documented
    stability divergence (COVERAGE.md)."""
    mean, log = jnp.split(ml, 2, axis=-1)
    return mean, jnp.clip(log, -_MAX_LOGVAR, _MAX_LOGVAR)


@LATENTS.register("PosteriorRNN")
class PosteriorRNN(nn.Module):
    """q(z_t | x, z_{<t}) with sequential z-chaining."""
    vocab_size: int
    word_dim: int = 512
    embed_size: int = 512
    hidden_size: int = 256

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.network = GRU(self.hidden_size, self.word_dim, bidirectional=True)
        self.mean_log_out = nn.Dense(2 * self.embed_size,
                                     kernel_init=nn.initializers.xavier_uniform())

    def __call__(self, caps: jnp.ndarray, cap_lens: jnp.ndarray,
                 eps: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """caps: [N, L] (with <start>..<end>); eps: [N, L-1, E] N(0,1) noise.

        Returns q_means/q_logs/q_z: [N, L-1, E].  BiGRU outputs are zero
        beyond each length (pad_packed semantics) so padded steps chain
        through z exactly like the reference loop (text_encoder.py:129-150).
        """
        x = self.word_embedding(caps[:, :-1])
        lens = cap_lens - 1
        hidden_o, _ = self.network(x, lens)  # [N, T, 2H], zeros past len

        def chain(z_prev, inputs):
            h_t, eps_t = inputs
            ml = self.mean_log_out(jnp.concatenate([h_t, z_prev], axis=-1))
            mean, log = split_mean_log(ml)
            z_t = reparameterize(mean, log, eps_t)
            return z_t, (mean, log, z_t)

        z0 = jnp.zeros((x.shape[0], self.embed_size), x.dtype)
        xs = (jnp.moveaxis(hidden_o, 0, 1), jnp.moveaxis(eps, 0, 1))
        _, (means, logs, z) = scan_or_init(self, chain, z0, xs, x.shape[1])
        return {"q_means": jnp.moveaxis(means, 0, 1),
                "q_logs": jnp.moveaxis(logs, 0, 1),
                "q_z": jnp.moveaxis(z, 0, 1)}


@LATENTS.register("PosteriorRNN_hybrid")
class PosteriorRNNHybrid(nn.Module):
    """Vectorized token-level posterior + utterance embedding
    (text_encoder.py:156-216)."""
    vocab_size: int
    word_dim: int = 512
    embed_size: int = 512
    hidden_size: int = 256

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.network = GRU(self.hidden_size, self.word_dim, bidirectional=True)
        self.token_mean_log = nn.Dense(2 * self.embed_size,
                                       kernel_init=nn.initializers.xavier_uniform())

    def __call__(self, caps: jnp.ndarray, cap_lens: jnp.ndarray,
                 eps: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = self.word_embedding(caps[:, :-1])
        lens = cap_lens - 1
        hidden_o, _ = self.network(x, lens)
        ml = self.token_mean_log(hidden_o)
        means, logs = split_mean_log(ml)
        z = reparameterize(means, logs, eps)
        # utterance embedding = masked mean + masked max of BiGRU states
        hidden = mean_with_lens(hidden_o, lens) + max_with_lens(hidden_o, lens)
        return {"q_means": means, "q_logs": logs, "q_z": z,
                "q_means_utt": hidden, "q_logs_utt": None, "q_z_utt": None}


@LATENTS.register("PosteriorSentence")
class PosteriorSentence(nn.Module):
    """Sentence-level posterior for the global-latent ablation
    (``SimpleVAEModel``, vae_model.py:366-672): BiGRU → masked mean+max pool
    → Linear → (μ, log σ²) → single z per caption.  (Reconstructed from the
    commented-out utterance head in text_encoder.py:203-209.)"""
    vocab_size: int
    word_dim: int = 512
    embed_size: int = 512
    hidden_size: int = 256

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.network = GRU(self.hidden_size, self.word_dim, bidirectional=True)
        self.utterance_mean_log = nn.Dense(2 * self.embed_size,
                                           kernel_init=nn.initializers.xavier_uniform())

    def __call__(self, caps: jnp.ndarray, cap_lens: jnp.ndarray,
                 eps: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """eps: [N, E].  Returns single-vector q stats [N, E]."""
        x = self.word_embedding(caps[:, :-1])
        lens = cap_lens - 1
        hidden_o, _ = self.network(x, lens)
        hidden = mean_with_lens(hidden_o, lens) + max_with_lens(hidden_o, lens)
        ml = self.utterance_mean_log(hidden)
        mean, log = split_mean_log(ml)
        z = reparameterize(mean, log, eps)
        return {"q_means": mean, "q_logs": log, "q_z": z}


@LATENTS.register("PriorRNN")
class PriorRNN(nn.Module):
    """Autoregressive prior p(z_t | x_{<t}, A, z_{t-1}); step-wise API."""
    vocab_size: int
    word_dim: int = 512
    audiofeats_size: int = 512
    embed_size: int = 512
    hidden_size: int = 512

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.word_attn = AdditiveAttention(self.audiofeats_size)
        self.network = LSTMCell(
            self.hidden_size,
            self.word_dim + self.audiofeats_size + self.embed_size)
        self.mean_log_out = nn.Dense(2 * self.embed_size,
                                     kernel_init=nn.initializers.xavier_uniform())

    def init_state(self, batch: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.zeros((batch, self.hidden_size), dtype)
        return (z, z)

    def state_dtype(self):
        """Decode-loop state dtype — follows the param dtype (ops/amp.py)."""
        return self.network.wh.dtype

    def project_enc(self, enc_mem: jnp.ndarray) -> jnp.ndarray:
        """Precompute the attention's encoder projection once per utterance."""
        return self.word_attn.project_enc(enc_mem)

    def step(self, word: jnp.ndarray, enc_mem: jnp.ndarray, enc_proj: jnp.ndarray,
             enc_mask: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray],
             last_z: jnp.ndarray, eps: jnp.ndarray) -> Dict[str, Any]:
        """One prior step (text_encoder.py:247-268).

        word: [N] int; enc_mem: [N, S, E]; enc_proj: [N, S, attn];
        enc_mask: [N, S] bool; state: LSTM (h, c); last_z, eps: [N, E].
        """
        x = self.word_embedding(word)
        ctx, attn_w = self.word_attn(x, enc_mem, enc_proj, enc_mask)
        return self.step_from_ctx(x, ctx, attn_w, state, last_z, eps)

    def embed(self, word: jnp.ndarray) -> jnp.ndarray:
        """Word embedding alone (the fused-attention path computes the
        attention read outside, models/attention.py
        ``stacked_attention_read``)."""
        return self.word_embedding(word)

    def attn_query(self, emb: jnp.ndarray) -> jnp.ndarray:
        return self.word_attn.query(emb)

    def attn_v(self) -> jnp.ndarray:
        return self.word_attn.v_vec()

    def step_from_ctx(self, x, ctx, attn_w, state, last_z, eps) -> Dict[str, Any]:
        """The post-attention half of :meth:`step`."""
        h, c = self.network(jnp.concatenate([x, ctx, last_z], axis=-1), state)
        return self._finish(h, c, attn_w, eps)

    def step_from_gates(self, gi, gh, attn_w, state, eps) -> Dict[str, Any]:
        """Recurrence from precomputed gate halves — the fused-step decode
        path batches this LSTM's two matmuls with the decoder GRU's into one
        MXU call (models/vae.py ``_step_pair``, ``ACVAE_FUSED_STEP=1``)."""
        h, c = self.network.recur_from_gates(gi, gh, state)
        return self._finish(h, c, attn_w, eps)

    def _finish(self, h, c, attn_w, eps) -> Dict[str, Any]:
        ml = self.mean_log_out(h)
        mean, log = split_mean_log(ml)
        z = reparameterize(mean, log, eps)
        return {"mean": mean, "log": log, "z": z, "state": (h, c),
                "attn_weights": attn_w}


@LATENTS.register("GMMPriorRNN")
class GMMPriorRNN(nn.Module):
    """Mixture-of-Gaussians autoregressive prior (gmm_kernel path,
    vae_model.py:99-105; reconstructed — see module docstring)."""
    vocab_size: int
    word_dim: int = 512
    audiofeats_size: int = 512
    embed_size: int = 512
    hidden_size: int = 512
    gmm_kernel: int = 3

    def setup(self):
        self.word_embedding = nn.Embed(self.vocab_size, self.word_dim,
                                       embedding_init=nn.initializers.normal(1.0))
        self.word_attn = AdditiveAttention(self.audiofeats_size)
        self.network = LSTMCell(
            self.hidden_size,
            self.word_dim + self.audiofeats_size + self.embed_size)
        self.mean_log_out = nn.Dense(2 * self.gmm_kernel * self.embed_size,
                                     kernel_init=nn.initializers.xavier_uniform())
        self.mixture_logits = self.param(
            "mixture_logits", nn.initializers.zeros, (self.gmm_kernel,))

    def init_state(self, batch: int, dtype=jnp.float32):
        z = jnp.zeros((batch, self.hidden_size), dtype)
        return (z, z)

    def state_dtype(self):
        return self.network.wh.dtype

    def project_enc(self, enc_mem: jnp.ndarray) -> jnp.ndarray:
        return self.word_attn.project_enc(enc_mem)

    def step(self, word, enc_mem, enc_proj, enc_mask, state, last_z, eps,
             component_u: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        """component_u: [N] uniform(0,1) for sampling the mixture component
        (defaults to the argmax component when None)."""
        x = self.word_embedding(word)
        ctx, attn_w = self.word_attn(x, enc_mem, enc_proj, enc_mask)
        h, c = self.network(jnp.concatenate([x, ctx, last_z], axis=-1), state)
        ml = self.mean_log_out(h)  # [N, 2*K*E]
        K, E = self.gmm_kernel, self.embed_size
        ml = ml.reshape(-1, K, 2 * E)
        mean = jnp.moveaxis(ml[..., :E], 1, 0)            # [K, N, E]
        log = jnp.clip(jnp.moveaxis(ml[..., E:], 1, 0),
                       -_MAX_LOGVAR, _MAX_LOGVAR)         # [K, N, E]
        probs = jax.nn.softmax(self.mixture_logits)
        if component_u is None:
            comp = jnp.argmax(probs)
            comp = jnp.full((mean.shape[1],), comp)
        else:
            cdf = jnp.cumsum(probs)
            comp = jnp.sum(component_u[:, None] > cdf[None, :], axis=-1)
        sel_mean = jnp.take_along_axis(
            jnp.moveaxis(mean, 0, 1), comp[:, None, None], axis=1)[:, 0]
        sel_log = jnp.take_along_axis(
            jnp.moveaxis(log, 0, 1), comp[:, None, None], axis=1)[:, 0]
        z = reparameterize(sel_mean, sel_log, eps)
        return {"mean": mean, "log": log, "z": z, "state": (h, c),
                "attn_weights": attn_w, "mixture_logits": self.mixture_logits}
