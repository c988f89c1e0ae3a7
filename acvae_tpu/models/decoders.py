"""Text decoders (word + context [+ latent z] → next-word logits).

TPU-native equivalents of ``models/decoder.py``:

* :class:`RNNDecoder` (:28-98) — GRU over [word_emb; enc_mem]; both a fused
  full-sequence teacher-forcing path (one scan, logits in one batched matmul)
  and a per-step path for sampling.
* :class:`RNNBahdanauAttnDecoder` (:129-162) — attention from decoder state to
  enc_mem, GRU over [emb; ctx].
* :class:`VAERNNBahdanauAttnDecoder` (:164-203) — the AC-VAE RNN decoder:
  GRU over [emb; ctx; z].
* :class:`TransformerDecoder` (:225-277) and :class:`VAETransformerDecoder`
  (:279-332) — causal transformer decoders; the VAE variant appends the
  per-position latents to the cross-attention memory.

Step methods take explicit state and precomputed encoder projections so
caption models can drive them inside ``lax.scan`` / beam search.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu.core.registry import DECODERS
from acvae_tpu.models.attention import AdditiveAttention
from acvae_tpu.models.rnn import GRUCell
from acvae_tpu.ops.masked import length_mask


@DECODERS.register("RNNDecoder")
class RNNDecoder(nn.Module):
    """GRU decoder over [word_emb; enc_mem] (decoder.py:28-98).

    ``enc_mem`` here is the pooled utterance embedding fed at every step
    (word_model.py:81,147)."""
    vocab_size: int
    enc_mem_size: int
    embed_size: int = 256
    hidden_size: int = 256
    dropout: float = 0.0

    def setup(self):
        self.word_embeddings = nn.Embed(
            self.vocab_size, self.embed_size,
            embedding_init=nn.initializers.kaiming_uniform())
        self.cell = GRUCell(self.hidden_size, self.embed_size + self.enc_mem_size)
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=nn.initializers.kaiming_uniform())
        self.dropoutlayer = nn.Dropout(self.dropout)

    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden_size), dtype)

    def state_dtype(self):
        """The dtype decode-loop state should carry — follows the param dtype
        so a bf16-cast variables tree (ops/amp.py) gets a bf16 loop."""
        return self.cell.wh.dtype

    def step(self, word: jnp.ndarray, state: jnp.ndarray, enc_mem: jnp.ndarray,
             train: bool = False) -> Dict[str, Any]:
        """word: [N] int; state: [N, H]; enc_mem: [N, enc_mem_size]."""
        emb = self.dropoutlayer(self.word_embeddings(word), deterministic=not train)
        h = self.cell(jnp.concatenate([emb, enc_mem], axis=-1), state)
        return {"state": h, "output": h, "logits": self.classifier(h)}

    def __call__(self, words: jnp.ndarray, enc_mem: jnp.ndarray,
                 state: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Dict[str, Any]:
        """Teacher-forcing over a whole sequence.  words: [N, T];
        enc_mem: [N, T, enc_mem_size] (or [N, enc_mem_size], broadcast)."""
        N, T = words.shape
        if enc_mem.ndim == 2:
            enc_mem = jnp.broadcast_to(enc_mem[:, None, :], (N, T, enc_mem.shape[-1]))
        emb = self.dropoutlayer(self.word_embeddings(words), deterministic=not train)
        gi = self.cell.input_proj(jnp.concatenate([emb, enc_mem], axis=-1))
        h0 = self.init_state(N, emb.dtype) if state is None else state

        def body(h, gi_t):
            h = self.cell.recur(gi_t, h)
            return h, h

        _, outs = jax.lax.scan(body, h0, jnp.moveaxis(gi, 0, 1))
        outs = jnp.moveaxis(outs, 0, 1)  # [N, T, H]
        return {"output": outs, "logits": self.classifier(outs)}


class _AttnRNNBase(nn.Module):
    """Shared machinery for the Bahdanau-attention GRU decoders."""
    vocab_size: int
    enc_mem_size: int
    embed_size: int = 256
    hidden_size: int = 256
    dropout: float = 0.0
    attn_size: Optional[int] = None
    use_z: bool = False

    def setup(self):
        self.word_embeddings = nn.Embed(
            self.vocab_size, self.embed_size,
            embedding_init=nn.initializers.kaiming_uniform())
        in_dim = self.embed_size + self.enc_mem_size * (2 if self.use_z else 1)
        self.cell = GRUCell(self.hidden_size, in_dim)
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=nn.initializers.kaiming_uniform())
        self.attn = AdditiveAttention(self.attn_size or self.hidden_size)
        self.dropoutlayer = nn.Dropout(self.dropout)

    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden_size), dtype)

    def state_dtype(self):
        """Decode-loop state dtype — follows the param dtype (ops/amp.py)."""
        return self.cell.wh.dtype

    def project_enc(self, enc_mem: jnp.ndarray) -> jnp.ndarray:
        """Precompute the attention encoder projection once per utterance."""
        return self.attn.project_enc(enc_mem)

    def _step(self, word, state, enc_mem, enc_proj, enc_mask, z, train):
        ctx, attn_w = self.attn(state, enc_mem, enc_proj, enc_mask)
        return self._step_from_ctx(word, state, ctx, attn_w, z, train)

    def attn_query(self, state: jnp.ndarray) -> jnp.ndarray:
        """Projected attention query (the fused-attention path computes the
        read outside, models/attention.py ``stacked_attention_read``)."""
        return self.attn.query(state)

    def attn_v(self) -> jnp.ndarray:
        return self.attn.v_vec()

    def _step_from_ctx(self, word, state, ctx, attn_w, z, train):
        """The post-attention half of :meth:`_step`."""
        emb = self.dropoutlayer(self.word_embeddings(word), deterministic=not train)
        parts = [emb, ctx] + ([z] if z is not None else [])
        rnn_input = jnp.concatenate(parts, axis=-1)
        h = self.cell(rnn_input, state)
        return {"state": h, "output": h, "logits": self.classifier(h),
                "attn_weights": attn_w, "rnn_input": rnn_input}

    def z_input_proj(self, z: jnp.ndarray) -> jnp.ndarray:
        """The z rows of the GRU input matmul alone — the only part of the
        input projection that must wait for the prior's z on the serial
        decode chain (fused-step path, models/vae.py ``_step_pair``).
        wi row layout follows the input concat [emb; ctx; z]."""
        zr = self.embed_size + self.enc_mem_size
        return z @ self.cell.wi[zr:]

    def step_from_gates(self, gi_partial, gh, state, z, attn_w
                        ) -> Dict[str, Any]:
        """Recurrence from precomputed gate halves: ``gi_partial`` covers the
        [emb; ctx] rows (+ input bias), ``gh`` the hidden matmul (+ bias);
        only :meth:`z_input_proj` runs after the prior's z."""
        gi = gi_partial + self.z_input_proj(z)
        h = self.cell.recur_from_gates(gi, gh, state)
        return {"state": h, "output": h, "logits": self.classifier(h),
                "attn_weights": attn_w}


@DECODERS.register("RNNLuongAttnDecoder")
class RNNLuongAttnDecoder(nn.Module):
    """decoder.py:101-126 — post-RNN (Luong) attention: run the GRU first,
    attend with the new state, logits from tanh(W[h; ctx])."""
    vocab_size: int
    enc_mem_size: int
    embed_size: int = 256
    hidden_size: int = 256
    attn_hidden_size: int = 256
    dropout: float = 0.0

    def setup(self):
        self.word_embeddings = nn.Embed(
            self.vocab_size, self.embed_size,
            embedding_init=nn.initializers.kaiming_uniform())
        self.cell = GRUCell(self.hidden_size, self.embed_size)
        self.attn = AdditiveAttention(self.attn_hidden_size)
        self.hc2attn_h = nn.Dense(self.attn_hidden_size,
                                  kernel_init=nn.initializers.kaiming_uniform())
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=nn.initializers.kaiming_uniform())
        self.dropoutlayer = nn.Dropout(self.dropout)

    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden_size), dtype)

    def state_dtype(self):
        return self.cell.wh.dtype

    def project_enc(self, enc_mem: jnp.ndarray) -> jnp.ndarray:
        return self.attn.project_enc(enc_mem)

    def step(self, word, state, enc_mem, enc_proj, enc_mask,
             train: bool = False) -> Dict[str, Any]:
        emb = self.dropoutlayer(self.word_embeddings(word), deterministic=not train)
        h = self.cell(emb, state)
        ctx, attn_w = self.attn(h, enc_mem, enc_proj, enc_mask)
        attn_h = jnp.tanh(self.hc2attn_h(jnp.concatenate([h, ctx], axis=-1)))
        return {"state": h, "output": attn_h,
                "logits": self.classifier(attn_h), "attn_weights": attn_w}


@DECODERS.register("RNNBahdanauAttnDecoder")
class RNNBahdanauAttnDecoder(_AttnRNNBase):
    """decoder.py:129-162 — GRU over [emb; attention ctx]."""

    def step(self, word, state, enc_mem, enc_proj, enc_mask,
             train: bool = False) -> Dict[str, Any]:
        return self._step(word, state, enc_mem, enc_proj, enc_mask, None, train)


@DECODERS.register("VAERNNBahdanauAttnDecoder")
class VAERNNBahdanauAttnDecoder(_AttnRNNBase):
    """decoder.py:164-203 — the AC-VAE RNN decoder: GRU over [emb; ctx; z]."""
    use_z: bool = True

    def step(self, word, state, enc_mem, enc_proj, enc_mask, z,
             train: bool = False) -> Dict[str, Any]:
        return self._step(word, state, enc_mem, enc_proj, enc_mask, z, train)

    def step_from_ctx(self, word, state, ctx, attn_w, z,
                      train: bool = False) -> Dict[str, Any]:
        """Post-attention half of :meth:`step` (fused-attention path)."""
        return self._step_from_ctx(word, state, ctx, attn_w, z, train)


def sinusoidal_pe(max_len: int, d_model: int) -> jnp.ndarray:
    """Sin/cos positional encoding (decoder.py:205-222)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class _TransformerDecoderLayer(nn.Module):
    """Post-norm transformer decoder layer (torch nn.TransformerDecoderLayer
    semantics: self-attn → add&norm → cross-attn → add&norm → FFN → add&norm)."""
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask, mem_mask, train: bool):
        # tgt: [N, T, D]; memory: [N, S, D]
        # tgt_mask: [N, T, T] bool (True = attend); mem_mask: [N, S] bool valid
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train, name="self_attn")(
            tgt, tgt, mask=tgt_mask[:, None])
        x = nn.LayerNorm(name="norm1")(tgt + drop(sa))
        ca_mask = mem_mask[:, None, None, :]  # [N, 1, 1, S]
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train, name="cross_attn")(
            x, memory, mask=ca_mask)
        x = nn.LayerNorm(name="norm2")(x + drop(ca))
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        ff = nn.Dense(self.dim_feedforward, name="linear1")(x)
        ff = drop(act(ff))
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        return nn.LayerNorm(name="norm3")(x + drop(ff))


class _TransformerBase(nn.Module):
    vocab_size: int
    enc_mem_size: int
    embed_size: int = 256
    nhead: int = 4
    nlayers: int = 2
    hidden_size: int = 2048   # dim_feedforward (decoder.py:233)
    dropout: float = 0.5
    activation: str = "relu"
    max_len: int = 100

    def setup(self):
        self.word_embeddings = nn.Embed(
            self.vocab_size, self.embed_size,
            embedding_init=nn.initializers.kaiming_uniform())
        self.layers = [
            _TransformerDecoderLayer(self.embed_size, self.nhead, self.hidden_size,
                                     self.dropout, self.activation, name=f"layer{i}")
            for i in range(self.nlayers)]
        self.outputlayer = nn.Dense(self.vocab_size,
                                    kernel_init=nn.initializers.kaiming_uniform())
        self.pe_dropout = nn.Dropout(self.dropout)
        self.emb_dropout = nn.Dropout(self.dropout)

    def state_dtype(self):
        """Decode dtype follows the param dtype (ops/amp.py bf16 mode)."""
        return self.word_embeddings.embedding.dtype

    def _embed(self, words: jnp.ndarray, train: bool) -> jnp.ndarray:
        emb = self.emb_dropout(self.word_embeddings(words),
                               deterministic=not train) * math.sqrt(self.embed_size)
        # PE joins emb's dtype so a bf16-cast decode stays bf16 (exact
        # values rounded once; the f32 default is untouched)
        pe = sinusoidal_pe(self.max_len, self.embed_size)[: words.shape[1]]
        return self.pe_dropout(emb + pe[None].astype(emb.dtype),
                               deterministic=not train)

    def _causal_mask(self, T: int) -> jnp.ndarray:
        # boolean mask for MultiHeadDotProductAttention (True = attend)
        return jnp.tril(jnp.ones((T, T), bool))

    def _run(self, words, memory, mem_mask, tgt_pad_mask, train):
        x = self._embed(words, train)
        T = words.shape[1]
        causal = self._causal_mask(T)
        # combine causal with target padding: key padded positions masked out
        tgt_mask = causal[None] & tgt_pad_mask[:, None, :]  # [N, T, T]
        for layer in self.layers:
            x = layer(x, memory, tgt_mask, mem_mask, train)
        return x


@DECODERS.register("TransformerDecoder")
class TransformerDecoder(_TransformerBase):
    """decoder.py:225-277 — causal transformer over the full prefix."""

    def __call__(self, words: jnp.ndarray, enc_mem: jnp.ndarray,
                 enc_mem_lens: jnp.ndarray, caps_padding_mask: jnp.ndarray,
                 train: bool = False) -> Dict[str, Any]:
        """words: [N, T]; enc_mem: [N, S, E]; caps_padding_mask: [N, T]
        True = PADDED (torch convention).  Returns output/logits for all T."""
        mem_mask = length_mask(enc_mem_lens, enc_mem.shape[1])
        tgt_valid = ~caps_padding_mask
        x = self._run(words, enc_mem, mem_mask, tgt_valid, train)
        return {"output": x, "logits": self.outputlayer(x)}


@DECODERS.register("VAETransformerDecoder")
class VAETransformerDecoder(_TransformerBase):
    """decoder.py:279-332 — latents z are appended to the cross-attention
    memory along the sequence axis; returns only the last position
    (the reference calls it once per decode step with the growing prefix)."""
    activation: str = "gelu"

    def __call__(self, words: jnp.ndarray, enc_mem: jnp.ndarray,
                 enc_mem_lens: jnp.ndarray, caps_padding_mask: jnp.ndarray,
                 z: jnp.ndarray, train: bool = False,
                 last_only: bool = True) -> Dict[str, Any]:
        """z: [N, T, E] per-position latents (same T as words)."""
        mem = jnp.concatenate([enc_mem, z], axis=1)
        mem_mask = jnp.concatenate(
            [length_mask(enc_mem_lens, enc_mem.shape[1]), ~caps_padding_mask], axis=1)
        tgt_valid = ~caps_padding_mask
        x = self._run(words, mem, mem_mask, tgt_valid, train)
        logits = self.outputlayer(x)
        if last_only:
            return {"output": x[:, -1], "logits": logits[:, -1]}
        return {"output": x, "logits": logits}
