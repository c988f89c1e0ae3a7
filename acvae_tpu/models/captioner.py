"""Non-VAE caption models.

TPU-native equivalents of the reference's plain captioners:

* :class:`AttnCaptionModel` — ``Seq2SeqAttnModel`` (``models/attn_model.py:49-126``):
  Bahdanau-attention RNN captioner, stepwise-only training (attention needs
  the previous decoder state), beam search in the word_model flavor
  (row-0 first step, done-beam counting, −1000 kill; word_model.py:209-256).
* :class:`TransformerCaptionModel` — ``TransformerModel`` (pyc-only,
  SURVEY §2.1): full-teacher-forcing transformer decoder in ONE fused pass at
  train; prefix re-feeding at inference.

Both share the encoder dict contract and the decoding API of the VAE models.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, MAX_LENGTH, PAD_IDX, START_IDX
from acvae_tpu.decoding.beam import BeamConfig, batched_beam_search
from acvae_tpu.decoding.sampling import sample_next_word
from acvae_tpu.models.common import scan_or_init
from acvae_tpu.models.vae import _check_decode_method, _repeat_beams
from acvae_tpu.ops.masked import length_mask


class AttnCaptionModel(nn.Module):
    """Seq2SeqAttnModel (attn_model.py:49-126).

    seq_output_size enables the CaptionSentenceModel head
    (word_model.py:409-438): mean-pooled decoder hiddens projected to the
    sentence-embedding size, returned as ``seq_outputs`` for the
    sentence-regression loss (run_sentence.py:208-220)."""
    encoder: nn.Module
    decoder: nn.Module  # RNNBahdanauAttnDecoder
    max_length: int = MAX_LENGTH
    seq_output_size: Optional[int] = None

    pad_idx = PAD_IDX
    start_idx = START_IDX
    end_idx = END_IDX

    def setup(self):
        if self.encoder.embed_size != self.decoder.embed_size:
            self.ln = nn.Dense(self.decoder.embed_size,
                               kernel_init=nn.initializers.xavier_uniform())
        else:
            self.ln = None
        if (self.seq_output_size is not None
                and self.seq_output_size != self.decoder.hidden_size):
            self.output_transform = nn.Dense(
                self.seq_output_size,
                kernel_init=nn.initializers.kaiming_uniform())
        else:
            self.output_transform = None

    def encode(self, feats, feat_lens, train=False):
        encoded = self.encoder(feats, feat_lens, train=train)
        if self.ln is not None:
            encoded = dict(encoded)
            encoded["audio_embeds"] = self.ln(encoded["audio_embeds"])
        return encoded

    def __call__(self, feats, feat_lens, caps=None, cap_lens=None, **kwargs):
        if caps is not None:
            return self.train_forward(feats, feat_lens, caps, cap_lens, **kwargs)
        return self.inference_forward(feats, feat_lens, **kwargs)

    def _ctx(self, encoded):
        # decode-loop dtype follows the PARAM dtype (ops/amp.py bf16 mode);
        # bit-identical for the f32 default — see vae.py::_prep_ctx
        enc_mem = encoded["audio_embeds"].astype(self.decoder.state_dtype())
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        return enc_mem, enc_mask, self.decoder.project_enc(enc_mem)

    def train_forward(self, feats, feat_lens, caps, cap_lens,
                      ss_ratio: float = 1.0, train: bool = True, **_):
        N, L = caps.shape
        T = L - 1
        encoded = self.encode(feats, feat_lens, train)
        enc_mem, enc_mask, d_proj = self._ctx(encoded)
        key = self.make_rng("sample")
        k_coin, k_samp = jax.random.split(key)
        ss_coins = jax.random.uniform(k_coin, (T,)) < ss_ratio
        samp_keys = jax.random.split(k_samp, T)

        def step(carry, xs):
            dec_h, prev_word = carry
            teacher, ss_coin, key_t = xs
            word = jnp.where(ss_coin, teacher, prev_word)
            d = self.decoder.step(word, dec_h, enc_mem, d_proj, enc_mask,
                                  train=train)
            w_t, lp_t = sample_next_word(d["logits"], key_t, "greedy")
            return (d["state"], w_t), {
                "logits": d["logits"], "output": d["output"], "seqs": w_t,
                "sampled_logprobs": lp_t}

        carry0 = (self.decoder.init_state(N, self.decoder.state_dtype()),
                  jnp.full((N,), self.start_idx, jnp.int32))
        xs = (jnp.moveaxis(caps[:, :T], 0, 1), ss_coins, samp_keys)
        _, ys = scan_or_init(self, step, carry0, xs, T)
        out = {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}
        if self.seq_output_size is not None:
            # CaptionSentenceModel.train_process (word_model.py:421-427)
            from acvae_tpu.ops.masked import mean_with_lens
            seq = mean_with_lens(out["output"], cap_lens - 1)
            if self.output_transform is not None:
                seq = self.output_transform(seq)
            out["seq_outputs"] = seq
        return out

    def inference_forward(self, feats, feat_lens, decode_method: str = "greedy",
                          max_length: Optional[int] = None, beam_size: int = 3,
                          temp: float = 1.0, train: bool = False, **kwargs):
        _check_decode_method("AttnCaptionModel", decode_method)
        max_length = max_length or self.max_length
        encoded = self.encode(feats, feat_lens, train)
        if decode_method == "beam":
            return self.beam_search(encoded, max_length, beam_size)
        if decode_method == "dbs":
            return self.diverse_beam_search(encoded, max_length, beam_size,
                                            **kwargs)
        return self.stepwise_decode(encoded, decode_method, max_length, temp)

    def stepwise_decode(self, encoded, decode_method, max_length, temp=1.0):
        enc_mem, enc_mask, d_proj = self._ctx(encoded)
        N = enc_mem.shape[0]
        samp_keys = jax.random.split(self.make_rng("sample"), max_length)

        def step(carry, key_t):
            dec_h, prev_word, finished = carry
            d = self.decoder.step(prev_word, dec_h, enc_mem, d_proj, enc_mask,
                                  train=False)
            w_t, lp_t = sample_next_word(d["logits"], key_t, decode_method, temp)
            w_t = jnp.where(finished, self.end_idx, w_t)
            finished = finished | (w_t == self.end_idx)
            return (d["state"], w_t, finished), {
                "logits": d["logits"], "output": d["output"], "seqs": w_t,
                "sampled_logprobs": lp_t}

        carry0 = (self.decoder.init_state(N, self.decoder.state_dtype()),
                  jnp.full((N,), self.start_idx, jnp.int32),
                  jnp.zeros((N,), bool))
        _, ys = scan_or_init(self, step, carry0, samp_keys, max_length)
        return {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}

    def forced_decode(self, feats, feat_lens, given_seqs):
        """Replay a sampled rollout: feed ``given_seqs`` as the word inputs
        and return the logprobs of those words (SCST replay — the reference
        wraps ANY caption model in ScstWrapper, seq_train_model.py:10-93).
        The decode here is rng-free given the words, so the replay is exact
        by construction."""
        encoded = self.encode(feats, feat_lens, train=False)
        enc_mem, enc_mask, d_proj = self._ctx(encoded)
        N, T = given_seqs.shape

        def step(carry, given_t):
            dec_h, prev_word = carry
            d = self.decoder.step(prev_word, dec_h, enc_mem, d_proj,
                                  enc_mask, train=False)
            logprobs = jax.nn.log_softmax(
                d["logits"].astype(jnp.float32), axis=-1)
            lp_t = jnp.take_along_axis(logprobs, given_t[:, None], -1)[:, 0]
            return (d["state"], given_t), {"sampled_logprobs": lp_t}

        carry0 = (self.decoder.init_state(N, self.decoder.state_dtype()),
                  jnp.full((N,), self.start_idx, jnp.int32))
        _, ys = scan_or_init(self, step, carry0,
                             jnp.moveaxis(given_seqs, 0, 1), T)
        return {"sampled_logprobs": jnp.moveaxis(ys["sampled_logprobs"], 0, 1),
                "seqs": given_seqs}

    def decode_ctx(self, encoded):
        return self._ctx(encoded)

    def init_decode_state(self, batch: int):
        return self.decoder.init_state(batch, self.decoder.state_dtype())

    def decode_step_api(self, ctx, state, words, eps_t=None):
        """One decode step driven from outside (decoding.ensemble)."""
        enc_mem, enc_mask, d_proj = ctx
        d = self.decoder.step(words, state, enc_mem, d_proj, enc_mask,
                              train=False)
        return d["logits"], d["state"]

    def beam_search(self, encoded, max_length, beam_size):
        """word_model-flavor beam (word_model.py:209-256): row-0 first step,
        end handling with done counting and freeze."""
        enc_mem, enc_mask, d_proj = self._ctx(encoded)
        N, B = enc_mem.shape[0], beam_size
        # attention memories stay [N, S, ·]; AdditiveAttention folds the
        # beam axis from the [N*B] queries (models/attention.py)

        def step_fn(state, words, t):
            d = self.decoder.step(words, state, enc_mem, d_proj,
                                  enc_mask, train=False)
            return d["logits"], d["state"]

        init_state = self.decoder.init_state(N * B, self.decoder.state_dtype())
        if self.is_initializing():
            step_fn(init_state, jnp.full((N * B,), self.start_idx, jnp.int32), 0)
            return {"seqs": jnp.full((N, B, max_length), self.end_idx, jnp.int32),
                    "scores": jnp.zeros((N, B))}
        cfg = BeamConfig(beam_size=B, max_length=max_length,
                         start_idx=self.start_idx, end_idx=self.end_idx,
                         first_step_row0=True, end_handling=True)
        return batched_beam_search(step_fn, init_state, N, cfg)

    def diverse_beam_search(self, encoded, max_length: int, beam_size: int,
                            group_size: int = 5, diversity_lambda: float = 0.5,
                            temperature: float = 1.0,
                            group_nbest: bool = True):
        """DBS for the plain attention captioner.

        The reference's ``Seq2SeqAttnModel`` never implements the base-class
        DBS hooks (``prepare_dbs_decoder_input``/``dbs_step`` raise
        NotImplementedError, word_model.py:395-409; attn_model.py defines
        none) — ``--method=dbs`` on it crashes.  Here the shared engine
        (decoding/dbs.py, exact word_model.py:297-394 semantics) runs over
        the decoder's deterministic step fn, making DBS a working capability
        on this family.  Documented in COVERAGE.md "Known divergences"."""
        from acvae_tpu.decoding.dbs import (DBSConfig, dbs_bdash,
                                            diverse_beam_search)

        enc_mem, enc_mask, d_proj = self._ctx(encoded)
        N = enc_mem.shape[0]
        bdash = dbs_bdash(beam_size, group_size)
        NB = N * bdash
        dt = self.decoder.state_dtype()

        def make_step_fn(g):
            def step_fn(state, words, t):
                d = self.decoder.step(words, state, enc_mem, d_proj,
                                      enc_mask, train=False)
                return d["logits"], d["state"]
            return step_fn

        def make_init_state():
            return self.decoder.init_state(NB, dt)

        if self.is_initializing():
            make_step_fn(0)(make_init_state(),
                            jnp.full((NB,), self.start_idx, jnp.int32), 0)
            out_beams = beam_size if group_nbest else group_size
            return {"seqs": jnp.full((N, out_beams, max_length),
                                     self.end_idx, jnp.int32)}
        cfg = DBSConfig(beam_size=beam_size, group_size=group_size,
                        max_length=max_length,
                        diversity_lambda=diversity_lambda,
                        temperature=temperature, group_nbest=group_nbest,
                        start_idx=self.start_idx, end_idx=self.end_idx)
        return diverse_beam_search(make_step_fn, make_init_state, N, cfg)


class TransformerCaptionModel(nn.Module):
    """TransformerModel (pyc-only reconstruction, SURVEY §2.1): the decoder
    consumes the whole teacher-forced caption in one fused pass at train;
    sampling re-feeds the growing prefix."""
    encoder: nn.Module
    decoder: nn.Module  # TransformerDecoder
    max_length: int = MAX_LENGTH

    pad_idx = PAD_IDX
    start_idx = START_IDX
    end_idx = END_IDX

    def setup(self):
        if self.encoder.embed_size != self.decoder.embed_size:
            self.ln = nn.Dense(self.decoder.embed_size,
                               kernel_init=nn.initializers.xavier_uniform())
        else:
            self.ln = None

    def encode(self, feats, feat_lens, train=False):
        encoded = self.encoder(feats, feat_lens, train=train)
        if self.ln is not None:
            encoded = dict(encoded)
            encoded["audio_embeds"] = self.ln(encoded["audio_embeds"])
        return encoded

    def __call__(self, feats, feat_lens, caps=None, cap_lens=None, **kwargs):
        if caps is not None:
            return self.train_forward(feats, feat_lens, caps, cap_lens, **kwargs)
        return self.inference_forward(feats, feat_lens, **kwargs)

    def train_forward(self, feats, feat_lens, caps, cap_lens,
                      train: bool = True, **_):
        """One fused decoder pass: input caps[:, :-1], predict caps[:, 1:]."""
        encoded = self.encode(feats, feat_lens, train)
        words = caps[:, :-1]
        pad_mask = ~length_mask(cap_lens - 1, words.shape[1])  # True = padded
        out = self.decoder(words, encoded["audio_embeds"],
                           encoded["audio_embeds_lens"], pad_mask, train=train)
        return {"logits": out["logits"], "output": out["output"]}

    def inference_forward(self, feats, feat_lens, decode_method: str = "greedy",
                          max_length: Optional[int] = None, beam_size: int = 3,
                          temp: float = 1.0, train: bool = False, **kwargs):
        _check_decode_method("TransformerCaptionModel", decode_method)
        max_length = max_length or self.max_length
        encoded = self.encode(feats, feat_lens, train)
        if decode_method == "beam":
            return self.beam_search(encoded, max_length, beam_size)
        if decode_method == "dbs":
            return self.diverse_beam_search(encoded, max_length, beam_size,
                                            **kwargs)
        return self.stepwise_decode(encoded, decode_method, max_length, temp)

    def _prefix_logits(self, words_buf, t, encoded, train=False):
        """Run the decoder on the fixed-size prefix buffer; positions > t are
        masked as padding; return logits at position t."""
        T = words_buf.shape[1]
        pad_mask = jnp.arange(T)[None, :] > t  # True = padded
        out = self.decoder(words_buf, encoded["audio_embeds"],
                           encoded["audio_embeds_lens"],
                           jnp.broadcast_to(pad_mask, words_buf.shape),
                           train=train)
        return out["logits"][:, t], out["output"][:, t]

    def forced_decode(self, feats, feat_lens, given_seqs):
        """SCST replay in one fused causal pass: input [<start>, given[:-1]],
        score ``given_seqs`` at every position.  Equivalent to the stepwise
        rollout's per-position logits because the decoder is causal (the
        stepwise path only adds a padding mask over future positions, which
        the causal mask already enforces)."""
        encoded = self.encode(feats, feat_lens, train=False)
        N, T = given_seqs.shape
        words = jnp.concatenate(
            [jnp.full((N, 1), self.start_idx, jnp.int32),
             given_seqs[:, :-1]], axis=1)
        pad_mask = jnp.zeros_like(words, bool)
        out = self.decoder(words, encoded["audio_embeds"],
                           encoded["audio_embeds_lens"], pad_mask,
                           train=False)
        logprobs = jax.nn.log_softmax(
            out["logits"].astype(jnp.float32), axis=-1)
        lp = jnp.take_along_axis(logprobs, given_seqs[..., None], -1)[..., 0]
        return {"sampled_logprobs": lp, "seqs": given_seqs}

    def stepwise_decode(self, encoded, decode_method, max_length, temp=1.0):
        N = encoded["audio_embeds"].shape[0]
        samp_keys = jax.random.split(self.make_rng("sample"), max_length)

        def step(carry, xs):
            words_buf, finished = carry
            t, key_t = xs
            logits_t, out_t = self._prefix_logits(words_buf, t, encoded)
            w_t, lp_t = sample_next_word(logits_t, key_t, decode_method, temp)
            w_t = jnp.where(finished, self.end_idx, w_t)
            finished = finished | (w_t == self.end_idx)
            # shift the sampled word in as the next prefix token
            words_buf = jax.lax.dynamic_update_slice(
                words_buf, w_t[:, None], (0, t + 1))
            return (words_buf, finished), {
                "logits": logits_t, "output": out_t, "seqs": w_t,
                "sampled_logprobs": lp_t}

        words_buf = jnp.full((N, max_length + 1), self.start_idx, jnp.int32)
        carry0 = (words_buf, jnp.zeros((N,), bool))
        xs = (jnp.arange(max_length), samp_keys)
        _, ys = scan_or_init(self, step, carry0, xs, max_length)
        return {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}

    def beam_search(self, encoded, max_length, beam_size):
        N, B = encoded["audio_embeds"].shape[0], beam_size
        enc_r = _repeat_beams(
            {"audio_embeds": encoded["audio_embeds"],
             "audio_embeds_lens": encoded["audio_embeds_lens"]}, B)

        def step_fn(state, words, t):
            words_buf = state
            words_buf = jnp.where(
                (jnp.arange(words_buf.shape[1]) == t)[None, :],
                words[:, None], words_buf)
            logits_t, _ = self._prefix_logits(words_buf, t, enc_r)
            return logits_t, words_buf

        init_state = jnp.full((N * B, max_length + 1), self.start_idx, jnp.int32)
        if self.is_initializing():
            step_fn(init_state, jnp.full((N * B,), self.start_idx, jnp.int32), 0)
            return {"seqs": jnp.full((N, B, max_length), self.end_idx, jnp.int32),
                    "scores": jnp.zeros((N, B))}
        cfg = BeamConfig(beam_size=B, max_length=max_length,
                         start_idx=self.start_idx, end_idx=self.end_idx,
                         first_step_row0=True, end_handling=True)
        return batched_beam_search(step_fn, init_state, N, cfg)

    def diverse_beam_search(self, encoded, max_length: int, beam_size: int,
                            group_size: int = 5, diversity_lambda: float = 0.5,
                            temperature: float = 1.0,
                            group_nbest: bool = True):
        """DBS over the prefix-re-feeding decoder (like the reference's
        pyc-only ``TransformerModel``, which has no DBS hooks either —
        capability superset, see AttnCaptionModel.diverse_beam_search).
        Group g at global step t decodes its *local* position ``t − g``; the
        beam-parent gather permutes whole prefix buffers."""
        from acvae_tpu.decoding.dbs import (DBSConfig, dbs_bdash,
                                            diverse_beam_search)

        N = encoded["audio_embeds"].shape[0]
        bdash = dbs_bdash(beam_size, group_size)
        NB = N * bdash
        enc_r = _repeat_beams(
            {"audio_embeds": encoded["audio_embeds"],
             "audio_embeds_lens": encoded["audio_embeds_lens"]}, bdash)

        def make_step_fn(g):
            def step_fn(state, words, t):
                words_buf = state
                lt = jnp.clip(t - g, 0, max_length - 1)
                words_buf = jnp.where(
                    (jnp.arange(words_buf.shape[1]) == lt)[None, :],
                    words[:, None], words_buf)
                logits_t, _ = self._prefix_logits(words_buf, lt, enc_r)
                return logits_t, words_buf
            return step_fn

        def make_init_state():
            return jnp.full((NB, max_length + 1), self.start_idx, jnp.int32)

        if self.is_initializing():
            make_step_fn(0)(make_init_state(),
                            jnp.full((NB,), self.start_idx, jnp.int32), 0)
            out_beams = beam_size if group_nbest else group_size
            return {"seqs": jnp.full((N, out_beams, max_length),
                                     self.end_idx, jnp.int32)}
        cfg = DBSConfig(beam_size=beam_size, group_size=group_size,
                        max_length=max_length,
                        diversity_lambda=diversity_lambda,
                        temperature=temperature, group_nbest=group_nbest,
                        start_idx=self.start_idx, end_idx=self.end_idx)
        return diverse_beam_search(make_step_fn, make_init_state, N, cfg)
