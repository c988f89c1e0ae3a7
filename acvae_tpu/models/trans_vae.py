"""Transformer-decoder AC-VAE (``TransVAEModel``).

Reconstruction of the pyc-only ``models/transformer_vae_model.py``
(SURVEY §2.1): ``class TransVAEModel(VAEModel)`` overriding
``prepare_decoder_input`` / ``decode_step`` to feed the *accumulated* word
prefix and per-position latents into a :class:`VAETransformerDecoder` —
the latents are appended to the cross-attention memory
(``models/decoder.py:310-325``), and only the last position's logits are used
each step.

TPU design: the growing prefix becomes fixed-size word/z buffers updated with
``dynamic_update_slice`` inside the decode scan; padding masks expose only
positions ≤ t.  The AR prior (PriorRNN) is carried exactly as in the RNN VAE.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, MAX_LENGTH, PAD_IDX, START_IDX
from acvae_tpu.decoding.beam import BeamConfig, batched_beam_search
from acvae_tpu.decoding.sampling import sample_next_word
from acvae_tpu.models.common import scan_or_init, eps_stack
from acvae_tpu.models.vae import _repeat_beams
from acvae_tpu.ops.masked import length_mask


class TransVAECaptionModel(nn.Module):
    """TransVAEModel: per-timestep latent VAE with a transformer decoder."""
    encoder: nn.Module
    decoder: nn.Module  # VAETransformerDecoder
    qnet: nn.Module
    pnet: nn.Module
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

    def _decoder_logits(self, words_buf, z_buf, t, encoded, train):
        """Decode the prefix ≤ t; return (logits, output) at position t."""
        T = words_buf.shape[1]
        pad_mask = jnp.broadcast_to(jnp.arange(T)[None, :] > t,
                                    words_buf.shape)  # True = padded
        out = self.decoder(words_buf, encoded["audio_embeds"],
                           encoded["audio_embeds_lens"], pad_mask, z_buf,
                           train=train, last_only=False)
        return out["logits"][:, t], out["output"][:, t]

    def train_forward(self, feats, feat_lens, caps, cap_lens,
                      ss_ratio: float = 1.0, dis_ratio: float = 0.0,
                      train: bool = True) -> Dict[str, Any]:
        N, L = caps.shape
        T = L - 1
        E = self.decoder.embed_size
        dt = self.pnet.state_dtype()  # param dtype (ops/amp.py bf16 mode)
        encoded = self.encode(feats, feat_lens, train)
        encoded = dict(encoded)
        encoded["audio_embeds"] = encoded["audio_embeds"].astype(dt)
        enc_mem = encoded["audio_embeds"]
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        p_proj = self.pnet.project_enc(enc_mem)

        key = self.make_rng("sample")
        k_q, k_p, k_c1, k_c2, k_s = jax.random.split(key, 5)
        qnetout = self.qnet(caps, cap_lens,
                            jax.random.normal(k_q, (N, T, E)).astype(dt))
        ss_coins = jax.random.uniform(k_c1, (T,)) < ss_ratio
        dis_coins = ((jax.random.uniform(k_c2, (T,)) <= dis_ratio)
                     & (jnp.asarray(dis_ratio) > 0))
        eps_p = eps_stack(k_p, T, N, E, dt)
        samp_keys = jax.random.split(k_s, T)

        def step(carry, xs):
            p_state, last_z, words_buf, z_buf, prev_word = carry
            t, teacher, q_z_t, eps_t, ss_coin, dis_coin, key_t = xs
            word = jnp.where(ss_coin, teacher, prev_word)
            p = self.pnet.step(word, enc_mem, p_proj, enc_mask, p_state,
                               last_z, eps_t)
            z = jnp.where(dis_coin, p["z"], q_z_t)
            words_buf = jax.lax.dynamic_update_slice(words_buf, word[:, None],
                                                     (0, t))
            z_buf = jax.lax.dynamic_update_slice(z_buf, z[:, None, :],
                                                 (0, t, 0))
            logits_t, out_t = self._decoder_logits(words_buf, z_buf, t,
                                                   encoded, train)
            w_t, lp_t = sample_next_word(logits_t, key_t, "greedy")
            carry = (p["state"], p["z"], words_buf, z_buf, w_t)
            ys = {"logits": logits_t, "output": out_t, "p_means": p["mean"],
                  "p_logs": p["log"], "p_z": p["z"], "seqs": w_t,
                  "sampled_logprobs": lp_t}
            return carry, ys

        carry0 = (self.pnet.init_state(N, dt), jnp.zeros((N, E), dt),
                  jnp.full((N, T), self.start_idx, jnp.int32),
                  jnp.zeros((N, T, E), dt),
                  jnp.full((N,), self.start_idx, jnp.int32))
        xs = (jnp.arange(T), jnp.moveaxis(caps[:, :T], 0, 1),
              jnp.moveaxis(qnetout["q_z"], 0, 1), eps_p, ss_coins, dis_coins,
              samp_keys)
        _, ys = scan_or_init(self, step, carry0, xs, T)
        output = {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}
        if output["p_means"].ndim == 4:
            # GMM prior (pnet.gmm_kernel path): per-step moments are
            # [K, N, E], so the scan+moveaxis above yields [K, T, N, E];
            # re-layout to the [K, N, T, E] the trainer's gmm_kl_loss
            # expects and surface the mixture logits (same handling as
            # models/vae.py::VAECaptionModel.train_forward).
            output["p_means"] = jnp.moveaxis(output["p_means"], 1, 2)
            output["p_logs"] = jnp.moveaxis(output["p_logs"], 1, 2)
            output["p_mixture_logits"] = self.pnet.mixture_logits
        output.update({k: v for k, v in qnetout.items() if v is not None})
        return output

    def inference_forward(self, feats, feat_lens, decode_method: str = "greedy",
                          max_length: Optional[int] = None, beam_size: int = 3,
                          temp: float = 1.0, train: bool = False, **kwargs):
        from acvae_tpu.models.vae import _check_decode_method
        _check_decode_method("TransVAECaptionModel", decode_method,
                             ("greedy", "gumbel", "sample", "beam", "dbs"))
        max_length = max_length or self.max_length
        encoded = self.encode(feats, feat_lens, train)
        if decode_method == "beam":
            return self.beam_search(encoded, max_length, beam_size)
        if decode_method == "dbs":
            # beyond-parity (round 4): the reference's TransVAEModel
            # bytecode has no DBS hooks at all — this composes the batched
            # DBS engine (word_model.py:297-394 semantics) with the
            # transformer's prefix/z buffers, completing the
            # decode-method × family matrix
            return self.diverse_beam_search(encoded, max_length, beam_size,
                                            **kwargs)
        return self.stepwise_decode(encoded, decode_method, max_length, temp)

    def diverse_beam_search(self, encoded, max_length: int, beam_size: int,
                            group_size: int = 5, diversity_lambda: float = 0.5,
                            temperature: float = 1.0,
                            group_nbest: bool = True) -> Dict[str, Any]:
        """DBS over the transformer decoder.  The engine staggers group g by
        g global steps (decoding/dbs.py), so the prefix/z buffers — which
        the RNN families don't need — are written at the group's LOCAL
        position ``lt = t − g`` (positional encodings must see the prefix
        at 0..lt, not shifted by the stagger); each group closes over its
        own g and its own prior-eps stream."""
        from acvae_tpu.decoding.dbs import (DBSConfig, dbs_bdash,
                                            diverse_beam_search)

        dt = self.pnet.state_dtype()
        enc_mem = encoded["audio_embeds"].astype(dt)
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        p_proj = self.pnet.project_enc(enc_mem)
        N, E = enc_mem.shape[0], self.decoder.embed_size
        bdash = dbs_bdash(beam_size, group_size)
        NB = N * bdash
        T = max_length
        enc_mem_r, lens_r = _repeat_beams(
            (enc_mem, encoded["audio_embeds_lens"]), bdash)
        enc_r = {"audio_embeds": enc_mem_r, "audio_embeds_lens": lens_r}
        total_steps = T + group_size - 1
        eps_p = jax.vmap(lambda k: eps_stack(k, total_steps, NB, E, dt))(
            jax.random.split(self.make_rng("sample"), group_size))

        def make_step_fn(g):
            def step_fn(state, words, t):
                p_state, last_z, words_buf, z_buf = state
                lt = jnp.clip(t - g, 0, T - 1)  # local prefix position
                p = self.pnet.step(words, enc_mem, p_proj, enc_mask,
                                   p_state, last_z, eps_p[g, t])
                words_buf = jnp.where(
                    (jnp.arange(T) == lt)[None, :], words[:, None], words_buf)
                z_buf = jnp.where(
                    (jnp.arange(T) == lt)[None, :, None],
                    p["z"][:, None, :], z_buf)
                logits_t, _ = self._decoder_logits(words_buf, z_buf, lt,
                                                   enc_r, False)
                return logits_t, (p["state"], p["z"], words_buf, z_buf)
            return step_fn

        def make_init_state():
            return (self.pnet.init_state(NB, dt), jnp.zeros((NB, E), dt),
                    jnp.full((NB, T), self.start_idx, jnp.int32),
                    jnp.zeros((NB, T, E), dt))

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

    def stepwise_decode(self, encoded, decode_method, max_length, temp=1.0):
        dt = self.pnet.state_dtype()
        encoded = dict(encoded)
        encoded["audio_embeds"] = encoded["audio_embeds"].astype(dt)
        enc_mem = encoded["audio_embeds"]
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        p_proj = self.pnet.project_enc(enc_mem)
        N, E, T = enc_mem.shape[0], self.decoder.embed_size, max_length
        key = self.make_rng("sample")
        k_p, k_s = jax.random.split(key)
        eps_p = eps_stack(k_p, T, N, E, dt)
        samp_keys = jax.random.split(k_s, T)

        def step(carry, xs):
            p_state, last_z, words_buf, z_buf, prev_word, finished = carry
            t, eps_t, key_t = xs
            p = self.pnet.step(prev_word, enc_mem, p_proj, enc_mask, p_state,
                               last_z, eps_t)
            words_buf = jax.lax.dynamic_update_slice(
                words_buf, prev_word[:, None], (0, t))
            z_buf = jax.lax.dynamic_update_slice(z_buf, p["z"][:, None, :],
                                                 (0, t, 0))
            logits_t, out_t = self._decoder_logits(words_buf, z_buf, t,
                                                   encoded, False)
            w_t, lp_t = sample_next_word(logits_t, key_t, decode_method, temp)
            w_t = jnp.where(finished, self.end_idx, w_t)
            finished = finished | (w_t == self.end_idx)
            carry = (p["state"], p["z"], words_buf, z_buf, w_t, finished)
            ys = {"logits": logits_t, "output": out_t, "p_means": p["mean"],
                  "p_logs": p["log"], "p_z": p["z"], "seqs": w_t,
                  "sampled_logprobs": lp_t}
            return carry, ys

        carry0 = (self.pnet.init_state(N, dt), jnp.zeros((N, E), dt),
                  jnp.full((N, T), self.start_idx, jnp.int32),
                  jnp.zeros((N, T, E), dt),
                  jnp.full((N,), self.start_idx, jnp.int32),
                  jnp.zeros((N,), bool))
        xs = (jnp.arange(T), eps_p, samp_keys)
        _, ys = scan_or_init(self, step, carry0, xs, T)
        return {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}

    def forced_decode(self, feats, feat_lens, given_seqs):
        """SCST replay: feed ``given_seqs`` as the word inputs and return
        their logprobs.  Consumes the "sample" rng stream identically to
        :meth:`stepwise_decode` (same split → same prior eps), so replaying
        with the rollout's key reproduces the rollout computation exactly
        (same contract as models/vae.py::VAECaptionModel.forced_decode)."""
        dt = self.pnet.state_dtype()
        encoded = dict(self.encode(feats, feat_lens, False))
        encoded["audio_embeds"] = encoded["audio_embeds"].astype(dt)
        enc_mem = encoded["audio_embeds"]
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        p_proj = self.pnet.project_enc(enc_mem)
        N, T = given_seqs.shape
        E = self.decoder.embed_size
        key = self.make_rng("sample")
        k_p, _k_s = jax.random.split(key)   # mirror stepwise_decode
        eps_p = eps_stack(k_p, T, N, E, dt)

        def step(carry, xs):
            p_state, last_z, words_buf, z_buf, prev_word = carry
            t, eps_t, given_t = xs
            p = self.pnet.step(prev_word, enc_mem, p_proj, enc_mask, p_state,
                               last_z, eps_t)
            words_buf = jax.lax.dynamic_update_slice(
                words_buf, prev_word[:, None], (0, t))
            z_buf = jax.lax.dynamic_update_slice(z_buf, p["z"][:, None, :],
                                                 (0, t, 0))
            logits_t, _ = self._decoder_logits(words_buf, z_buf, t,
                                               encoded, False)
            logprobs = jax.nn.log_softmax(
                logits_t.astype(jnp.float32), axis=-1)
            lp_t = jnp.take_along_axis(logprobs, given_t[:, None], -1)[:, 0]
            carry = (p["state"], p["z"], words_buf, z_buf, given_t)
            return carry, {"sampled_logprobs": lp_t}

        carry0 = (self.pnet.init_state(N, dt), jnp.zeros((N, E), dt),
                  jnp.full((N, T), self.start_idx, jnp.int32),
                  jnp.zeros((N, T, E), dt),
                  jnp.full((N,), self.start_idx, jnp.int32))
        xs = (jnp.arange(T), eps_p, jnp.moveaxis(given_seqs, 0, 1))
        _, ys = scan_or_init(self, step, carry0, xs, T)
        return {"sampled_logprobs": jnp.moveaxis(ys["sampled_logprobs"], 0, 1),
                "seqs": given_seqs}

    def beam_search(self, encoded, max_length, beam_size):
        """VAE-flavor beam (flat top-k from t=0, no end handling) with the
        prefix/z buffers carried per beam."""
        dt = self.pnet.state_dtype()
        enc_mem = encoded["audio_embeds"].astype(dt)
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        p_proj = self.pnet.project_enc(enc_mem)
        N, B, E = enc_mem.shape[0], beam_size, self.decoder.embed_size
        # only the transformer decoder's cross-attention needs replicated
        # memory; the prior net's AdditiveAttention folds the beam axis
        # from the [N*B] queries (models/attention.py)
        enc_mem_r, lens_r = _repeat_beams(
            (enc_mem, encoded["audio_embeds_lens"]), B)
        enc_r = {"audio_embeds": enc_mem_r, "audio_embeds_lens": lens_r}
        eps_p = eps_stack(self.make_rng("sample"), max_length, N * B, E, dt)

        def step_fn(state, words, t):
            p_state, last_z, words_buf, z_buf = state
            p = self.pnet.step(words, enc_mem, p_proj, enc_mask,
                               p_state, last_z, eps_p[t])
            words_buf = jnp.where(
                (jnp.arange(words_buf.shape[1]) == t)[None, :],
                words[:, None], words_buf)
            z_buf = jnp.where(
                (jnp.arange(z_buf.shape[1]) == t)[None, :, None],
                p["z"][:, None, :], z_buf)
            logits_t, _ = self._decoder_logits(words_buf, z_buf, t, enc_r,
                                               False)
            return logits_t, (p["state"], p["z"], words_buf, z_buf)

        init_state = (self.pnet.init_state(N * B, dt),
                      jnp.zeros((N * B, E), dt),
                      jnp.full((N * B, max_length), self.start_idx, jnp.int32),
                      jnp.zeros((N * B, max_length, E), dt))
        if self.is_initializing():
            step_fn(init_state, jnp.full((N * B,), self.start_idx, jnp.int32), 0)
            return {"seqs": jnp.full((N, B, max_length), self.end_idx, jnp.int32),
                    "scores": jnp.zeros((N, B))}
        cfg = BeamConfig(beam_size=B, max_length=max_length,
                         start_idx=self.start_idx, end_idx=self.end_idx,
                         first_step_row0=False, end_handling=False)
        return batched_beam_search(step_fn, init_state, N, cfg)
