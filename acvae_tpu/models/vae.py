"""AC-VAE caption models — per-timestep latent-word VAE with AR prior.

TPU-native re-design of ``models/vae_model.py``:

* :class:`VAECaptionModel` — covers the reference's ``VAEModel``
  (:12-364) and ``Hybrid_VAEModel`` (:674-1048, ``global_constraint=True``).
  The reference's per-timestep python decode loop (``stepwise_forward`` →
  ``decode_step``, :34-55,116-139) becomes a single ``lax.scan`` whose carry
  is (decoder GRU state, prior LSTM state, z_{t-1}, previous word); the
  scheduled-sampling and dis-ratio coin flips (:128,149) become precomputed
  per-step Bernoulli draws threaded through the scan as xs.
* :class:`SimpleVAECaptionModel` — the ``SimpleVAEModel`` ablation (:366-672):
  one global latent z, fixed N(0, e^{0.5·0.5}) prior at train (:488-495).

Randomness: methods use the ``"sample"`` rng stream (pass
``rngs={"sample": key}`` to ``apply``; dropout additionally needs
``"dropout"`` when ``train=True``).

Reference quirks preserved: the coin flips are drawn once per *timestep* (not
per sample), matching ``random.random()`` / ``torch.rand(1)`` semantics; the
carried ``last_z`` is always the **prior** sample even when the decoder was
fed the posterior one (vae_model.py:192); beam search draws a fresh prior z
per beam and uses flat top-k from step 0 with no end handling
(vae_model.py:220-252).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, MAX_LENGTH, PAD_IDX, START_IDX
from acvae_tpu.decoding.beam import BeamConfig, batched_beam_search
from acvae_tpu.models.common import scan_or_init, eps_stack
from acvae_tpu.decoding.sampling import sample_next_word
from acvae_tpu.ops.masked import length_mask, max_with_lens, mean_with_lens


def _repeat_beams(tree, beam_size: int):
    """[N, ...] -> [N*B, ...] with each row repeated B times (beam replication,
    vae_model.py:277-283)."""
    return jax.tree_util.tree_map(
        lambda a: jnp.repeat(a, beam_size, axis=0), tree)


_DECODE_METHODS = ("greedy", "gumbel", "sample", "beam", "dbs")


def _check_decode_method(family: str, method: str,
                         supported=_DECODE_METHODS) -> None:
    """Fail fast with the family name instead of erroring deep inside a scan
    trace (``decoding/sampling.py``) on an unknown ``--decode_method``."""
    if method not in supported:
        raise ValueError(
            f"{family} does not support decode_method={method!r}; "
            f"supported: {', '.join(supported)}")


class VAECaptionModel(nn.Module):
    """VAEModel / Hybrid_VAEModel (models/vae_model.py:12-364, 674-1048)."""
    encoder: nn.Module
    decoder: nn.Module
    qnet: nn.Module
    pnet: nn.Module
    global_constraint: bool = False      # Hybrid_VAEModel's utterance head
    max_length: int = MAX_LENGTH

    pad_idx = PAD_IDX
    start_idx = START_IDX
    end_idx = END_IDX

    def setup(self):
        if self.encoder.embed_size != self.decoder.embed_size:
            self.ln = nn.Dense(self.decoder.embed_size, use_bias=True,
                               kernel_init=nn.initializers.xavier_uniform())
        else:
            self.ln = None
        if self.global_constraint:
            # Hybrid_VAEModel.mean_log_out (vae_model.py:693): E -> 2E over
            # mean+max pooled decoder hiddens.
            self.mean_log_out = nn.Dense(2 * self.decoder.embed_size,
                                         kernel_init=nn.initializers.xavier_uniform())

    # ------------------------------------------------------------------ #
    # encoding
    # ------------------------------------------------------------------ #
    def encode(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
               train: bool = False) -> Dict[str, jnp.ndarray]:
        encoded = self.encoder(feats, feat_lens, train=train)
        if self.ln is not None:
            encoded = dict(encoded)
            # keep the raw (encoder-dim) embeds too: the adversarial
            # discriminator was trained on them, not on the decoder-dim
            # projection
            encoded["audio_embeds_raw"] = encoded["audio_embeds"]
            encoded["audio_embeds"] = self.ln(encoded["audio_embeds"])
        return encoded

    # ------------------------------------------------------------------ #
    # shared per-step compute
    # ------------------------------------------------------------------ #
    def _prep_ctx(self, encoded):
        # enc_mem joins the decode loop's dtype (= the PARAM dtype,
        # ops/amp.py).  Bit-identical in the default f32 mode: a bf16
        # encoder output upcasts exactly, and the f32 attention projections
        # already promoted every consumer to f32.
        enc_mem = encoded["audio_embeds"].astype(self.decoder.state_dtype())
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        p_proj = self.pnet.project_enc(enc_mem)
        d_proj = self.decoder.project_enc(enc_mem)
        return enc_mem, enc_mask, p_proj, d_proj

    def _step_pair(self, word, dec_h, p_state, last_z, eps_t, z_fn,
                   enc_mem, enc_mask, p_proj, d_proj, train=False):
        """One prior step + one decoder step (the serial core of every
        decode flavor, vae_model.py:116-139).  ``z_fn(p) -> z`` picks the
        decoder latent (prior sample at inference; dis-coin mix at train).

        ``ACVAE_FUSED_ATTN=1`` computes the two attention reads — both
        queries are available at step start (prior: word embedding;
        decoder: previous state) — as ONE stacked pass
        (models/attention.py ``stacked_attention_read``), halving the
        attention ops on the serial chain.  Same math; kept switchable
        until measured on-chip (docs/pallas_notes.md).

        ``ACVAE_FUSED_STEP=1`` (inference only) goes further: of the step's
        five serial matmuls, the four whose inputs exist at step start —
        prior-LSTM input [emb_p;ctx_p;last_z]·wi, prior-LSTM hidden h_p·wh,
        decoder-GRU partial input [emb_d;ctx_d]·wi, decoder-GRU hidden
        dec_h·wh — become ONE zero-padded batched MXU call; only the z rows
        of the GRU input projection (``z_input_proj``) remain on the
        z-critical path.  ~2× the matmul FLOPs (padding waste) traded for
        3 fewer serial ops — exactly the trade the slope probes say the
        op-latency-bound loop wants (docs/pallas_notes.md "decode chain").
        Implies the stacked attention read.  Accumulation is split
        differently so tokens can flip at float near-ties (like
        ACVAE_FUSED_ATTN); parity pinned by CPU tests."""
        import os
        fused_step = (os.environ.get("ACVAE_FUSED_STEP") == "1"
                      and not train
                      and hasattr(self.decoder, "step_from_gates")
                      and hasattr(self.pnet, "step_from_gates"))
        if ((fused_step or os.environ.get("ACVAE_FUSED_ATTN") == "1")
                and p_proj.shape[-1] == d_proj.shape[-1]
                and hasattr(self.pnet, "step_from_ctx")  # GMM prior: seq only
                and not self.is_initializing()):
            from acvae_tpu.models.attention import stacked_attention_read
            emb_p = self.pnet.embed(word)
            (ctx_p, w_p), (ctx_d, w_d) = stacked_attention_read(
                [p_proj, d_proj],
                [self.pnet.attn_query(emb_p), self.decoder.attn_query(dec_h)],
                [self.pnet.attn_v(), self.decoder.attn_v()],
                enc_mem, enc_mask)
            if fused_step:
                return self._fused_gate_step(word, emb_p, ctx_p, ctx_d,
                                             w_p, w_d, dec_h, p_state,
                                             last_z, eps_t, z_fn)
            p = self.pnet.step_from_ctx(emb_p, ctx_p, w_p, p_state, last_z,
                                        eps_t)
            d = self.decoder.step_from_ctx(word, dec_h, ctx_d, w_d,
                                           z_fn(p), train=train)
            return p, d
        p = self.pnet.step(word, enc_mem, p_proj, enc_mask, p_state,
                           last_z, eps_t)
        d = self.decoder.step(word, dec_h, enc_mem, d_proj, enc_mask,
                              z_fn(p), train=train)
        return p, d

    def _fused_gate_step(self, word, emb_p, ctx_p, ctx_d, w_p, w_d,
                         dec_h, p_state, last_z, eps_t, z_fn):
        """The ACVAE_FUSED_STEP matmul batching (see :meth:`_step_pair`).

        All four gate matmuls share one ``[4, N, C] @ [4, C, G]`` batched
        dot (C/G = max padded in/out dims); zero padding contributes exact
        zero partial products, so each arm's result equals its standalone
        matmul up to reduction-order float noise."""
        lstm, gru = self.pnet.network, self.decoder.cell
        x_p = jnp.concatenate([emb_p, ctx_p, last_z], axis=-1)
        emb_d = self.decoder.word_embeddings(word)
        x_d = jnp.concatenate([emb_d, ctx_d], axis=-1)
        h_p = p_state[0]

        wi_d_part = gru.wi[: x_d.shape[-1]]
        mats = ((x_p, lstm.wi), (x_d, wi_d_part),
                (h_p, lstm.wh), (dec_h, gru.wh))
        C = max(x.shape[-1] for x, _ in mats)
        G = max(w.shape[-1] for _, w in mats)

        def padx(x):
            return jnp.pad(x, ((0, 0), (0, C - x.shape[-1])))

        def padw(w):
            return jnp.pad(w, ((0, C - w.shape[0]), (0, G - w.shape[1])))

        X = jnp.stack([padx(x) for x, _ in mats])      # [4, N, C]
        W = jnp.stack([padw(w) for _, w in mats])      # [4, C, G]  (hoisted
        # out of the scan by XLA: loop-invariant, params-only)
        Y = jnp.einsum("knc,kcg->kng", X, W)
        n4h = lstm.wi.shape[-1]
        n3h = gru.wi.shape[-1]
        gi_p = Y[0][:, :n4h] + lstm.bi
        gi_d_part = Y[1][:, :n3h] + gru.bi
        gh_p = Y[2][:, :n4h] + lstm.bh
        gh_d = Y[3][:, :n3h] + gru.bh

        p = self.pnet.step_from_gates(gi_p, gh_p, w_p, p_state, eps_t)
        d = self.decoder.step_from_gates(gi_d_part, gh_d, dec_h, z_fn(p),
                                         w_d)
        return p, d

    # ------------------------------------------------------------------ #
    # training forward
    # ------------------------------------------------------------------ #
    def __call__(self, feats, feat_lens, caps=None, cap_lens=None, **kwargs):
        """Reference arity dispatch (vae_model.py:57-86): 4 args → train
        forward, 2 args → inference forward."""
        if caps is not None:
            return self.train_forward(feats, feat_lens, caps, cap_lens, **kwargs)
        return self.inference_forward(feats, feat_lens, **kwargs)

    def train_forward(self, feats, feat_lens, caps, cap_lens,
                      ss_ratio: float = 1.0, dis_ratio: float = 0.0,
                      train: bool = True) -> Dict[str, Any]:
        """Teacher-forced training pass.

        caps: [N, L] int (``<start> w_1 .. w_k <end> <pad>..``); returns per
        timestep logits/q/p statistics aligned like the reference
        (vae_model.py:88-114,173-192): T = L-1 decode steps.
        """
        N, L = caps.shape
        T = L - 1
        E = self.decoder.embed_size
        encoded = self.encode(feats, feat_lens, train)
        enc_mem, enc_mask, p_proj, d_proj = self._prep_ctx(encoded)

        # loop-state dtype follows the PARAM dtype (not enc_mem's: the
        # encoder may compute bf16 under f32 params) — a bf16-cast variables
        # tree (ops/amp.py) gets a bf16 decode loop, the default stays f32
        dt = self.decoder.state_dtype()
        key = self.make_rng("sample")
        k_q, k_p, k_coin1, k_coin2, k_samp = jax.random.split(key, 5)

        qnetout = self.qnet(caps, cap_lens,
                            jax.random.normal(k_q, (N, T, E)).astype(dt))

        ss_coins = jax.random.uniform(k_coin1, (T,)) < ss_ratio
        dis_coins = ((jax.random.uniform(k_coin2, (T,)) <= dis_ratio)
                     & (jnp.asarray(dis_ratio) > 0))
        eps_p = eps_stack(k_p, T, N, E, dt)
        samp_keys = jax.random.split(k_samp, T)

        def step(carry, xs):
            dec_h, p_state, last_z, prev_word = carry
            teacher_word, q_z_t, eps_t, ss_coin, dis_coin, key_t = xs
            word = jnp.where(ss_coin, teacher_word, prev_word)
            p, d = self._step_pair(
                word, dec_h, p_state, last_z, eps_t,
                lambda p: jnp.where(dis_coin, p["z"], q_z_t),
                enc_mem, enc_mask, p_proj, d_proj, train=train)
            w_t, lp_t = sample_next_word(d["logits"], key_t, "greedy")
            carry = (d["state"], p["state"], p["z"], w_t)
            ys = {"logits": d["logits"], "output": d["output"],
                  "p_means": p["mean"], "p_logs": p["log"], "p_z": p["z"],
                  "seqs": w_t, "sampled_logprobs": lp_t}
            return carry, ys

        carry0 = (self.decoder.init_state(N, dt),
                  self.pnet.init_state(N, dt),
                  jnp.zeros((N, E), dt),
                  jnp.full((N,), self.start_idx, jnp.int32))
        xs = (jnp.moveaxis(caps[:, :T], 0, 1), jnp.moveaxis(qnetout["q_z"], 0, 1),
              eps_p, ss_coins, dis_coins, samp_keys)
        _, ys = scan_or_init(self, step, carry0, xs, T)

        output = {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}
        if output["p_means"].ndim == 4:
            # GMM prior (pnet.gmm_kernel path): per-step moments are
            # [K, N, E], so the scan+moveaxis above yields [K, T, N, E];
            # the reference buffer layout is [K, N, T, E]
            # (vae_model.py:100-101).  Surface the mixture logits for
            # the trainer's gmm_kl_loss.
            output["p_means"] = jnp.moveaxis(output["p_means"], 1, 2)
            output["p_logs"] = jnp.moveaxis(output["p_logs"], 1, 2)
            output["p_mixture_logits"] = self.pnet.mixture_logits
        output.update({k: v for k, v in qnetout.items() if v is not None})
        # encoder memory for downstream consumers: the adversarial
        # discriminator's aud2cap branch (loss.py:308) consumes the RAW
        # encoder-dim embeds — the same feature space its aud_proj was
        # trained on (train_discriminator has no ln adapter)
        output["audio_embeds"] = encoded.get("audio_embeds_raw", enc_mem)
        output["audio_embeds_lens"] = encoded["audio_embeds_lens"]

        if self.global_constraint:
            # Hybrid_VAEModel.stepwise_forward tail (vae_model.py:722-730)
            hidden = (mean_with_lens(output["output"], cap_lens - 1)
                      + max_with_lens(output["output"], cap_lens - 1))
            output["p_means_utt"] = self.mean_log_out(hidden)
        return output

    # ------------------------------------------------------------------ #
    # inference
    # ------------------------------------------------------------------ #
    def inference_forward(self, feats, feat_lens, decode_method: str = "greedy",
                          max_length: Optional[int] = None,
                          beam_size: int = 3, temp: float = 1.0,
                          train: bool = False, **kwargs) -> Dict[str, Any]:
        encoded = self.encode(feats, feat_lens, train)
        return self.inference_from_encoded(
            encoded, decode_method=decode_method, max_length=max_length,
            beam_size=beam_size, temp=temp, **kwargs)

    def inference_from_encoded(self, encoded, decode_method: str = "greedy",
                               max_length: Optional[int] = None,
                               beam_size: int = 3, temp: float = 1.0,
                               apply_ln: bool = False,
                               **kwargs) -> Dict[str, Any]:
        """Decode from a precomputed encoder dict — lets callers swap in an
        alternative encoder implementation (e.g. the int8 serving encoder,
        ``models/quant.py``) while reusing this model's decode machinery.
        ``apply_ln=True`` runs the encoder→decoder dim adapter (for raw
        external encodings; :meth:`encode` has already applied it on the
        internal path)."""
        _check_decode_method("VAECaptionModel", decode_method)
        max_length = max_length or self.max_length
        if apply_ln and self.ln is not None:
            encoded = dict(encoded)
            encoded["audio_embeds"] = self.ln(encoded["audio_embeds"])
        if decode_method == "beam":
            return self.beam_search(encoded, max_length, beam_size)
        if decode_method == "dbs":
            return self.diverse_beam_search(encoded, max_length, beam_size,
                                            **kwargs)
        return self.stepwise_decode(encoded, decode_method, max_length, temp)

    def stepwise_decode(self, encoded, method: str, max_length: int,
                        temp: float = 1.0) -> Dict[str, Any]:
        """Greedy / sampled autoregressive decode with finished-mask semantics
        matching the reference early-stop (vae_model.py:44-54)."""
        enc_mem, enc_mask, p_proj, d_proj = self._prep_ctx(encoded)
        N = enc_mem.shape[0]
        E = self.decoder.embed_size
        T = max_length
        dt = self.decoder.state_dtype()

        key = self.make_rng("sample")
        k_p, k_samp = jax.random.split(key)
        eps_p = eps_stack(k_p, T, N, E, dt)
        samp_keys = jax.random.split(k_samp, T)

        def step(carry, xs):
            dec_h, p_state, last_z, prev_word, finished = carry
            eps_t, key_t = xs
            p, d = self._step_pair(prev_word, dec_h, p_state, last_z, eps_t,
                                   lambda p: p["z"],
                                   enc_mem, enc_mask, p_proj, d_proj)
            w_t, lp_t = sample_next_word(d["logits"], key_t, method, temp)
            w_t = jnp.where(finished, self.end_idx, w_t)
            finished = finished | (w_t == self.end_idx)
            carry = (d["state"], p["state"], p["z"], w_t, finished)
            ys = {"logits": d["logits"], "output": d["output"],
                  "p_means": p["mean"], "p_logs": p["log"], "p_z": p["z"],
                  "seqs": w_t, "sampled_logprobs": lp_t}
            return carry, ys

        carry0 = (self.decoder.init_state(N, dt), self.pnet.init_state(N, dt),
                  jnp.zeros((N, E), dt),
                  jnp.full((N,), self.start_idx, jnp.int32),
                  jnp.zeros((N,), bool))
        _, ys = scan_or_init(self, step, carry0, (eps_p, samp_keys), T)
        return {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}

    # ------------------------------------------------------------------ #
    # ensemble API: externally driven per-step decode
    # ------------------------------------------------------------------ #
    def decode_ctx(self, encoded):
        """Precompute per-utterance decode context (enc_mem, mask, attention
        projections) for externally driven stepping (ensemble decode)."""
        return self._prep_ctx(encoded)

    def init_decode_state(self, batch: int):
        dt = self.decoder.state_dtype()
        return (self.decoder.init_state(batch, dt),
                self.pnet.init_state(batch, dt),
                jnp.zeros((batch, self.decoder.embed_size), dt))

    def decode_step_api(self, ctx, state, words, eps_t):
        """One decode step driven from outside (decoding.ensemble)."""
        enc_mem, enc_mask, p_proj, d_proj = ctx
        dec_h, p_state, last_z = state
        p, d = self._step_pair(words, dec_h, p_state, last_z, eps_t,
                               lambda p: p["z"],
                               enc_mem, enc_mask, p_proj, d_proj)
        return d["logits"], (d["state"], p["state"], p["z"])

    def forced_decode(self, feats, feat_lens, given_seqs) -> Dict[str, Any]:
        """Replay a sampled rollout: feed `given_seqs` as the word inputs and
        return the logprobs of those words.

        Consumes the "sample" rng stream *identically* to
        :meth:`stepwise_decode` (same split structure → same prior eps), so
        calling rollout and replay with the same key reproduces the exact
        rollout computation — this is how SCST gets gradients without keeping
        the rollout graph (utils/train_util.py:355-413; SURVEY §7 host/device
        split for RL)."""
        encoded = self.encode(feats, feat_lens, train=False)
        enc_mem, enc_mask, p_proj, d_proj = self._prep_ctx(encoded)
        N, T = given_seqs.shape
        E = self.decoder.embed_size
        dt = self.decoder.state_dtype()
        key = self.make_rng("sample")
        k_p, _k_samp = jax.random.split(key)   # mirror stepwise_decode
        eps_p = eps_stack(k_p, T, N, E, dt)

        def step(carry, xs):
            dec_h, p_state, last_z, prev_word = carry
            eps_t, given_t = xs
            p, d = self._step_pair(prev_word, dec_h, p_state, last_z, eps_t,
                                   lambda p: p["z"],
                                   enc_mem, enc_mask, p_proj, d_proj)
            logprobs = jax.nn.log_softmax(
                d["logits"].astype(jnp.float32), axis=-1)
            lp_t = jnp.take_along_axis(logprobs, given_t[:, None], -1)[:, 0]
            carry = (d["state"], p["state"], p["z"], given_t)
            return carry, {"sampled_logprobs": lp_t}

        carry0 = (self.decoder.init_state(N, dt), self.pnet.init_state(N, dt),
                  jnp.zeros((N, E), dt),
                  jnp.full((N,), self.start_idx, jnp.int32))
        xs = (eps_p, jnp.moveaxis(given_seqs, 0, 1))
        _, ys = scan_or_init(self, step, carry0, xs, T)
        return {"sampled_logprobs": jnp.moveaxis(ys["sampled_logprobs"], 0, 1),
                "seqs": given_seqs}

    def beam_search(self, encoded, max_length: int,
                    beam_size: int) -> Dict[str, Any]:
        """VAE-flavor beam search (vae_model.py:220-312): per-beam prior z,
        flat top-k from step 0, no end handling; top beam returned first."""
        enc_mem, enc_mask, p_proj, d_proj = self._prep_ctx(encoded)
        N = enc_mem.shape[0]
        B = beam_size
        E = self.decoder.embed_size
        dt = self.decoder.state_dtype()
        # attention memories stay per-instance [N, S, ·]: AdditiveAttention
        # folds the beam axis from the [N*B] queries (models/attention.py),
        # so the B× replicated HBM reads of enc_mem/projections disappear.

        eps_p = eps_stack(self.make_rng("sample"), max_length, N * B, E, dt)

        def step_fn(state, words, t):
            dec_h, p_state, last_z = state
            p, d = self._step_pair(words, dec_h, p_state, last_z, eps_p[t],
                                   lambda p: p["z"],
                                   enc_mem, enc_mask, p_proj, d_proj)
            return d["logits"], (d["state"], p["state"], p["z"])

        init_state = (self.decoder.init_state(N * B, dt),
                      self.pnet.init_state(N * B, dt),
                      jnp.zeros((N * B, E), dt))
        if self.is_initializing():
            # create params via one eager step; beam loop itself is param-free
            step_fn(init_state, jnp.full((N * B,), self.start_idx, jnp.int32), 0)
            return {"seqs": jnp.full((N, B, max_length), self.end_idx, jnp.int32),
                    "scores": jnp.zeros((N, B))}
        cfg = BeamConfig(beam_size=B, max_length=max_length,
                         start_idx=self.start_idx, end_idx=self.end_idx,
                         first_step_row0=False, end_handling=False)
        return batched_beam_search(step_fn, init_state, N, cfg)

    def diverse_beam_search(self, encoded, max_length: int, beam_size: int,
                            group_size: int = 5, diversity_lambda: float = 0.5,
                            temperature: float = 1.0,
                            group_nbest: bool = True) -> Dict[str, Any]:
        from acvae_tpu.decoding.dbs import (DBSConfig, dbs_bdash,
                                            diverse_beam_search)

        enc_mem, enc_mask, p_proj, d_proj = self._prep_ctx(encoded)
        N = enc_mem.shape[0]
        E = self.decoder.embed_size
        dt = self.decoder.state_dtype()
        bdash = dbs_bdash(beam_size, group_size)
        NB = N * bdash
        # per-instance attention memories; beam axis folded in the attention
        total_steps = max_length + group_size - 1
        eps_p = jax.vmap(lambda k: eps_stack(k, total_steps, NB, E, dt))(
            jax.random.split(self.make_rng("sample"), group_size))

        def make_step_fn(g):
            def step_fn(state, words, t):
                dec_h, p_state, last_z = state
                p, d = self._step_pair(words, dec_h, p_state, last_z,
                                       eps_p[g, t], lambda p: p["z"],
                                       enc_mem, enc_mask, p_proj, d_proj)
                return d["logits"], (d["state"], p["state"], p["z"])
            return step_fn

        def make_init_state():
            return (self.decoder.init_state(NB, dt),
                    self.pnet.init_state(NB, dt),
                    jnp.zeros((NB, E), dt))

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


class SimpleVAECaptionModel(nn.Module):
    """SimpleVAEModel ablation (vae_model.py:366-672): a single global latent,
    fixed-prior N(0, e^{0.5·0.5}) at train / N(0, e^{0.5·1}) at eval
    (:491-495,593-595); decoder receives the same z at every step."""
    encoder: nn.Module
    decoder: nn.Module
    qnet: nn.Module
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

    def _decode_with_z(self, encoded, z, words0, T, method, temp, caps=None,
                       ss_ratio=1.0, train=False):
        dt = self.decoder.state_dtype()
        enc_mem = encoded["audio_embeds"].astype(dt)
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        d_proj = self.decoder.project_enc(enc_mem)
        N = enc_mem.shape[0]
        z = z.astype(dt)
        key = self.make_rng("sample")
        k_coin, k_samp = jax.random.split(key)
        ss_coins = jax.random.uniform(k_coin, (T,)) < ss_ratio
        samp_keys = jax.random.split(k_samp, T)
        teacher = (jnp.moveaxis(caps[:, :T], 0, 1) if caps is not None
                   else jnp.zeros((T, N), jnp.int32))

        def step(carry, xs):
            dec_h, prev_word, finished = carry
            teacher_word, ss_coin, key_t = xs
            if caps is not None:
                word = jnp.where(ss_coin, teacher_word, prev_word)
            else:
                word = prev_word
            d = self.decoder.step(word, dec_h, enc_mem, d_proj, enc_mask, z,
                                  train=train)
            w_t, lp_t = sample_next_word(d["logits"], key_t, method, temp)
            if caps is None:
                w_t = jnp.where(finished, self.end_idx, w_t)
                finished = finished | (w_t == self.end_idx)
            carry = (d["state"], w_t, finished)
            ys = {"logits": d["logits"], "output": d["output"], "seqs": w_t,
                  "sampled_logprobs": lp_t}
            return carry, ys

        carry0 = (self.decoder.init_state(N, dt),
                  jnp.full((N,), self.start_idx, jnp.int32),
                  jnp.zeros((N,), bool))
        _, ys = scan_or_init(self, step, carry0,
                              (teacher, ss_coins, samp_keys), T)
        return {k: jnp.moveaxis(v, 0, 1) for k, v in ys.items()}

    def train_forward(self, feats, feat_lens, caps, cap_lens,
                      ss_ratio: float = 1.0, dis_ratio: float = 0.0,
                      train: bool = True):
        N, L = caps.shape
        E = self.decoder.embed_size
        encoded = self.encode(feats, feat_lens, train)
        key = self.make_rng("sample")
        k_q, k_p = jax.random.split(key)
        qnetout = self.qnet(caps, cap_lens, jax.random.normal(k_q, (N, E)))
        # decoder always receives the posterior z at train (vae_model.py:458-459)
        out = self._decode_with_z(encoded, qnetout["q_z"], None, L - 1,
                                  "greedy", 1.0, caps, ss_ratio, train)
        # fixed prior stats for the KL (vae_model.py:491-494)
        out.update(qnetout)
        out["p_means"] = jnp.zeros((N, E))
        out["p_logs"] = jnp.full((N, E), 0.5)
        out["p_z"] = (jax.random.normal(k_p, (N, E))
                      * jnp.exp(0.5 * out["p_logs"]) + out["p_means"])
        return out

    def inference_forward(self, feats, feat_lens, decode_method: str = "greedy",
                          max_length: Optional[int] = None, beam_size: int = 3,
                          temp: float = 1.0, train: bool = False, **kwargs):
        _check_decode_method("SimpleVAECaptionModel", decode_method)
        max_length = max_length or self.max_length
        encoded = self.encode(feats, feat_lens, train)
        N = encoded["audio_embeds"].shape[0]
        E = self.decoder.embed_size
        key = self.make_rng("sample")
        if decode_method == "beam":
            return self._beam(encoded, max_length, beam_size, key)
        if decode_method == "dbs":
            return self.diverse_beam_search(encoded, max_length, beam_size,
                                            key, **kwargs)
        # eval prior: p_logs = 1 (vae_model.py:593-595)
        z = jax.random.normal(key, (N, E)) * jnp.exp(0.5 * 1.0)
        return self._decode_with_z(encoded, z, None, max_length, decode_method, temp)

    def forced_decode(self, feats, feat_lens, given_seqs):
        """SCST replay: the global z is the FIRST "sample" rng draw in
        :meth:`inference_forward`, so drawing it first here reproduces the
        rollout's z under the same key (flax folds a per-call counter into
        ``make_rng``); the decode itself is deterministic given the words."""
        encoded = self.encode(feats, feat_lens, train=False)
        N, T = given_seqs.shape
        E = self.decoder.embed_size
        key = self.make_rng("sample")   # mirrors inference_forward's draw
        z = jax.random.normal(key, (N, E)) * jnp.exp(0.5 * 1.0)
        dt = self.decoder.state_dtype()
        enc_mem = encoded["audio_embeds"].astype(dt)
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        d_proj = self.decoder.project_enc(enc_mem)
        z = z.astype(dt)

        def step(carry, given_t):
            dec_h, prev_word = carry
            d = self.decoder.step(prev_word, dec_h, enc_mem, d_proj,
                                  enc_mask, z, train=False)
            logprobs = jax.nn.log_softmax(
                d["logits"].astype(jnp.float32), axis=-1)
            lp_t = jnp.take_along_axis(logprobs, given_t[:, None], -1)[:, 0]
            return (d["state"], given_t), {"sampled_logprobs": lp_t}

        carry0 = (self.decoder.init_state(N, dt),
                  jnp.full((N,), self.start_idx, jnp.int32))
        _, ys = scan_or_init(self, step, carry0,
                             jnp.moveaxis(given_seqs, 0, 1), T)
        return {"sampled_logprobs": jnp.moveaxis(ys["sampled_logprobs"], 0, 1),
                "seqs": given_seqs}

    def _beam(self, encoded, max_length, beam_size, key):
        dt = self.decoder.state_dtype()
        enc_mem = encoded["audio_embeds"].astype(dt)
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        d_proj = self.decoder.project_enc(enc_mem)
        N, B, E = enc_mem.shape[0], beam_size, self.decoder.embed_size
        z = (jax.random.normal(key, (N * B, E)) * jnp.exp(0.5 * 1.0)).astype(dt)

        def step_fn(state, words, t):
            d = self.decoder.step(words, state, enc_mem, d_proj,
                                  enc_mask, z, train=False)
            return d["logits"], d["state"]

        init_state = self.decoder.init_state(N * B, dt)
        if self.is_initializing():
            step_fn(init_state, jnp.full((N * B,), self.start_idx, jnp.int32), 0)
            return {"seqs": jnp.full((N, B, max_length), self.end_idx, jnp.int32),
                    "scores": jnp.zeros((N, B))}
        cfg = BeamConfig(beam_size=B, max_length=max_length,
                         start_idx=self.start_idx, end_idx=self.end_idx,
                         first_step_row0=False, end_handling=False)
        return batched_beam_search(step_fn, init_state, N, cfg)

    def diverse_beam_search(self, encoded, max_length: int, beam_size: int,
                            key, group_size: int = 5,
                            diversity_lambda: float = 0.5,
                            temperature: float = 1.0,
                            group_nbest: bool = True) -> Dict[str, Any]:
        """DBS for the global-latent ablation.

        The reference *declares* SimpleVAE DBS hooks
        (vae_model.py:621-672) but they are a copy-paste of VAEModel's and
        dereference ``self.pnet``, which ``SimpleVAEModel`` never defines
        (vae_model.py:366-374) — ``--method=dbs`` on the reference SimpleVAE
        raises AttributeError.  This implements the evidently *intended*
        semantics: each group draws its own global z from the eval prior
        N(0, e^{0.5·1}) per beam slot (the beam flavor's per-beam draw,
        vae_model.py:593-595), held fixed across steps; diversity then comes
        from both the z draws and the Hamming penalty.  Documented in
        COVERAGE.md "Known divergences"."""
        from acvae_tpu.decoding.dbs import DBSConfig, diverse_beam_search

        dt = self.decoder.state_dtype()
        enc_mem = encoded["audio_embeds"].astype(dt)
        enc_mask = length_mask(encoded["audio_embeds_lens"], enc_mem.shape[1])
        d_proj = self.decoder.project_enc(enc_mem)
        N, E = enc_mem.shape[0], self.decoder.embed_size
        from acvae_tpu.decoding.dbs import dbs_bdash
        G = group_size
        bdash = dbs_bdash(beam_size, G)
        NB = N * bdash
        z_groups = (jax.random.normal(key, (G, NB, E))
                    * jnp.exp(0.5 * 1.0)).astype(dt)

        def make_step_fn(g):
            def step_fn(state, words, t):
                d = self.decoder.step(words, state, enc_mem, d_proj,
                                      enc_mask, z_groups[g], train=False)
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
