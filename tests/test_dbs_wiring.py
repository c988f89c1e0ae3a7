"""Per-family DBS wiring parity (VERDICT r2 task 2).

The engine (``decoding/dbs.py``) is numpy-verified in test_beam_parity; these
tests verify each newly wired family drives it correctly — group staggering,
per-group beam-parent state gathers, and (SimpleVAE) the per-group global-z
draw — by transcribing ``word_model.py:297-394``'s bookkeeping in numpy
float64 while using the MODEL'S OWN step function as the logits oracle.
Token-exact parity is required; scores to float tolerance.

Reference status per family (COVERAGE.md "Known divergences"):

* ``Seq2SeqAttnModel`` / ``TransformerModel`` never implement the base-class
  DBS hooks (word_model.py:395-409 raise NotImplementedError) — here DBS is
  a working capability superset.
* ``SimpleVAEModel``'s hooks (vae_model.py:621-672) dereference the
  nonexistent ``self.pnet`` (AttributeError at head) — here DBS draws each
  group's global z from the eval prior (vae_model.py:593-595 semantics).
* ``TransVAEModel`` has no DBS in the reference bytecode either — round 4
  adds it anyway (beyond-parity): the engine's group staggering composes
  with the transformer's prefix/z buffers written at each group's LOCAL
  position (TestTransVAEDBS).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.models.build import build_model
from acvae_tpu.ops.masked import length_mask

V, E, N, TMEL, F, L = 23, 16, 3, 64, 64, 8


def _batch(rng):
    feats = jnp.asarray(rng.normal(size=(N, TMEL, F)).astype(np.float32))
    feat_lens = jnp.array([TMEL, 48, 32])
    caps = jnp.asarray(rng.integers(4, V, size=(N, L)))
    caps = caps.at[:, 0].set(1)
    lens = jnp.array([L, 5, 6])
    caps = jnp.where(length_mask(lens, L), caps, 0)
    caps = caps.at[jnp.arange(N), lens - 1].set(2)
    return feats, feat_lens, caps, lens


def _init(model, batch):
    feats, feat_lens, caps, lens = batch
    return model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        feats, feat_lens, caps, lens, train=False)


def _gather_rows(tree, prev):
    """Beam-parent gather on [N*bdash, ...] numpy pytree leaves.
    prev: [N, bdash] parent indices within each instance's beam block."""
    bdash = prev.shape[1]

    def g(leaf):
        leaf = np.asarray(leaf)
        shaped = leaf.reshape((N, bdash) + leaf.shape[1:])
        out = np.stack([shaped[i][prev[i]] for i in range(N)])
        return out.reshape((N * bdash,) + leaf.shape[1:])

    return jax.tree_util.tree_map(g, tree)


def _logsoftmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def numpy_dbs_transcription(step, init_state, beam_size, group_size, max_len,
                            lam, temp, group_nbest, start_idx=1, end_idx=2):
    """word_model.py:297-394 bookkeeping in numpy, logits from ``step``.

    step(g, state_g, words_g [N*bdash], t, lt) -> (logits [N*bdash, V] np,
    new_state_g).  State gathers along beam parents happen here, mirroring
    dbs.py:111."""
    G, bdash = group_size, beam_size // group_size
    T = max_len
    seq_table = [np.full((N, bdash, T), end_idx, np.int64) for _ in range(G)]
    logprob_table = [np.zeros((N, bdash)) for _ in range(G)]
    done = [[[] for _ in range(G)] for _ in range(N)]
    words_g = [np.full(N * bdash, start_idx, np.int64) for _ in range(G)]
    state_g = [init_state() for _ in range(G)]
    for t in range(T + G - 1):
        for g in range(G):
            if not (g <= t <= T + g - 1):
                continue
            lt = t - g
            logits, new_state = step(g, state_g[g], words_g[g], t, lt)
            lp = _logsoftmax(_logsoftmax(np.asarray(logits, np.float64)) / temp)
            lp = lp.reshape(N, bdash, -1)
            v = lp.shape[-1]
            if g > 0:
                change = np.zeros((N, v))
                for prev_g in range(g):
                    for b in range(bdash):
                        tok = seq_table[prev_g][:, b, lt]
                        change[np.arange(N), tok] += 1
                lp = lp - lam * change[:, None, :]
            total = logprob_table[g][:, :, None] + lp
            prev = np.zeros((N, bdash), np.int64)
            nxt = np.zeros((N, bdash), np.int64)
            for i in range(N):
                if lt == 0:
                    flat = total[i, 0]
                    idx = np.argsort(-flat, kind="stable")[:bdash]
                    prev[i] = 0
                    nxt[i] = idx
                    logprob_table[g][i] = flat[idx]
                else:
                    flat = total[i].reshape(-1)
                    idx = np.argsort(-flat, kind="stable")[:bdash]
                    prev[i], nxt[i] = idx // v, idx % v
                    logprob_table[g][i] = flat[idx]
            state_g[g] = _gather_rows(new_state, prev)
            seq_table[g] = np.stack(
                [seq_table[g][i][prev[i]] for i in range(N)])
            seq_table[g][:, :, lt] = nxt
            words_g[g] = nxt.reshape(-1)
            is_end = nxt == end_idx
            if t == T + g - 1:
                is_end[:] = True
            for i in range(N):
                for b in range(bdash):
                    if is_end[i, b]:
                        done[i][g].append(
                            (seq_table[g][i, b].copy(),
                             logprob_table[g][i, b] / (lt + 1)))
            logprob_table[g] = np.where(is_end, logprob_table[g] - 1000,
                                        logprob_table[g])
    out = beam_size if group_nbest else group_size
    top = bdash if group_nbest else 1
    ref_seqs = np.full((N, out, T), end_idx, np.int64)
    ref_scores = np.zeros((N, out))
    for i in range(N):
        row = 0
        for g in range(G):
            best = sorted(done[i][g], key=lambda x: -x[1])[:top]
            for seq, score in best:
                ref_seqs[i, row] = seq
                ref_scores[i, row] = score
                row += 1
    return ref_seqs, ref_scores


BSZ, GSZ, TDEC, LAM, TEMP = 4, 2, 6, 0.6, 1.0
BDASH = BSZ // GSZ


def _check(model_out, ref_seqs, ref_scores):
    np.testing.assert_array_equal(np.asarray(model_out["seqs"]), ref_seqs)
    np.testing.assert_allclose(np.asarray(model_out["scores"]), ref_scores,
                               rtol=1e-4, atol=1e-2)


class TestAttnDBS:
    def test_parity(self, rng):
        cfg = {"model": "Seq2SeqAttnModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "RNNBahdanauAttnDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E},
               "model_args": {}}
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        feats, feat_lens = batch[:2]
        variables = _init(model, batch)

        out = model.apply(variables, feats, feat_lens, decode_method="dbs",
                          beam_size=BSZ, group_size=GSZ, max_length=TDEC,
                          diversity_lambda=LAM, temperature=TEMP,
                          group_nbest=True)

        def oracle(m, words, state):
            encoded = m.encode(feats, feat_lens, train=False)
            enc_mem, enc_mask, d_proj = m._ctx(encoded)
            d = m.decoder.step(jnp.asarray(words, jnp.int32), state, enc_mem,
                               d_proj, enc_mask, train=False)
            return d["logits"], d["state"]

        def init_state(m, n):
            return m.decoder.init_state(n, m.decoder.state_dtype())

        def step(g, state, words, t, lt):
            logits, new_state = model.apply(variables, words, state,
                                            method=oracle)
            return np.asarray(logits), new_state

        ref_seqs, ref_scores = numpy_dbs_transcription(
            step,
            lambda: model.apply(variables, N * BDASH, method=init_state),
            BSZ, GSZ, TDEC, LAM, TEMP, True)
        _check(out, ref_seqs, ref_scores)

    def test_group_nbest_false_shape(self, rng):
        cfg = {"model": "Seq2SeqAttnModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "RNNBahdanauAttnDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E},
               "model_args": {}}
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        variables = _init(model, batch)
        out = model.apply(variables, batch[0], batch[1], decode_method="dbs",
                          beam_size=BSZ, group_size=GSZ, max_length=TDEC,
                          group_nbest=False)
        assert out["seqs"].shape == (N, GSZ, TDEC)


class TestTransformerDBS:
    def test_parity(self, rng):
        cfg = {"model": "TransformerModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "TransformerDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E,
                                "nhead": 2, "nlayers": 1},
               "model_args": {}}
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        feats, feat_lens = batch[:2]
        variables = _init(model, batch)

        out = model.apply(variables, feats, feat_lens, decode_method="dbs",
                          beam_size=BSZ, group_size=GSZ, max_length=TDEC,
                          diversity_lambda=LAM, temperature=TEMP,
                          group_nbest=True)

        def oracle(m, words_buf, lt):
            from acvae_tpu.models.vae import _repeat_beams
            encoded = m.encode(feats, feat_lens, train=False)
            enc_r = _repeat_beams(
                {"audio_embeds": encoded["audio_embeds"],
                 "audio_embeds_lens": encoded["audio_embeds_lens"]}, BDASH)
            logits, _ = m._prefix_logits(jnp.asarray(words_buf, jnp.int32),
                                         lt, enc_r)
            return logits

        def step(g, state, words, t, lt):
            buf = np.array(state)
            buf[:, lt] = words
            logits = model.apply(variables, buf, lt, method=oracle)
            return np.asarray(logits), buf

        ref_seqs, ref_scores = numpy_dbs_transcription(
            step,
            lambda: np.full((N * BDASH, TDEC + 1), 1, np.int64),
            BSZ, GSZ, TDEC, LAM, TEMP, True)
        _check(out, ref_seqs, ref_scores)


class TestSimpleVAEDBS:
    def _model(self):
        cfg = {"model": "SimpleVAEModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "VAERNNBahdanauAttnDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E},
               "model_args": {"posterior_model": "PosteriorSentence",
                              "posterior_args": {"hidden_size": E}}}
        return build_model(cfg, V, F)

    def test_parity(self, rng):
        model = self._model()
        batch = _batch(rng)
        feats, feat_lens = batch[:2]
        variables = _init(model, batch)
        zkey = jax.random.key(42)

        def run_dbs(m):
            encoded = m.encode(feats, feat_lens, train=False)
            return m.diverse_beam_search(encoded, TDEC, BSZ, zkey,
                                         group_size=GSZ,
                                         diversity_lambda=LAM,
                                         temperature=TEMP, group_nbest=True)

        out = model.apply(variables, method=run_dbs)

        # the same z draw the model makes (models/vae.py SimpleVAE DBS)
        z_groups = np.asarray(jax.random.normal(zkey, (GSZ, N * BDASH, E))
                              * jnp.exp(0.5 * 1.0))

        def oracle(m, words, state, z):
            encoded = m.encode(feats, feat_lens, train=False)
            dt = m.decoder.state_dtype()
            enc_mem = encoded["audio_embeds"].astype(dt)
            enc_mask = length_mask(encoded["audio_embeds_lens"],
                                   enc_mem.shape[1])
            d_proj = m.decoder.project_enc(enc_mem)
            d = m.decoder.step(jnp.asarray(words, jnp.int32), state, enc_mem,
                               d_proj, enc_mask, jnp.asarray(z), train=False)
            return d["logits"], d["state"]

        def init_state(m, n):
            return m.decoder.init_state(n, m.decoder.state_dtype())

        def step(g, state, words, t, lt):
            logits, new_state = model.apply(
                variables, words, state, z_groups[g], method=oracle)
            return np.asarray(logits), new_state

        ref_seqs, ref_scores = numpy_dbs_transcription(
            step,
            lambda: model.apply(variables, N * BDASH, method=init_state),
            BSZ, GSZ, TDEC, LAM, TEMP, True)
        _check(out, ref_seqs, ref_scores)

    def test_inference_forward_dbs(self, rng):
        """The public decode_method="dbs" path runs end-to-end."""
        model = self._model()
        batch = _batch(rng)
        variables = _init(model, batch)
        out = model.apply(variables, batch[0], batch[1], decode_method="dbs",
                          beam_size=BSZ, group_size=GSZ, max_length=TDEC,
                          rngs={"sample": jax.random.key(5)})
        assert out["seqs"].shape == (N, BSZ, TDEC)
        out2 = model.apply(variables, batch[0], batch[1], decode_method="dbs",
                           beam_size=BSZ, group_size=GSZ, max_length=TDEC,
                           group_nbest=False,
                           rngs={"sample": jax.random.key(5)})
        assert out2["seqs"].shape == (N, GSZ, TDEC)


class TestDBSSizeValidation:
    def test_bdash_zero_is_a_clear_error(self, rng):
        """The CLI defaults (beam_size=3, group_size=5) give 0 beams per
        group — every entry point must raise the named error, not die in a
        scan trace on zero-width tensors (decoding/dbs.py::dbs_bdash)."""
        cfg = {"model": "Seq2SeqAttnModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "RNNBahdanauAttnDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E},
               "model_args": {}}
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        variables = _init(model, batch)
        with pytest.raises(ValueError, match="beam_size >= group_size"):
            model.apply(variables, batch[0], batch[1], decode_method="dbs",
                        beam_size=3, group_size=5, max_length=4)
        from acvae_tpu.decoding.dbs import dbs_bdash
        with pytest.raises(ValueError, match="group_size >= 1"):
            dbs_bdash(4, 0)
        assert dbs_bdash(8, 5) == 1  # reference floor semantics kept


class TestTransVAEDBS:
    """Round-4 beyond-parity: DBS × transformer prefix/z buffers (the
    reference's TransVAEModel bytecode has no DBS at all).  Token-exact vs
    the numpy transcription; the oracle reproduces the model's per-group
    prior-eps streams via the same "sample" rng key."""

    def _model(self):
        cfg = {"model": "TransVAEModel", "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": "VAETransformerDecoder",
               "decoder_args": {"embed_size": E, "hidden_size": E,
                                "nhead": 2, "nlayers": 1},
               "model_args": {"posterior_model": "PosteriorRNN",
                              "posterior_args": {"hidden_size": E},
                              "prior_model": "PriorRNN",
                              "prior_args": {"hidden_size": E}}}
        return build_model(cfg, V, F)

    def test_parity(self, rng):
        model = self._model()
        batch = _batch(rng)
        feats, feat_lens = batch[:2]
        variables = _init(model, batch)
        skey = jax.random.key(11)
        out = model.apply(variables, feats, feat_lens, decode_method="dbs",
                          beam_size=BSZ, group_size=GSZ, max_length=TDEC,
                          diversity_lambda=LAM, temperature=TEMP,
                          group_nbest=True, rngs={"sample": skey})

        from acvae_tpu.models.common import eps_stack

        def eps_oracle(m):
            # the first (and only) make_rng("sample") of the DBS trace
            dt = m.pnet.state_dtype()
            return jax.vmap(lambda k: eps_stack(
                k, TDEC + GSZ - 1, N * BDASH, m.decoder.embed_size, dt))(
                    jax.random.split(m.make_rng("sample"), GSZ))

        eps_p = np.asarray(model.apply(variables, method=eps_oracle,
                                       rngs={"sample": skey}))

        def step_oracle(m, words, state, lt, eps_t):
            from acvae_tpu.models.vae import _repeat_beams
            dt = m.pnet.state_dtype()
            encoded = m.encode(feats, feat_lens, train=False)
            enc_mem = encoded["audio_embeds"].astype(dt)
            enc_mask = length_mask(encoded["audio_embeds_lens"],
                                   enc_mem.shape[1])
            p_proj = m.pnet.project_enc(enc_mem)
            enc_mem_r, lens_r = _repeat_beams(
                (enc_mem, encoded["audio_embeds_lens"]), BDASH)
            enc_r = {"audio_embeds": enc_mem_r, "audio_embeds_lens": lens_r}
            p_state, last_z, words_buf, z_buf = state
            words = jnp.asarray(words, jnp.int32)
            p = m.pnet.step(words, enc_mem, p_proj, enc_mask,
                            p_state, last_z, jnp.asarray(eps_t, dt))
            words_buf = jnp.where((jnp.arange(TDEC) == lt)[None, :],
                                  words[:, None], jnp.asarray(words_buf))
            z_buf = jnp.where((jnp.arange(TDEC) == lt)[None, :, None],
                              p["z"][:, None, :], jnp.asarray(z_buf, dt))
            logits_t, _ = m._decoder_logits(words_buf, z_buf, lt, enc_r,
                                            False)
            return logits_t, (p["state"], p["z"], words_buf, z_buf)

        def init_oracle(m):
            dt = m.pnet.state_dtype()
            NB = N * BDASH
            return (m.pnet.init_state(NB, dt),
                    jnp.zeros((NB, m.decoder.embed_size), dt),
                    jnp.full((NB, TDEC), 1, jnp.int32),
                    jnp.zeros((NB, TDEC, m.decoder.embed_size), dt))

        def step(g, state, words, t, lt):
            logits, new_state = model.apply(variables, words, state, lt,
                                            eps_p[g, t], method=step_oracle)
            return np.asarray(logits), new_state

        ref_seqs, ref_scores = numpy_dbs_transcription(
            step, lambda: model.apply(variables, method=init_oracle),
            BSZ, GSZ, TDEC, LAM, TEMP, True)
        _check(out, ref_seqs, ref_scores)

    def test_inference_forward_dbs_shapes(self, rng):
        model = self._model()
        batch = _batch(rng)
        variables = _init(model, batch)
        out = model.apply(variables, batch[0], batch[1], decode_method="dbs",
                          beam_size=4, group_size=2, max_length=5,
                          group_nbest=False, rngs={"sample": jax.random.key(5)})
        assert out["seqs"].shape == (N, 2, 5)


class TestDecodeMethodErrors:

    @pytest.mark.parametrize("name,decoder", [
        ("Seq2SeqAttnModel", "RNNBahdanauAttnDecoder"),
    ])
    def test_unknown_method_clear_error(self, rng, name, decoder):
        cfg = {"model": name, "encodermodel": "Cnn10",
               "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
               "decoder": decoder,
               "decoder_args": {"embed_size": E, "hidden_size": E},
               "model_args": {}}
        model = build_model(cfg, V, F)
        batch = _batch(rng)
        variables = _init(model, batch)
        with pytest.raises(ValueError, match="supported"):
            model.apply(variables, batch[0], batch[1],
                        decode_method="banana", max_length=4,
                        rngs={"sample": jax.random.key(5)})
