"""Module-level numeric parity against torch with copied weights.

Each test builds the torch computation following the reference's code
(re-expressed here, not imported) and checks our flax module reproduces it to
float32 tolerance when loaded with the same weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from acvae_tpu.models.attention import AdditiveAttention
from acvae_tpu.models.decoders import VAERNNBahdanauAttnDecoder
from acvae_tpu.models.latent import PosteriorRNN, PriorRNN


def t2n(t):
    return t.detach().numpy()


class TestAttentionParity:
    def test_matches_reference_seq2seq_attention(self, rng):
        """Seq2SeqAttention (attn_model.py:6-46): score = v·tanh(W[h_dec;h_enc]),
        length-masked softmax, weighted ctx."""
        N, S, HE, HD, A = 3, 6, 8, 5, 7
        h_dec = rng.normal(size=(N, HD)).astype(np.float32)
        h_enc = rng.normal(size=(N, S, HE)).astype(np.float32)
        lens = np.array([6, 3, 5])

        h2attn = torch.nn.Linear(HE + HD, A)
        v = torch.randn(A)

        # torch reference computation
        td, te = torch.tensor(h_dec), torch.tensor(h_enc)
        q = td.unsqueeze(1).repeat(1, S, 1)
        attn_in = torch.cat((q, te), dim=-1)
        score = torch.tanh(h2attn(attn_in)) @ v
        mask = (torch.arange(S)[None, :] < torch.tensor(lens)[:, None])
        score = score.masked_fill(~mask, -1e10)
        w_ref = torch.softmax(score, -1)
        ctx_ref = (w_ref.unsqueeze(1) @ te).squeeze(1)

        # ours with the same weights: W = [W_dec | W_enc] column split
        attn = AdditiveAttention(A)
        W = t2n(h2attn.weight)  # [A, HD+HE]
        params = {"dec_proj": {"kernel": W[:, :HD].T.copy()},
                  "enc_proj": {"kernel": W[:, HD:].T.copy(),
                               "bias": t2n(h2attn.bias)},
                  "v": t2n(v)}

        def run(attn, h_dec, h_enc, mask):
            proj = attn.project_enc(h_enc)
            return attn(h_dec, h_enc, proj, mask)

        import flax.linen as nn
        ctx, w = nn.apply(run, attn)(
            {"params": params}, jnp.asarray(h_dec), jnp.asarray(h_enc),
            jnp.asarray(np.asarray(mask)))
        np.testing.assert_allclose(np.asarray(ctx), t2n(ctx_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), t2n(w_ref),
                                   rtol=1e-5, atol=1e-6)


class TestBeamFoldedAttention:
    def test_folded_matches_replicated(self, rng):
        """Beam-folded queries (Nq = N*B against N memory rows, row-major
        per instance) must produce exactly what replicating the memories
        per beam produces — this pins the row-major beam↔memory mapping
        the beam engine relies on (models/attention.py)."""
        import flax.linen as nn

        N, B, S, HE, HD, A = 3, 4, 6, 8, 5, 7
        h_enc = rng.normal(size=(N, S, HE)).astype(np.float32)
        q = rng.normal(size=(N * B, HD)).astype(np.float32)
        lens = np.array([6, 3, 5])
        mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

        attn = AdditiveAttention(A)

        def run(attn, h_dec, h_enc, mask):
            proj = attn.project_enc(h_enc)
            return attn(h_dec, h_enc, proj, mask)

        variables = nn.init(run, attn)(
            jax.random.key(0), jnp.asarray(q), jnp.asarray(h_enc), mask)
        ctx_f, w_f = nn.apply(run, attn)(
            variables, jnp.asarray(q), jnp.asarray(h_enc), mask)
        # replicated: each memory row repeated B times (row-major)
        enc_r = jnp.repeat(jnp.asarray(h_enc), B, axis=0)
        mask_r = jnp.repeat(mask, B, axis=0)
        ctx_r, w_r = nn.apply(run, attn)(
            variables, jnp.asarray(q), enc_r, mask_r)
        np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_r),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_r),
                                   rtol=1e-6, atol=1e-7)


def _copy_gru(cell_params, tgru, suffix=""):
    return {
        "wi": t2n(getattr(tgru, f"weight_ih_l0{suffix}")).T,
        "wh": t2n(getattr(tgru, f"weight_hh_l0{suffix}")).T,
        "bi": t2n(getattr(tgru, f"bias_ih_l0{suffix}")),
        "bh": t2n(getattr(tgru, f"bias_hh_l0{suffix}")),
    }


class TestPosteriorParity:
    def test_z_chain_matches_torch_reference(self, rng):
        """PosteriorRNN (text_encoder.py:96-154): BiGRU over caps[:, :-1] with
        packed lengths, then the sequential z-chain with fixed eps."""
        N, L, E, H, V = 3, 7, 6, 4, 19
        caps = rng.integers(3, V, size=(N, L)).astype(np.int32)
        lens = np.array([7, 4, 6])
        eps = rng.normal(size=(N, L - 1, E)).astype(np.float32)

        emb = torch.nn.Embedding(V, E)
        gru = torch.nn.GRU(E, H, bidirectional=True, batch_first=True)
        mlo = torch.nn.Linear(E + 2 * H, 2 * E)

        # torch reference
        x = emb(torch.tensor(caps[:, :-1]).long())
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, torch.tensor(lens - 1), batch_first=True,
            enforce_sorted=False)
        out, _ = gru(packed)
        hid, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=L - 1)
        z_prev = torch.zeros(N, E)
        means_ref, logs_ref, z_ref = [], [], []
        for t in range(L - 1):
            ml = mlo(torch.cat([hid[:, t, :], z_prev], dim=1))
            mean, log = ml[:, :E], ml[:, E:]
            z_t = torch.tensor(eps[:, t]) * torch.exp(0.5 * log) + mean
            means_ref.append(mean)
            logs_ref.append(log)
            z_ref.append(z_t)
            z_prev = z_t
        means_ref = torch.stack(means_ref, 1)

        qnet = PosteriorRNN(vocab_size=V, word_dim=E, embed_size=E,
                            hidden_size=H)
        params = {
            "word_embedding": {"embedding": t2n(emb.weight)},
            "network": {"fwd": _copy_gru(None, gru),
                        "bwd": _copy_gru(None, gru, "_reverse")},
            "mean_log_out": {"kernel": t2n(mlo.weight).T,
                             "bias": t2n(mlo.bias)},
        }
        out = qnet.apply({"params": params}, jnp.asarray(caps),
                         jnp.asarray(lens), jnp.asarray(eps))
        np.testing.assert_allclose(np.asarray(out["q_means"]),
                                   t2n(means_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["q_z"]),
                                   t2n(torch.stack(z_ref, 1)),
                                   rtol=1e-4, atol=1e-5)


class TestPriorParity:
    def test_step_matches_torch_reference(self, rng):
        """PriorRNN (text_encoder.py:218-268): word attn over audio, LSTM over
        [emb; ctx; last_z], linear → (μ, log), reparameterize."""
        N, S, E, V = 3, 5, 6, 17
        word = rng.integers(3, V, size=(N,)).astype(np.int32)
        enc_mem = rng.normal(size=(N, S, E)).astype(np.float32)
        lens = np.array([5, 3, 4])
        last_z = rng.normal(size=(N, E)).astype(np.float32)
        h0 = rng.normal(size=(N, E)).astype(np.float32)
        c0 = rng.normal(size=(N, E)).astype(np.float32)
        eps = rng.normal(size=(N, E)).astype(np.float32)

        emb = torch.nn.Embedding(V, E)
        h2attn = torch.nn.Linear(2 * E, E)
        v = torch.randn(E)
        lstm = torch.nn.LSTMCell(3 * E, E)
        mlo = torch.nn.Linear(E, 2 * E)

        # torch reference (attention query = word embedding)
        x = emb(torch.tensor(word).long())
        te = torch.tensor(enc_mem)
        q = x.unsqueeze(1).repeat(1, S, 1)
        score = torch.tanh(h2attn(torch.cat([q, te], -1))) @ v
        mask = (torch.arange(S)[None, :] < torch.tensor(lens)[:, None])
        score = score.masked_fill(~mask, -1e10)
        w = torch.softmax(score, -1)
        ctx = (w.unsqueeze(1) @ te).squeeze(1)
        h, c = lstm(torch.cat([x, ctx, torch.tensor(last_z)], -1),
                    (torch.tensor(h0), torch.tensor(c0)))
        ml = mlo(h)
        mean_ref, log_ref = ml[:, :E], ml[:, E:]
        z_ref = torch.tensor(eps) * torch.exp(0.5 * log_ref) + mean_ref

        pnet = PriorRNN(vocab_size=V, word_dim=E, audiofeats_size=E,
                        embed_size=E, hidden_size=E)
        W = t2n(h2attn.weight)
        params = {
            "word_embedding": {"embedding": t2n(emb.weight)},
            "word_attn": {"dec_proj": {"kernel": W[:, :E].T.copy()},
                          "enc_proj": {"kernel": W[:, E:].T.copy(),
                                       "bias": t2n(h2attn.bias)},
                          "v": t2n(v)},
            "network": {"wi": t2n(lstm.weight_ih).T,
                        "wh": t2n(lstm.weight_hh).T,
                        "bi": t2n(lstm.bias_ih), "bh": t2n(lstm.bias_hh)},
            "mean_log_out": {"kernel": t2n(mlo.weight).T,
                             "bias": t2n(mlo.bias)},
        }

        def run(pnet, word, enc_mem, mask, state, last_z, eps):
            proj = pnet.project_enc(enc_mem)
            return pnet.step(word, enc_mem, proj, mask, state, last_z, eps)

        import flax.linen as nn
        out = nn.apply(run, pnet)(
            {"params": params}, jnp.asarray(word), jnp.asarray(enc_mem),
            jnp.asarray(np.asarray(mask)), (jnp.asarray(h0), jnp.asarray(c0)),
            jnp.asarray(last_z), jnp.asarray(eps))
        np.testing.assert_allclose(np.asarray(out["mean"]), t2n(mean_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["z"]), t2n(z_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["state"][0]), t2n(h),
                                   rtol=1e-4, atol=1e-5)


class TestVAEDecoderParity:
    def test_step_matches_torch_reference(self, rng):
        """VAERNNBahdanauAttnDecoder (decoder.py:164-203): attn from decoder
        state, GRU over [emb; ctx; z], classifier logits."""
        N, S, E, V = 3, 5, 6, 17
        word = rng.integers(3, V, size=(N,)).astype(np.int32)
        enc_mem = rng.normal(size=(N, S, E)).astype(np.float32)
        lens = np.array([5, 2, 4])
        z = rng.normal(size=(N, E)).astype(np.float32)
        state = rng.normal(size=(N, E)).astype(np.float32)

        emb = torch.nn.Embedding(V, E)
        h2attn = torch.nn.Linear(2 * E, E)
        v = torch.randn(E)
        gru = torch.nn.GRUCell(3 * E, E)
        cls = torch.nn.Linear(E, V)

        x = emb(torch.tensor(word).long())
        te = torch.tensor(enc_mem)
        q = torch.tensor(state).unsqueeze(1).repeat(1, S, 1)
        score = torch.tanh(h2attn(torch.cat([q, te], -1))) @ v
        mask = (torch.arange(S)[None, :] < torch.tensor(lens)[:, None])
        score = score.masked_fill(~mask, -1e10)
        w = torch.softmax(score, -1)
        ctx = (w.unsqueeze(1) @ te).squeeze(1)
        h_ref = gru(torch.cat([x, ctx, torch.tensor(z)], -1),
                    torch.tensor(state))
        logits_ref = cls(h_ref)

        dec = VAERNNBahdanauAttnDecoder(vocab_size=V, enc_mem_size=E,
                                        embed_size=E, hidden_size=E,
                                        attn_size=E)
        W = t2n(h2attn.weight)
        params = {
            "word_embeddings": {"embedding": t2n(emb.weight)},
            "attn": {"dec_proj": {"kernel": W[:, :E].T.copy()},
                     "enc_proj": {"kernel": W[:, E:].T.copy(),
                                  "bias": t2n(h2attn.bias)},
                     "v": t2n(v)},
            "cell": {"wi": t2n(gru.weight_ih).T, "wh": t2n(gru.weight_hh).T,
                     "bi": t2n(gru.bias_ih), "bh": t2n(gru.bias_hh)},
            "classifier": {"kernel": t2n(cls.weight).T, "bias": t2n(cls.bias)},
        }

        def run(dec, word, state, enc_mem, mask, z):
            proj = dec.project_enc(enc_mem)
            return dec.step(word, state, enc_mem, proj, mask, z)

        import flax.linen as nn
        out = nn.apply(run, dec)(
            {"params": params}, jnp.asarray(word), jnp.asarray(state),
            jnp.asarray(enc_mem), jnp.asarray(np.asarray(mask)), jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(out["logits"]), t2n(logits_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["state"]), t2n(h_ref),
                                   rtol=1e-4, atol=1e-5)


class TestZChainStability:
    def test_posterior_chain_finite_under_extreme_noise(self):
        """The z-chain z → Linear → ε·exp(½ log σ²) → z is exponentially
        unstable without the ±10 log-variance clamp (split_mean_log): at
        small dims an unlucky ε draw overflowed exp() within 20 steps and
        poisoned training with nan.  Drive the chain with extreme noise and
        assert everything stays finite."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        V, E, L, N = 30, 16, 22, 8
        qnet = PosteriorRNN(vocab_size=V, word_dim=E, embed_size=E,
                            hidden_size=E)
        caps = jnp.asarray(
            np.random.default_rng(0).integers(3, V, size=(N, L)))
        lens = jnp.full((N,), L)
        eps = 8.0 * jax.random.normal(jax.random.key(1), (N, L - 1, E))
        variables = qnet.init(jax.random.key(0), caps, lens, eps)
        out = qnet.apply(variables, caps, lens, eps)
        for k in ("q_means", "q_logs", "q_z"):
            assert np.isfinite(np.asarray(out[k])).all(), k
        assert float(jnp.max(jnp.abs(out["q_logs"]))) <= 10.0
