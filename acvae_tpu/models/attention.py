"""Additive (Bahdanau) attention.

Equivalent of the reference ``Seq2SeqAttention`` (``models/attn_model.py:6-46``):
``score = v · tanh(W [h_dec; h_enc])`` with length-masked softmax.  Used by the
attention decoders and by the prior net's word→audio attention
(``models/text_encoder.py:227,251``).

TPU-first difference: the joint projection ``W [h_dec; h_enc]`` is split into
``W_enc h_enc + W_dec h_dec`` so the (large) encoder-side projection is
computed **once per utterance** instead of once per decode step — the
reference recomputes it every timestep inside its python loop.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu.ops.masked import NEG_INF


class AdditiveAttention(nn.Module):
    """Bahdanau attention with a precomputable encoder projection."""
    attn_size: int

    @nn.compact
    def project_enc(self, h_enc: jnp.ndarray) -> jnp.ndarray:
        """[N, S, hs_enc] -> [N, S, attn]; call once, reuse across steps."""
        return nn.Dense(self.attn_size, use_bias=True,
                        kernel_init=nn.initializers.kaiming_uniform(),
                        name="enc_proj")(h_enc)

    @nn.compact
    def query(self, h_dec: jnp.ndarray) -> jnp.ndarray:
        """Project a query only ([Nq, hs_dec] -> [Nq, attn]) — the decoder
        half of one read, for :func:`stacked_attention_read` (shares the
        ``dec_proj`` kernel with :meth:`__call__` by name)."""
        return nn.Dense(self.attn_size, use_bias=False,
                        kernel_init=nn.initializers.kaiming_uniform(),
                        name="dec_proj")(h_dec)

    @nn.compact
    def v_vec(self) -> jnp.ndarray:
        """The score vector ``v`` (shared with :meth:`__call__` by name)."""
        return self.param("v", nn.initializers.normal(1.0), (self.attn_size,))

    @nn.compact
    def __call__(self, h_dec: jnp.ndarray, h_enc: jnp.ndarray,
                 enc_proj: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One attention read.

        h_dec: [Nq, hs_dec]; h_enc: [N, S, hs_enc]; enc_proj: [N, S, attn]
        (from :meth:`project_enc`); mask: [N, S] bool (True = valid).
        Returns (ctx [Nq, hs_enc], weights [Nq, S]).

        ``Nq`` may be ``N * B`` (beam-folded queries, row-major per instance:
        query ``n*B + b`` attends over memory row ``n``).  The beam axis is
        folded into a broadcast instead of replicating ``h_enc``/``enc_proj``
        per beam, shrinking the decode working set by ``B×``; measured decode
        *time* at the flagship shapes is unchanged — the beam loop is
        latency-bound, not bandwidth-bound (docs/pallas_notes.md
        "beam-folded attention").
        """
        dec_proj = nn.Dense(self.attn_size, use_bias=False,
                            kernel_init=nn.initializers.kaiming_uniform(),
                            name="dec_proj")(h_dec)
        v = self.param("v", nn.initializers.normal(1.0), (self.attn_size,))
        N, Nq = h_enc.shape[0], h_dec.shape[0]
        if Nq != N:  # beam-folded: B queries per memory row
            B = Nq // N
            attn_out = jnp.tanh(enc_proj[:, None, :, :]
                                + dec_proj.reshape(N, B, 1, -1))  # [N,B,S,attn]
            score = attn_out @ v  # [N, B, S]
            if mask is not None:
                score = jnp.where(mask[:, None, :], score, NEG_INF)
            weights = jax.nn.softmax(score, axis=-1)
            ctx = jnp.einsum("nbs,nse->nbe", weights, h_enc)
            return (ctx.reshape(Nq, h_enc.shape[-1]),
                    weights.reshape(Nq, h_enc.shape[1]))
        attn_out = jnp.tanh(enc_proj + dec_proj[:, None, :])  # [N, S, attn]
        score = attn_out @ v  # [N, S]
        if mask is not None:
            score = jnp.where(mask, score, NEG_INF)
        weights = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("ns,nse->ne", weights, h_enc)
        return ctx, weights


def stacked_attention_read(enc_projs, queries, vs, h_enc, mask=None):
    """K additive-attention reads over the SAME memory in one fused pass.

    The VAE decode step performs TWO independent reads whose queries are both
    available at step start — the prior's word→audio attention (query = word
    embedding) and the decoder's Bahdanau attention (query = previous decoder
    state), over the same ``enc_mem`` (vae_model.py:116-139).  Executing them
    as one stacked computation halves the serial elementwise chain (one
    tanh / one masked softmax / one context einsum instead of two of each);
    the per-read math is unchanged: ``softmax(v_k · tanh(E_k + q_k)) @ h``.

    enc_projs: K × [N, S, A] (equal A required); queries: K × [Nq, A]
    (projected, from :meth:`AdditiveAttention.query`); vs: K × [A];
    h_enc: [N, S, E]; mask: [N, S] bool.  ``Nq`` may be ``N*B``
    (beam-folded, row-major per instance, as in
    :meth:`AdditiveAttention.__call__`).

    Returns K × (ctx [Nq, E], weights [Nq, S]).
    """
    K = len(enc_projs)
    A = enc_projs[0].shape[-1]
    assert all(p.shape[-1] == A for p in enc_projs), "stacked reads need equal attn_size"
    E_k = jnp.stack(enc_projs, axis=-2)        # [N, S, K, A]
    q_k = jnp.stack(queries, axis=-2)          # [Nq, K, A]
    v_k = jnp.stack(vs, axis=0)                # [K, A]
    N, Nq = h_enc.shape[0], q_k.shape[0]
    if Nq != N:  # beam-folded
        B = Nq // N
        attn = jnp.tanh(E_k[:, None] + q_k.reshape(N, B, 1, K, A))
        score = jnp.einsum("nbska,ka->nbsk", attn, v_k)   # [N, B, S, K]
        if mask is not None:
            score = jnp.where(mask[:, None, :, None], score, NEG_INF)
        w = jax.nn.softmax(score, axis=2)
        ctx = jnp.einsum("nbsk,nse->nbke", w, h_enc)      # [N, B, K, E]
        return [(ctx[:, :, k].reshape(Nq, -1),
                 w[:, :, :, k].reshape(Nq, -1)) for k in range(K)]
    attn = jnp.tanh(E_k + q_k[:, None])                   # [N, S, K, A]
    score = jnp.einsum("nska,ka->nsk", attn, v_k)         # [N, S, K]
    if mask is not None:
        score = jnp.where(mask[:, :, None], score, NEG_INF)
    w = jax.nn.softmax(score, axis=1)
    ctx = jnp.einsum("nsk,nse->nke", w, h_enc)            # [N, K, E]
    return [(ctx[:, k], w[:, :, k]) for k in range(K)]
