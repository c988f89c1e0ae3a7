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
