"""Length-masked reductions.

TPU-native equivalents of the reference's mask helpers
(``utils/train_util.py:198-231``: ``generate_length_mask`` / ``mean_with_lens``
/ ``max_with_lens``).  Everything here is shape-static and jit/vmap friendly:
the time axis is the padded maximum, validity comes from ``lens``.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e10  # matches the reference's masked_fill value (models/attn_model.py:41)


def length_mask(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[N] lengths -> [N, max_len] bool mask (True = valid)."""
    idxs = jnp.arange(max_len)[None, :]
    return idxs < lens.astype(jnp.int32)[:, None]


def mean_with_lens(features: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over axis 1. features: [N, T, ...], lens: [N]."""
    mask = length_mask(lens, features.shape[1])
    mask = mask.reshape(mask.shape + (1,) * (features.ndim - 2))
    total = jnp.sum(features * mask, axis=1)
    denom = jnp.maximum(lens.astype(features.dtype), 1.0)
    return total / denom.reshape(denom.shape + (1,) * (features.ndim - 2))


def max_with_lens(features: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Masked max over axis 1. features: [N, T, ...], lens: [N]."""
    mask = length_mask(lens, features.shape[1])
    mask = mask.reshape(mask.shape + (1,) * (features.ndim - 2))
    neg = jnp.asarray(jnp.finfo(features.dtype).min, features.dtype)
    return jnp.max(jnp.where(mask, features, neg), axis=1)


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` with invalid entries (mask=False) forced to ~0."""
    scores = jnp.where(mask, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=axis, keepdims=True)
    exp = jnp.exp(scores)
    return exp / jnp.sum(exp, axis=axis, keepdims=True)
