"""Dict-interface loss wrappers (``losses/loss.py``).

The plain CE/KL used by the main AC-VAE runner live in
``acvae_tpu.ops.losses``; this module ports the composite wrappers:

* :func:`masked_cross_entropy` / :func:`masked_label_smoothing` — the
  length-masked dict losses (loss.py:12-70).
* :func:`augment_loss` — ``AugmentLossWrapper`` (loss.py:72-94): captions
  tagged as augmented (cap_id contains "aug") are stochastically kept with
  ``use_aug_prob``; the host supplies the keep-mask so the jitted loss stays
  shape-static.
* :func:`reparameterize_argmax` / :func:`gumbel_softmax` — straight-through
  estimators (loss.py:96-125).
* :func:`condition_loss` — ``ConditionLossWrapper`` (loss.py:127-155):
  word loss + α·BCE(discriminator(one-hot preds), conditions).
* :func:`specificity_loss` — ``SpecificityLossWrapper`` (loss.py:157-181).
* :func:`bce_logits_loss` — numerically guarded BCE on probabilities
  (loss.py:258-277).
* :func:`adverse_loss` — ``AdverseLossWrapper`` (loss.py:279-319):
  CE + β·KL + α·discriminator BCE.  NOTE: the reference then *discards* the
  combined loss when α>0 (loss.py:311-315, SURVEY §7 known bug); we return
  the combined loss and the components.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from acvae_tpu.ops.losses import cross_entropy, normal_kl_loss
from acvae_tpu.ops.masked import length_mask, mean_with_lens


def masked_cross_entropy(logits, targets, lens, reduction: str = "mean"):
    """loss.py:12-37."""
    mask = length_mask(lens, targets.shape[1]).astype(logits.dtype)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], -1)[..., 0] * mask
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_label_smoothing(logits, targets, lens, smoothing: float = 0.1,
                           reduction: str = "mean"):
    """loss.py:39-70."""
    mask = length_mask(lens, targets.shape[1]).astype(logits.dtype)
    V = logits.shape[-1]
    conf, off = 1.0 - smoothing, smoothing / (V - 1)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    per = (-off * jnp.sum(logprobs, -1)
           - (conf - off) * jnp.take_along_axis(
               logprobs, targets[..., None], -1)[..., 0]) * mask
    if reduction == "none":
        return per
    if reduction == "sum":
        return jnp.sum(per)
    return jnp.sum(per) / jnp.maximum(jnp.sum(mask), 1.0)


def augment_keep_mask(cap_ids, use_aug_prob: float, rng) -> jnp.ndarray:
    """Host helper: keep-mask over the batch — non-augmented captions always
    kept, augmented ones kept with use_aug_prob (loss.py:82-89)."""
    import numpy as np
    is_aug = np.array(["aug" in str(c) for c in cap_ids])
    keep = ~is_aug
    keep[is_aug] = rng.random(is_aug.sum()) < use_aug_prob
    return jnp.asarray(keep)


def augment_loss(logits, targets, lens, keep_mask, smoothing: float = 0.0,
                 eps: float = 1e-12):
    """loss.py:72-94 with the keep-mask precomputed on host."""
    per = (masked_label_smoothing(logits, targets, lens, smoothing, "none")
           if smoothing > 0 else
           masked_cross_entropy(logits, targets, lens, "none"))
    per = per * keep_mask[:, None]
    mask = (length_mask(lens, targets.shape[1]).astype(per.dtype)
            * keep_mask[:, None])
    return jnp.sum(per) / (jnp.sum(mask) + eps)


def reparameterize_argmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Straight-through one-hot of argmax (loss.py:96-104)."""
    y = logits
    hard = jax.nn.one_hot(jnp.argmax(y, -1), y.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(hard - y) + y


def gumbel_softmax(logits: jnp.ndarray, key, temperature: float = 1.0) -> jnp.ndarray:
    """Straight-through gumbel-softmax one-hot (loss.py:106-125)."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(y, -1), y.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(hard - y) + y


def bce_logits_loss(probs: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: float = 1.0) -> jnp.ndarray:
    """Clamped BCE on probabilities (loss.py:258-277)."""
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    loss = -(pos_weight * targets * jnp.log(p)
             + (1 - targets) * jnp.log(1 - p))
    return jnp.mean(loss)


def _sample_preds(logits, sample_method: str, key):
    if sample_method == "argmax":
        return reparameterize_argmax(logits)
    if sample_method == "gumbel":
        return gumbel_softmax(logits, key)
    if sample_method == "weighted":
        return jax.nn.softmax(logits, -1)
    raise ValueError(f"sample method {sample_method!r} not supported")


def condition_loss(word_loss, logits, conditions, lens, dscrm_fn,
                   key, alpha: float = 1.0, sample_method: str = "argmax"):
    """ConditionLossWrapper (loss.py:127-155).  dscrm_fn({caps, lens}) →
    probabilities."""
    preds = _sample_preds(logits, sample_method, key)
    probs = dscrm_fn({"caps": preds, "lens": lens - 1})
    cond = bce_logits_loss(probs, conditions)
    return word_loss + alpha * cond, word_loss, cond


def specificity_loss(word_loss, logits, conditions, lens, word_specificity,
                     alpha: float = 1.0, sentence_reduce: str = "sum"):
    """SpecificityLossWrapper (loss.py:157-181)."""
    probs = jax.nn.softmax(logits, -1)
    cond_pred = probs @ word_specificity  # [N, T]
    lens = lens - 1
    if sentence_reduce == "sum":
        mask = length_mask(lens, cond_pred.shape[1]).astype(cond_pred.dtype)
        cond_pred = jnp.sum(cond_pred * mask, axis=1)
    else:
        cond_pred = mean_with_lens(cond_pred[..., None], lens)[..., 0]
    cond = jnp.mean((cond_pred - conditions) ** 2)
    return word_loss + alpha * cond, word_loss, cond


def adverse_loss(packed_logits, targets, q_means, q_logs, p_means, p_logs,
                 logits, label, lens, dscrm_fn, key,
                 alpha: float = 1.0, beta: float = 1.0,
                 sample_method: str = "argmax", mask=None,
                 audio_feats=None, feats_lens=None, kl_mask="same"):
    """AdverseLossWrapper (loss.py:279-319): CE + β·KL + α·discriminator BCE.

    ``mask`` scopes the CE to valid tokens (the reference's packed logits).
    The KL follows the repo-wide masked-KL convention by default
    (``kl_mask="same"`` reuses ``mask``; COVERAGE.md "Known divergences");
    pass ``kl_mask=None`` for the reference's unmasked KL mean
    (Normal_kl_loss averages over every [N, T] position incl. padding)."""
    ce = cross_entropy(packed_logits, targets, mask)
    kl = normal_kl_loss(q_means, q_logs, p_means, p_logs,
                        mask if kl_mask == "same" else kl_mask)
    preds = _sample_preds(logits, sample_method, key)
    probs = dscrm_fn({"audio_feats": audio_feats, "feats_lens": feats_lens,
                      "caps": preds, "lens": lens - 1})
    dscrm = bce_logits_loss(probs, label)
    loss = ce + beta * kl + alpha * dscrm
    return loss, ce, kl, dscrm
