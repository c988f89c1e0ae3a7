"""Fused caption losses.

TPU-native equivalents of the reference losses in ``utils/train_util.py``:

* ``label_smoothing_loss`` — ``LabelSmoothingLoss`` (:234-251).  The reference
  computes it on *packed* logits (``pack_padded_sequence`` in
  ``runners/pytorch_runner_vae.py:89-95``), i.e. a mean over the valid
  (non-padded) token positions.  We keep static shapes and pass a weight mask
  instead; the result is numerically identical.
* ``normal_kl_loss`` — ``Normal_kl_loss`` (:253-266), analytic diagonal-Gaussian
  KL(q ‖ p), ``.sum(-1).mean()``.  NOTE: the reference averages over *all*
  [N, T] positions including padding (no mask is applied at the call site
  ``pytorch_runner_vae.py:315``).  ``mask=None`` reproduces that; pass a mask
  for the (better) masked variant.
* ``gmm_kl_loss`` — ``GMM_kl_loss`` (:273-291) for mixture priors.
* ``scst_loss`` — the policy-gradient reduction shared by ``scst_Loss`` /
  ``Nscst_Loss`` (:292-413): −logprob·reward masked past ``<end>``, summed over
  time then averaged over the batch.  Reward computation (CIDEr) stays on host;
  only the differentiable part lives here.

All functions are pure jnp and fuse into the surrounding jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Token-level CE averaged over valid positions (torch CrossEntropyLoss
    on packed logits, runners/pytorch_runner_vae.py:226)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, mask)


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.1,
                         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Label-smoothed CE (utils/train_util.py:234-251).

    true_dist = smoothing/(V-1) everywhere, confidence=1-smoothing on target;
    loss = mean over valid positions of sum(-true_dist * log_softmax(logits)).
    """
    vocab = logits.shape[-1]
    confidence = 1.0 - smoothing
    off_value = smoothing / (vocab - 1)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    # sum(-true_dist * logp) = -off*sum(logp) - (confidence - off)*logp[target]
    sum_logp = jnp.sum(logprobs, axis=-1)
    tgt_logp = jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    per_tok = -off_value * sum_logp - (confidence - off_value) * tgt_logp
    return _masked_mean(per_tok, mask)


def normal_kl_loss(mu_q: jnp.ndarray, logvar_q: jnp.ndarray,
                   mu_p: jnp.ndarray, logvar_p: jnp.ndarray,
                   mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Analytic KL(N(mu_q, e^lv_q) ‖ N(mu_p, e^lv_p)), sum over feature dim,
    mean over leading dims (utils/train_util.py:253-266)."""
    v_q = jnp.exp(logvar_q)
    v_p = jnp.exp(logvar_p)
    kl = 0.5 * (logvar_p - logvar_q) + (v_q + (mu_q - mu_p) ** 2) / (2.0 * v_p) - 0.5
    kl = jnp.sum(kl, axis=-1)
    return _masked_mean(kl, mask)


def normal_kl_per_dim(mu_q: jnp.ndarray, logvar_q: jnp.ndarray,
                      mu_p: jnp.ndarray, logvar_p: jnp.ndarray,
                      mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-latent-dimension analytic KL, masked-mean over the leading
    (batch/time) dims — returns an [E] vector.

    Two consumers (no reference counterpart — the reference logs loss/score
    only, pytorch_runner_vae.py:336-357):

    * posterior-collapse diagnostics: ``active_units`` counts dims whose
      batch-mean KL exceeds a threshold (Burda et al. 2016 convention);
    * free-bits (Kingma et al. 2016, IAF appendix C.8): the KL term becomes
      ``sum_d max(lambda, E_batch[KL_d])`` so the optimizer cannot collapse
      individual dims below the floor.
    """
    v_q = jnp.exp(logvar_q)
    v_p = jnp.exp(logvar_p)
    kl = 0.5 * (logvar_p - logvar_q) + (v_q + (mu_q - mu_p) ** 2) / (2.0 * v_p) - 0.5
    if mask is None:
        return jnp.mean(kl.reshape(-1, kl.shape[-1]), axis=0)
    m = mask.astype(kl.dtype)[..., None]
    flat_kl = (kl * m).reshape(-1, kl.shape[-1])
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(flat_kl, axis=0) / denom


def gmm_kl_loss(mu_q: jnp.ndarray, logvar_q: jnp.ndarray, logits_c_q: jnp.ndarray,
                mu_p: jnp.ndarray, logvar_p: jnp.ndarray, logits_c_p: jnp.ndarray,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mixture-of-Gaussians KL upper bound (utils/train_util.py:273-291).

    mu/logvar: [K, ..., E]; logits_c: [K] mixture logits (softmaxed over K).
    """
    c_q = jax.nn.softmax(logits_c_q, axis=0)
    c_p = jax.nn.softmax(logits_c_p, axis=0)
    v_q = jnp.exp(logvar_q)
    v_p = jnp.exp(logvar_p)
    kl_i = 0.5 * (logvar_p - logvar_q) + (v_q + (mu_q - mu_p) ** 2) / (2.0 * v_p) - 0.5
    kl_c = jnp.sum(c_q * (jnp.log(c_q) - jnp.log(c_p)))
    shape = (c_q.shape[0],) + (1,) * (kl_i.ndim - 1)
    kl = jnp.sum(c_q.reshape(shape) * kl_i, axis=0)
    kl = jnp.sum(kl, axis=-1)
    return kl_c + _masked_mean(kl, mask)


def scst_loss(sampled_logprobs: jnp.ndarray, sampled_seqs: jnp.ndarray,
              reward: jnp.ndarray, end_idx: int = 2) -> jnp.ndarray:
    """SCST policy-gradient loss (utils/train_util.py:355-413).

    sampled_logprobs/seqs: [N, T]; reward: [N] (advantage, already
    baseline-subtracted).  Mask = 1 for position 0 and positions whose
    *previous* token is not <end> (train_util.py:401-405).
    """
    prev_not_end = (sampled_seqs[:, :-1] != end_idx).astype(sampled_logprobs.dtype)
    mask = jnp.concatenate(
        [jnp.ones((sampled_seqs.shape[0], 1), sampled_logprobs.dtype), prev_not_end],
        axis=1)
    loss = -sampled_logprobs * reward[:, None] * mask
    return jnp.mean(jnp.sum(loss, axis=1))
