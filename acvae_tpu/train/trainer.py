"""Jitted train/eval steps and the training loop.

TPU-native equivalent of ``runners/pytorch_runner_vae.py``'s training loop
(call stack SURVEY §3.1):

* one fused jitted train step: encoder → posterior → decode scan → losses →
  grad clip → optax update (the reference crosses host↔device every decode
  step; here the whole step is one XLA program);
* the composite loss (pytorch_runner_vae.py:315-320): label-smoothing CE over
  valid tokens + ``kl_weight ·`` KL(q‖p) + optional ``alpha ·`` global
  constraint (MSE or KL between utterance stats);
* schedule scalars (ss_ratio / dis_ratio / kl_weight / lr) are *traced
  scalars*, so their per-iteration updates never retrigger compilation;
* per-epoch validation decodes with beam=3 and scores CIDEr for model
  selection (pytorch_runner_vae.py:344-357).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from acvae_tpu.ops.losses import (cross_entropy, gmm_kl_loss,
                                  label_smoothing_loss, normal_kl_loss,
                                  normal_kl_per_dim)
from acvae_tpu.ops.masked import length_mask


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params), tx=tx)


class _LRScaleState(flax.struct.PyTreeNode):
    scale: jnp.ndarray


def lr_scale() -> optax.GradientTransformation:
    """Update scaling whose factor lives in the *optimizer state*, so a
    host-side epoch scheduler (ReduceLROnPlateau) can adjust the effective
    learning rate between jitted steps without recompiling — optax schedules
    are traced into the step and cannot react to validation scores."""
    def init_fn(params):
        return _LRScaleState(scale=jnp.asarray(1.0, jnp.float32))

    def update_fn(updates, state, params=None):
        return (jax.tree_util.tree_map(lambda u: u * state.scale, updates),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def set_lr_scale(state: "TrainState", value: float) -> "TrainState":
    """Replace the lr_scale factor inside a TrainState's optimizer state."""
    is_scale = lambda n: isinstance(n, _LRScaleState)
    new_opt = jax.tree_util.tree_map(
        lambda n: (_LRScaleState(scale=jnp.asarray(value, jnp.float32))
                   if is_scale(n) else n),
        state.opt_state, is_leaf=is_scale)
    return state.replace(opt_state=new_opt)


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics — the
    reference's epoch scheduler, stepped with the validation score
    (``scheduler.step(score)``, pytorch_runner_vae.py:364-365): after
    ``patience`` epochs without (relative-threshold) improvement, the
    effective lr is multiplied by ``factor``.  Acts through
    :func:`set_lr_scale` on the TrainState."""

    def __init__(self, mode: str = "max", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 min_scale: float = 1e-8):
        self.mode, self.factor = mode, factor
        self.patience, self.threshold = patience, threshold
        self.min_scale = min_scale
        self.best: Optional[float] = None
        self.num_bad = 0
        self.scale = 1.0

    def _is_better(self, a: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            thr = self.best * (1 + self.threshold) if self.best >= 0 \
                else self.best * (1 - self.threshold)
            return a > thr
        thr = self.best * (1 - self.threshold) if self.best >= 0 \
            else self.best * (1 + self.threshold)
        return a < thr

    def step(self, state: "TrainState", metric: float) -> "TrainState":
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
            return state
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            self.scale = max(self.scale * self.factor, self.min_scale)
            state = set_lr_scale(state, self.scale)
        return state


def build_optimizer(name: str = "Adam", lr_schedule=1e-3,
                    max_grad_norm: Optional[float] = None,
                    trainable_mask: Optional[Any] = None,
                    accum_steps: int = 1,
                    **kwargs) -> optax.GradientTransformation:
    """torch-style optimizer names → optax chains, with the reference's global
    grad-norm clip (pytorch_runner_vae.py:322-323) folded in.

    trainable_mask: optional pytree of bools (True = trainable) implementing
    freeze_encoder / freeze_word_embedding (word_model.py:37-39,
    pytorch_runner_vae.py:55) via multi_transform + set_to_zero.

    accum_steps > 1 wraps the whole chain in ``optax.MultiSteps``: gradients
    from k consecutive micro-batches are averaged before one real update
    (clip/optimizer/schedule all see the averaged gradient), trading steps
    for effective batch size when a batch does not fit HBM (config key
    ``accum_steps``; no reference counterpart).  Note BatchNorm statistics
    still update per micro-batch."""
    opts = {
        "Adam": optax.adam, "AdamW": optax.adamw, "SGD": optax.sgd,
        "RMSprop": optax.rmsprop, "Adagrad": optax.adagrad,
    }
    kwargs.pop("lr", None)
    weight_decay = kwargs.pop("weight_decay", None)
    coupled_l2 = None
    if weight_decay and name == "AdamW":
        kwargs["weight_decay"] = weight_decay
    elif weight_decay:
        # torch.optim semantics for every non-AdamW optimizer: weight_decay
        # is COUPLED L2 — wd·param is added to the gradient before the
        # optimizer's moment/scaling step (optax.adamw's decoupled decay
        # would be a different regularizer)
        coupled_l2 = optax.add_decayed_weights(weight_decay)
    base = opts[name](lr_schedule, **kwargs)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if coupled_l2 is not None:
        chain.append(coupled_l2)
    chain.append(base)
    chain.append(lr_scale())  # identity until ReduceLROnPlateau adjusts it
    if trainable_mask is not None:
        # NOTE: optax.masked is the wrong tool here — it passes masked-out
        # updates through *unchanged* (raw gradients would be added to the
        # "frozen" params).  multi_transform + set_to_zero actually freezes.
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask)
        tx = optax.multi_transform(
            {"train": optax.chain(*chain), "freeze": optax.set_to_zero()},
            labels)
    else:
        tx = optax.chain(*chain)
    if accum_steps and accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_steps))
    return tx


def make_train_step(model, label_smoothing: bool = True, smoothing: float = 0.1,
                    kl_mask: str = "valid", alpha: Optional[float] = None,
                    global_loss: str = "MSE",
                    embedding_loss: Optional[str] = None,
                    dec_par: float = 1.0,
                    augment: Optional[Callable] = None,
                    adversarial: Optional[Dict[str, Any]] = None,
                    free_bits: Optional[float] = None,
                    donate: bool = True) -> Callable:
    """Build the jitted train step.

    kl_mask: "valid" masks the KL to real token positions; "reference"
    averages over all padded positions like the reference call site
    (pytorch_runner_vae.py:315 applies no mask).

    free_bits: per-dimension KL floor λ (Kingma et al. 2016): the optimized
    KL becomes ``sum_d max(λ, E_batch[KL_d])`` so individual latent dims
    cannot collapse to the prior.  Normal-prior families only (a GMM prior's
    mixture bound has no per-dim decomposition); config key ``free_bits``.
    Posterior-collapse diagnostics (``active_units`` / ``kl_dim_max`` /
    ``qp_mse``) are always emitted for Normal-KL models, free-bits or not —
    they cost three reductions inside the jit and are the instrumentation
    the rich25 bimodality hunt needs (no reference counterpart).

    embedding_loss: "Cosine" | "MSE" | "MAE" adds the caption-embedding
    regression term when batches carry ``cap_embeds`` — dec_par ×
    loss(mean+max pooled decoder outputs, caption_embedding)
    (pytorch_runner.py:104-113,324-333).
    """
    from acvae_tpu.ops.masked import max_with_lens, mean_with_lens

    def ce_fn(logits, targets, mask):
        if label_smoothing:
            return label_smoothing_loss(logits, targets, smoothing, mask)
        return cross_entropy(logits, targets, mask)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng,
                ss_ratio, dis_ratio, kl_weight, global_alpha):
        k_sample, k_dropout, k_aug, k_adv = jax.random.split(rng, 4)
        if augment is not None:
            # on-device SpecAugment fused into the step (the reference runs
            # per-sample numpy in DataLoader workers, SURVEY §2.6)
            feats, feat_lens = augment(batch["feats"], batch["feat_lens"],
                                       k_aug)
            batch = dict(batch, feats=feats, feat_lens=feat_lens)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["feats"], batch["feat_lens"],
                batch["caps"], batch["cap_lens"],
                ss_ratio=ss_ratio, dis_ratio=dis_ratio, train=True,
                rngs={"sample": k_sample, "dropout": k_dropout},
                mutable=["batch_stats"])
            L = batch["caps"].shape[1]
            mask = length_mask(batch["cap_lens"] - 1, L - 1)
            if "keep_mask" in batch:
                # AugmentLossWrapper (loss.py:72-94): augmented captions
                # stochastically dropped from the CE; the keep-mask comes
                # precomputed from the host (cap_id "aug" tags + coin), so
                # the jitted loss stays shape-static
                from acvae_tpu.losses.wrappers import augment_loss
                ce = augment_loss(out["logits"], batch["caps"][:, 1:],
                                  batch["cap_lens"] - 1, batch["keep_mask"],
                                  smoothing if label_smoothing else 0.0)
            else:
                ce = ce_fn(out["logits"], batch["caps"][:, 1:], mask)
            metrics = {"ce": ce}
            if "q_means" in out:
                km = mask if kl_mask == "valid" else None
                q_m, q_l = out["q_means"], out["q_logs"]
                p_m, p_l = out["p_means"], out["p_logs"]
                if q_m.ndim < 3:  # SimpleVAE: single global latent per clip
                    km = None
                if p_m.ndim == q_m.ndim + 1:
                    # GMM prior ([K, N, T, E] moments + mixture logits).
                    # The reference defines GMM_kl_loss
                    # (utils/train_util.py:273-291) but its live runner
                    # never wires it; completed here as the standard
                    # mixture upper bound KL(q‖Σcₖpₖ) ≤ Σcₖ·KL(q‖pₖ):
                    # the single-Gaussian posterior broadcasts over K and
                    # both weight arguments get the prior's mixture
                    # logits, zeroing the categorical term.
                    c_p = out["p_mixture_logits"]
                    if free_bits is not None:
                        raise ValueError(
                            "free_bits requires a Normal prior (per-dim KL "
                            "decomposition); the GMM mixture bound has none — "
                            "unset free_bits for GMM-prior configs")
                    kl = gmm_kl_loss(q_m, q_l, c_p, p_m, p_l, c_p, km)
                else:
                    kl = normal_kl_loss(q_m, q_l, p_m, p_l, km)
                    # posterior-collapse instrumentation (see docstring):
                    # per-dim batch-mean KL → active-unit count (>0.01 nat,
                    # Burda et al. 2016), hottest dim, and prior↔posterior
                    # mean agreement.  Device scalars; fetched at epoch end.
                    kl_d = normal_kl_per_dim(q_m, q_l, p_m, p_l, km)
                    metrics["active_units"] = jnp.sum(
                        (kl_d > 0.01).astype(jnp.float32))
                    metrics["kl_dim_max"] = jnp.max(kl_d)
                    qp_sq = jnp.mean((q_m - p_m) ** 2, axis=-1)
                    if km is None:
                        metrics["qp_mse"] = jnp.mean(qp_sq)
                    else:
                        kmf = km.astype(qp_sq.dtype)
                        metrics["qp_mse"] = (jnp.sum(qp_sq * kmf)
                                             / jnp.maximum(jnp.sum(kmf), 1.0))
                    if free_bits is not None:
                        metrics["kl_raw"] = kl
                        kl = jnp.sum(jnp.maximum(kl_d, free_bits))
                loss = ce + kl_weight * kl
                metrics["kl"] = kl
            else:  # plain captioners: CE only (pytorch_runner.py:323-335)
                loss = ce
            if embedding_loss and "cap_embeds" in batch:
                if "seq_outputs" in out:
                    # CaptionSentenceModel head: projected sentence output
                    # (run_sentence.py:208-220 regresses this directly)
                    pooled = out["seq_outputs"]
                else:
                    pooled = (mean_with_lens(out["output"],
                                             batch["cap_lens"] - 1)
                              + max_with_lens(out["output"],
                                              batch["cap_lens"] - 1))
                target = batch["cap_embeds"]
                if pooled.shape[-1] != target.shape[-1]:
                    raise ValueError(
                        f"embedding_loss dimension mismatch: decoder pooled "
                        f"output is {pooled.shape[-1]}-dim but the caption "
                        f"embeddings are {target.shape[-1]}-dim; either match "
                        f"decoder hidden_size to the embeddings or use a "
                        f"model with seq_output_size={target.shape[-1]} "
                        f"(the CaptionSentenceModel projection head, "
                        f"word_model.py:409-438)")
                if embedding_loss == "Cosine":
                    num = jnp.sum(pooled * target, -1)
                    den = jnp.maximum(jnp.linalg.norm(pooled, axis=-1)
                                      * jnp.linalg.norm(target, axis=-1), 1e-8)
                    e_loss = jnp.mean(1.0 - num / den)
                elif embedding_loss == "MAE":
                    e_loss = jnp.mean(jnp.abs(pooled - target))
                else:  # MSE
                    e_loss = jnp.mean((pooled - target) ** 2)
                loss = loss + dec_par * e_loss
                metrics["embed"] = e_loss
            if adversarial is not None:
                if "audio_embeds" not in out:
                    raise ValueError(
                        "adverse_loss requires a model whose train forward "
                        "exposes audio_embeds (the VAECaptionModel family)")
                # AdverseLossWrapper's generator side (loss.py:279-319):
                # + alpha · BCE(D(audio, sampled caption), 1) against a
                # frozen pretrained discriminator (its params are closure
                # constants, so no gradients flow into it).  The reference
                # discards the combined loss when alpha>0 (loss.py:311-315,
                # a documented bug) — here the terms compose.
                from acvae_tpu.losses.wrappers import (_sample_preds,
                                                       bce_logits_loss)
                preds = _sample_preds(
                    out["logits"], adversarial.get("sample_method", "argmax"),
                    k_adv)
                probs = adversarial["apply"](
                    {"audio_feats": out["audio_embeds"],
                     "feats_lens": out["audio_embeds_lens"],
                     "caps": preds, "lens": batch["cap_lens"] - 1})
                adv = bce_logits_loss(probs, jnp.ones(probs.shape))
                loss = loss + adversarial.get("alpha", 1.0) * adv
                metrics["adverse"] = adv
            if alpha is not None and "p_means_utt" in out:
                if global_loss == "MSE":
                    g = jnp.mean((out["q_means_utt"] - out["p_means_utt"]) ** 2)
                else:
                    qm, ql = jnp.split(out["q_means_utt"], 2, -1) \
                        if out.get("q_logs_utt") is None else \
                        (out["q_means_utt"], out["q_logs_utt"])
                    pm, pl = jnp.split(out["p_means_utt"], 2, -1)
                    g = normal_kl_loss(qm, ql, pm, pl)
                loss = loss + global_alpha * g
                metrics["global"] = g
            metrics["loss"] = loss
            # token count of the (global) batch, for epoch-level loss
            # weighting: computed inside the jit so multi-process runs see
            # the same replicated value on every host (a host-side count
            # would weight by the *local* shard only).  Under the augment
            # down-weight path the CE normalizes over KEPT tokens only, so
            # weight by those — otherwise drop-heavy batches skew the
            # logged epoch loss relative to the optimized objective.
            if "keep_mask" in batch:
                metrics["ntokens"] = jnp.sum(
                    mask.astype(jnp.float32) * batch["keep_mask"][:, None])
            else:
                metrics["ntokens"] = jnp.sum(mask)
            return loss, (updates, metrics)

        grads, (updates, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads, updates.get("batch_stats", state.batch_stats))
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, decode_method: str = "beam", beam_size: int = 3,
                   max_length: Optional[int] = None, **decode_kwargs) -> Callable:
    """Jitted validation decode (beam=3 CIDEr selection,
    pytorch_runner_vae.py:344-353)."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_fn(variables, feats, feat_lens, key):
        return model.apply(variables, feats, feat_lens,
                           decode_method=decode_method, beam_size=beam_size,
                           max_length=max_length, rngs={"sample": key},
                           **decode_kwargs)

    return eval_fn


def update_ss_ratio(ss_ratio: float, mode: str, total_iters: int,
                    final_ss_ratio: float = 0.7) -> float:
    """Per-iteration scheduled-sampling decay (pytorch_runner_vae.py:110-116)."""
    if mode == "exponential":
        return ss_ratio * 0.01 ** (1.0 / total_iters)
    if mode == "linear":
        return ss_ratio - (1.0 - final_ss_ratio) / total_iters
    return ss_ratio


def ss_ratio_at(iteration: int, ss0: float, mode: str, total_iters: int,
                final_ss_ratio: float = 0.7) -> float:
    """Closed form of ``iteration`` applications of :func:`update_ss_ratio`
    to ``ss0`` — lets a preempted run resume mid-epoch in O(1) instead of
    replaying the decay loop."""
    if mode == "exponential":
        return ss0 * 0.01 ** (iteration / total_iters)
    if mode == "linear":
        return ss0 - iteration * (1.0 - final_ss_ratio) / total_iters
    return ss0


def dis_ratio_for_epoch(epoch: int, epochs: int, freeze_epoch: int,
                        final_ratio: float) -> float:
    """Prior-grounding ramp (pytorch_runner_vae.py:118-122): 0 until
    freeze_epoch then linear to final_ratio."""
    if epoch <= freeze_epoch:
        return 0.0
    return final_ratio * float(epoch - freeze_epoch) / (epochs - freeze_epoch)


def kl_weight_for_epoch(epoch: int, epochs: int, beta: float) -> float:
    """KL annealing (pytorch_runner_vae.py:286): max(0.5, epoch/epochs · β)."""
    return max(0.5, float(epoch) / epochs * beta)


def kl_weight_schedule(epoch: int, epochs: int, beta: float,
                       mode: str = "reference", cycles: int = 4,
                       ramp: float = 0.5, floor: float = 0.0) -> float:
    """Configurable KL-weight schedules (config key ``kl_anneal``).

    The reference hard-codes ``max(0.5, epoch/epochs · β)``
    (pytorch_runner_vae.py:286) — note its floor 0.5 means the KL weight is
    *constant* at 0.5 for the first half of training when β=0.5, i.e. there
    is effectively no warm-up.  Alternatives for the bimodality hunt:

    * ``reference`` — the reference schedule, exactly.
    * ``linear`` — ``max(floor, epoch/epochs · β)``: a true warm-up when
      floor < 0.5 (Bowman et al. 2016 annealing).
    * ``cyclical`` — Fu et al. 2019 cyclical annealing: split training into
      ``cycles`` equal cycles; within each, ramp linearly from ``floor`` to
      β over the first ``ramp`` fraction, then hold at β.
    * ``constant`` — β throughout.
    """
    if mode == "reference":
        return kl_weight_for_epoch(epoch, epochs, beta)
    if mode == "linear":
        return max(floor, float(epoch) / epochs * beta)
    if mode == "constant":
        return float(beta)
    if mode == "cyclical":
        period = max(1, -(-epochs // max(1, int(cycles))))  # ceil
        tau = ((epoch - 1) % period) / period
        frac = min(1.0, tau / max(ramp, 1e-8))
        return floor + (beta - floor) * frac
    raise ValueError(f"unknown kl_anneal mode {mode!r} "
                     f"(reference|linear|cyclical|constant)")


def parse_kl_anneal(raw) -> dict:
    """Validate the ``kl_anneal`` config value up front (ADVICE r4): it
    must be a mapping over {mode, cycles, ramp, floor} — a typo'd key or a
    bare scalar (``kl_anneal: linear``) would otherwise silently run the
    default schedule or die deep in the epoch loop with a confusing
    ``dict()`` error.  Returns a plain dict safe for ``.get`` defaults."""
    raw = raw or {}
    if not isinstance(raw, dict):
        raise ValueError(
            f"kl_anneal must be a mapping with keys mode/cycles/ramp/floor,"
            f" got {raw!r} — e.g. kl_anneal: {{mode: linear, floor: 0.0}}")
    unknown = set(raw) - {"mode", "cycles", "ramp", "floor"}
    if unknown:
        raise ValueError(f"unknown kl_anneal key(s) {sorted(unknown)}; "
                         f"allowed: mode, cycles, ramp, floor")
    return dict(raw)


