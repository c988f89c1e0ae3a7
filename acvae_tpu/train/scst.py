"""SCST / N-SCST reinforcement fine-tuning.

TPU-native equivalent of ``models/seq_train_model.py`` (ScstWrapper /
NScstWrapper) + ``runners/run_scst.py`` / the pyc-only
``pytorch_runner_vae_nsc``:

* **rollout** (jitted, on device): multinomial sample rollout, plus a greedy
  baseline rollout for plain SCST (seq_train_model.py:29-45) or ``sample_n``
  replicas per clip for N-SCST with a leave-one-out mean baseline
  (seq_train_model.py:95-165, utils/train_util.py:303-323);
* **reward** (host, batched once per step): CIDEr over the decoded strings —
  the only host↔device crossing per step (SURVEY §7);
* **replay grad step** (jitted): re-run the decode with the *same rng key*
  feeding the sampled words (``forced_decode``), which reproduces the rollout
  exactly, then apply the policy-gradient loss (utils/train_util.py:344-413).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from acvae_tpu import END_IDX
from acvae_tpu.evaluation.coco import CiderScorer
from acvae_tpu.ops.losses import scst_loss
from acvae_tpu.train.trainer import TrainState


def make_rollout(model, sample_n: int = 1, max_length: int = 20,
                 temp: float = 1.0) -> Callable:
    """Jitted rollout: sampled seqs (+ greedy baseline when sample_n == 1)."""

    @jax.jit
    def rollout(variables, feats, feat_lens, key):
        if sample_n > 1:
            feats_r = jnp.repeat(feats, sample_n, axis=0)
            lens_r = jnp.repeat(feat_lens, sample_n, axis=0)
        else:
            feats_r, lens_r = feats, feat_lens
        sampled = model.apply(variables, feats_r, lens_r,
                              decode_method="sample", max_length=max_length,
                              temp=temp, rngs={"sample": key})
        out = {"sampled_seqs": sampled["seqs"]}
        if sample_n == 1:
            greedy = model.apply(variables, feats, feat_lens,
                                 decode_method="greedy",
                                 max_length=max_length,
                                 rngs={"sample": jax.random.fold_in(key, 1)})
            out["greedy_seqs"] = greedy["seqs"]
        return out

    return rollout


def decode_strings(seqs: np.ndarray, vocabulary) -> List[str]:
    return [" ".join(vocabulary.decode(s)) for s in seqs]


def batch_cider(hyps: List[str], keys: List[str],
                key2refs: Dict[str, List[str]],
                dedup: bool = True) -> np.ndarray:
    """Per-sample CIDEr (utils/score_util.py:5-96).

    dedup=True mirrors ``compute_batch_score``: only the first hypothesis per
    key is scored, duplicates share its score.  dedup=False mirrors
    ``compur_batch_score_samplen`` (one entry per sample)."""
    gts, res, order = {}, {}, []
    for i, (h, k) in enumerate(zip(hyps, keys)):
        slot = k if dedup else f"{k}#{i}"
        if slot in res:
            order.append(slot)
            continue
        res[slot] = [h]
        gts[slot] = key2refs[k]
        order.append(slot)
    _, per = CiderScorer().compute_score(gts, res)
    slot2score = dict(zip(gts.keys(), per))
    return np.asarray([slot2score[s] for s in order], np.float32)


def scst_reward(sampled: np.ndarray, greedy: Optional[np.ndarray],
                keys: List[str], key2refs: Dict[str, List[str]],
                vocabulary, sample_n: int = 1) -> Dict[str, np.ndarray]:
    """Advantage per sampled rollout."""
    if sample_n == 1:
        s = batch_cider(decode_strings(sampled, vocabulary), keys, key2refs)
        g = batch_cider(decode_strings(greedy, vocabulary), keys, key2refs)
        return {"reward": s - g, "score": s}
    keys_r = [k for k in keys for _ in range(sample_n)]
    s = batch_cider(decode_strings(sampled, vocabulary), keys_r, key2refs,
                    dedup=False).reshape(-1, sample_n)
    # leave-one-out baseline (train_util.py:317-319)
    baseline = (s.sum(1, keepdims=True) - s) / (s.shape[1] - 1)
    return {"reward": (s - baseline).reshape(-1), "score": s.reshape(-1)}


def make_scst_step(model, sample_n: int = 1, donate: bool = False) -> Callable:
    """Jitted replay + policy-gradient update.

    donate=False by default: the initial state may alias externally held
    variables (donation would invalidate them)."""

    def step_fn(state: TrainState, feats, feat_lens, sampled_seqs, reward,
                key):
        if sample_n > 1:
            feats = jnp.repeat(feats, sample_n, axis=0)
            feat_lens = jnp.repeat(feat_lens, sample_n, axis=0)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, feat_lens, sampled_seqs,
                method=model.forced_decode, rngs={"sample": key})
            return scst_loss(out["sampled_logprobs"], sampled_seqs, reward,
                             END_IDX)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads, state.batch_stats)
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def scst_train_step(state, rollout, scst_step, variables_fn, batch, keys,
                    key2refs, vocabulary, rng, sample_n: int = 1):
    """One full SCST iteration: rollout → host reward → replay update."""
    variables = variables_fn(state)
    feats = jnp.asarray(batch.feats)
    feat_lens = jnp.asarray(batch.feat_lens)
    out = rollout(variables, feats, feat_lens, rng)
    sampled = np.asarray(out["sampled_seqs"])
    greedy = np.asarray(out["greedy_seqs"]) if sample_n == 1 else None
    rs = scst_reward(sampled, greedy, keys, key2refs, vocabulary, sample_n)
    state, metrics = scst_step(state, feats, feat_lens,
                               jnp.asarray(sampled),
                               jnp.asarray(rs["reward"]), rng)
    metrics["reward"] = float(np.mean(rs["reward"]))
    metrics["score"] = float(np.mean(rs["score"]))
    return state, metrics
