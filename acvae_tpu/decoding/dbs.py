"""Batched diverse beam search (DBS).

Replaces the reference's per-instance python DBS
(``models/word_model.py:297-394``) with a batched implementation.  Reference
semantics reproduced:

* ``bdash = beam_size // group_size`` beams per group; group g starts at
  timestep g (staggered), so its *local* position is ``t - g``.
* Hamming diversity penalty (``add_diversity``, word_model.py:298-312):
  group g's logprobs at local position p are penalized by
  ``diversity_lambda ×`` (count of tokens earlier groups chose at *their*
  position p), accumulated over all their beams — a scatter-add that
  becomes a one-hot sum here.
* Double log-softmax with temperature (word_model.py:351-352).
* Local-step-0 expands row 0 only (word_model.py:355-357).
* Beams emitting ``<end>`` are recorded as done with score normalized by
  local length (word_model.py:375-382), then killed with −1000; at the last
  local step every beam is force-recorded.
* Output: per group the done beams sorted by score; all ``bdash`` per group if
  ``group_nbest`` else the top-1 of each group (word_model.py:385-392).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, START_IDX
from acvae_tpu.decoding.beam import _gather_beams, beam_topk


@dataclasses.dataclass(frozen=True)
class DBSConfig:
    beam_size: int
    group_size: int
    max_length: int
    diversity_lambda: float = 0.5
    temperature: float = 1.0
    group_nbest: bool = True
    start_idx: int = START_IDX
    end_idx: int = END_IDX


def diverse_beam_search(make_step_fn: Callable[[int], Any],
                        make_init_state: Callable[[], Any],
                        batch_size: int, cfg: DBSConfig) -> Dict[str, jnp.ndarray]:
    """make_step_fn(g) -> step_fn(state, words [N*bdash], t) -> (logits, state).

    Each group gets its own step_fn so randomness (e.g. prior z draws) can
    differ per group.  Returns {"seqs": [N, out, T]} with
    out = beam_size (group_nbest) or group_size.
    """
    N = batch_size
    G = cfg.group_size
    bdash = cfg.beam_size // G
    T = cfg.max_length
    CAP = bdash * T  # max done-beams a group can record

    step_fns = [make_step_fn(g) for g in range(G)]
    states = [make_init_state() for _ in range(G)]
    words = [jnp.full((N * bdash,), cfg.start_idx, jnp.int32) for _ in range(G)]
    scores = [jnp.zeros((N, bdash)) for _ in range(G)]
    seqs = [jnp.full((N, bdash, T), cfg.end_idx, jnp.int32) for _ in range(G)]
    done_scores = jnp.full((N, G, CAP), -jnp.inf)
    done_seqs = jnp.full((N, G, CAP, T), cfg.end_idx, jnp.int32)
    done_count = jnp.zeros((N, G), jnp.int32)

    for t in range(T + G - 1):
        for g in range(G):
            if not (g <= t <= T + g - 1):
                continue
            lt = t - g  # local position within group g's sequence
            logits, new_state = step_fns[g](states[g], words[g], t)
            V = logits.shape[-1]
            lp = jax.nn.log_softmax(logits, axis=-1)
            lp = jax.nn.log_softmax(lp / cfg.temperature, axis=-1)
            lp = lp.reshape(N, bdash, V)
            if g > 0:
                # Hamming penalty from earlier groups' tokens at position lt
                change = jnp.zeros((N, V))
                for prev in range(g):
                    change = change + jnp.sum(
                        jax.nn.one_hot(seqs[prev][:, :, lt], V), axis=1)
                lp = lp - cfg.diversity_lambda * change[:, None, :]
            total = scores[g][:, :, None] + lp
            if lt == 0:
                top_scores, next_words = jax.lax.top_k(total[:, 0], bdash)
                prev_inds = jnp.zeros((N, bdash), jnp.int32)
            else:
                top_scores, flat_idx = beam_topk(total, bdash)
                prev_inds = flat_idx // V
                next_words = flat_idx % V

            states[g] = _gather_beams(new_state, prev_inds, N, bdash)
            seqs[g] = jnp.take_along_axis(seqs[g], prev_inds[:, :, None], axis=1)
            seqs[g] = seqs[g].at[:, :, lt].set(next_words)
            words[g] = next_words.reshape(N * bdash).astype(jnp.int32)

            is_end = next_words == cfg.end_idx
            if t == T + g - 1:  # force-record every beam at the final step
                is_end = jnp.ones_like(is_end)
            norm_scores = top_scores / (lt + 1)

            # record ending beams into the done store (static loop over bdash)
            prior_ends = jnp.zeros((N,), jnp.int32)
            for b in range(bdash):
                slot = done_count[:, g] + prior_ends  # [N]
                write = is_end[:, b]
                oh = (jax.nn.one_hot(slot, CAP, dtype=bool)
                      & write[:, None])  # [N, CAP]
                ds_g = jnp.where(oh, norm_scores[:, b:b + 1], done_scores[:, g])
                done_scores = done_scores.at[:, g].set(ds_g)
                dq_g = jnp.where(oh[:, :, None], seqs[g][:, b:b + 1, :],
                                 done_seqs[:, g])
                done_seqs = done_seqs.at[:, g].set(dq_g)
                prior_ends = prior_ends + write.astype(jnp.int32)
            done_count = done_count.at[:, g].add(
                jnp.sum(is_end, axis=1, dtype=jnp.int32))
            scores[g] = jnp.where(is_end, top_scores - 1000.0, top_scores)

    # assemble output: sort each group's done beams by score desc
    order = jnp.argsort(-done_scores, axis=-1)  # [N, G, CAP]
    top = bdash if cfg.group_nbest else 1
    sel = order[..., :top]  # [N, G, top]
    out_seqs = jnp.take_along_axis(
        done_seqs, sel[..., None], axis=2)  # [N, G, top, T]
    out_scores = jnp.take_along_axis(done_scores, sel, axis=2)
    out_seqs = out_seqs.reshape(N, G * top, T)
    out_scores = out_scores.reshape(N, G * top)
    return {"seqs": out_seqs, "scores": out_scores}
