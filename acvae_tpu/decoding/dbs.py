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
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, START_IDX
from acvae_tpu.decoding.beam import _gather_beams, beam_topk


def dbs_bdash(beam_size: int, group_size: int) -> int:
    """Beams per group, with the validation every DBS entry point needs
    BEFORE sizing its state (a zero-width beam axis otherwise dies deep in
    a scan trace).  The reference floors non-divisible sizes the same way
    (word_model.py:314 ``bdash = beam_size // group_size``)."""
    if group_size < 1:
        raise ValueError(f"dbs needs group_size >= 1, got {group_size}")
    bdash = beam_size // group_size
    if bdash < 1:
        raise ValueError(
            f"dbs needs beam_size >= group_size (got beam_size={beam_size}, "
            f"group_size={group_size} -> {bdash} beams per group); pass "
            "e.g. --beam_size=8 --group_size=4")
    return bdash


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
    bdash = dbs_bdash(cfg.beam_size, G)
    T = cfg.max_length
    CAP = bdash * T  # max done-beams a group can record

    step_fns = [make_step_fn(g) for g in range(G)]

    def advance(carry, t):
        """One global timestep: every group steps, inactive groups (t < g or
        t > T+g−1) compute-and-freeze.  The time loop is a ``lax.scan``
        (ONE copy of the G step graphs in the HLO instead of T+G−1 — the
        unrolled DBS program held ~(T+G−1)·G step graphs and dominated
        cold-compile time); ``t`` is traced, so the staggering (``lt = t−g``),
        the local-step-0 top-k and the final-step force-record become
        masked/`lax.cond` selections instead of python branches.  Groups run
        in order inside the body so group g sees earlier groups' tokens
        updated at this same t (the Hamming coupling, word_model.py:298-312).
        Cost of the masking: inactive groups still execute their step —
        G·(G−1) extra step executions over the whole search (~15% at
        G=4, T=20) traded for the ~(T+G−1)× smaller program.
        """
        states, words, scores, seqs, done_scores, done_seqs, done_count = carry
        states, words, scores, seqs = (list(states), list(words),
                                       list(scores), list(seqs))
        for g in range(G):
            lt = t - g  # local position within group g's sequence (traced)
            active = (lt >= 0) & (lt <= T - 1)
            lt_c = jnp.clip(lt, 0, T - 1)  # safe index while inactive
            logits, new_state = step_fns[g](states[g], words[g], t)
            V = logits.shape[-1]
            # score math always f32 (bf16 decode mode hands bf16 logits in)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp = jax.nn.log_softmax(lp / cfg.temperature, axis=-1)
            lp = lp.reshape(N, bdash, V)
            if g > 0:
                # Hamming penalty from earlier groups' tokens at position lt
                change = jnp.zeros((N, V))
                for prev in range(g):
                    tok = jnp.take(seqs[prev], lt_c, axis=2)  # [N, bdash]
                    change = change + jnp.sum(
                        jax.nn.one_hot(tok, V), axis=1)
                lp = lp - cfg.diversity_lambda * change[:, None, :]
            total = scores[g][:, :, None] + lp

            def first_step():
                ts, nw = jax.lax.top_k(total[:, 0], bdash)
                return ts, jnp.zeros((N, bdash), jnp.int32), nw

            def later_step():
                ts, flat_idx = beam_topk(total, bdash)
                return ts, flat_idx // V, flat_idx % V

            top_scores, prev_inds, next_words = jax.lax.cond(
                lt_c == 0, first_step, later_step)

            new_state = _gather_beams(new_state, prev_inds, N, bdash)
            new_seqs = jnp.take_along_axis(seqs[g], prev_inds[:, :, None],
                                           axis=1)
            new_seqs = new_seqs.at[:, :, lt_c].set(next_words)
            new_words = next_words.reshape(N * bdash).astype(jnp.int32)

            is_end = next_words == cfg.end_idx
            # force-record every beam at the final local step (t == T+g−1)
            is_end = is_end | (lt_c == T - 1)
            is_end = is_end & active  # inactive groups record nothing
            norm_scores = top_scores / (lt_c + 1)

            # record ending beams into the done store (static loop over bdash)
            prior_ends = jnp.zeros((N,), jnp.int32)
            for b in range(bdash):
                slot = done_count[:, g] + prior_ends  # [N]
                write = is_end[:, b]
                oh = (jax.nn.one_hot(slot, CAP, dtype=bool)
                      & write[:, None])  # [N, CAP]
                ds_g = jnp.where(oh, norm_scores[:, b:b + 1], done_scores[:, g])
                done_scores = done_scores.at[:, g].set(ds_g)
                dq_g = jnp.where(oh[:, :, None], new_seqs[:, b:b + 1, :],
                                 done_seqs[:, g])
                done_seqs = done_seqs.at[:, g].set(dq_g)
                prior_ends = prior_ends + write.astype(jnp.int32)
            done_count = done_count.at[:, g].add(
                jnp.sum(is_end, axis=1, dtype=jnp.int32))
            new_scores = jnp.where(is_end, top_scores - 1000.0, top_scores)

            # freeze everything while this group is inactive
            states[g] = jax.tree_util.tree_map(
                lambda n, o: jnp.where(active, n, o), new_state, states[g])
            seqs[g] = jnp.where(active, new_seqs, seqs[g])
            words[g] = jnp.where(active, new_words, words[g])
            scores[g] = jnp.where(active, new_scores, scores[g])
        return (tuple(states), tuple(words), tuple(scores), tuple(seqs),
                done_scores, done_seqs, done_count), None

    carry = (tuple(make_init_state() for _ in range(G)),
             tuple(jnp.full((N * bdash,), cfg.start_idx, jnp.int32)
                   for _ in range(G)),
             tuple(jnp.zeros((N, bdash)) for _ in range(G)),
             tuple(jnp.full((N, bdash, T), cfg.end_idx, jnp.int32)
                   for _ in range(G)),
             jnp.full((N, G, CAP), -jnp.inf),
             jnp.full((N, G, CAP, T), cfg.end_idx, jnp.int32),
             jnp.zeros((N, G), jnp.int32))
    carry, _ = jax.lax.scan(advance, carry, jnp.arange(T + G - 1))
    _, _, _, _, done_scores, done_seqs, done_count = carry

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
