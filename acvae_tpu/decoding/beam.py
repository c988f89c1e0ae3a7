"""Batched on-device beam search.

Replaces the reference's instance-by-instance python beam loops
(``models/word_model.py:209-256``, ``models/vae_model.py:220-252``) with one
fully batched search: all instances and beams live in a flat ``[N*B]`` axis,
beam reordering is a gather, and the whole loop jits.

Reference semantics reproduced exactly (SURVEY §7 "beam/DBS parity"):

* ``first_step_row0=True`` (plain captioners, word_model.py:227-228): at t=0
  only row 0's logprobs are expanded (all beams are identical).
  ``False`` (VAE models, vae_model.py:237): flat top-k from step 0 — beams
  already differ because each drew its own prior z.
* ``end_handling=True`` (word_model.py:240-251): a beam emitting ``<end>``
  is recorded as done and its score is killed with −1000; when ``beam_size``
  beams have finished, that instance's search *freezes* (the reference breaks
  out of its loop; we freeze state so extra steps are no-ops).  The returned
  sequences are the live beams at freeze time — exactly what
  ``beamsearch_process`` returns (word_model.py:292-295).
  ``False`` (VAE flavor): no end handling at all; run all steps.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, START_IDX

# step_fn(state, words [NB], t) -> (logits [NB, V], new_state)
StepFn = Callable[[Any, jnp.ndarray, int], Tuple[jnp.ndarray, Any]]


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    beam_size: int
    max_length: int
    start_idx: int = START_IDX
    end_idx: int = END_IDX
    first_step_row0: bool = False
    end_handling: bool = False


def beam_topk(total: jnp.ndarray, k: int,
              impl: str | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the flattened (beam, vocab) axis of ``total [N, B, V]``.

    Returns ``(scores [N, k], flat_idx [N, k])`` — identical (including tie
    order) to ``lax.top_k(total.reshape(N, B*V), k)``.

    ``impl`` (default from ``ACVAE_TOPK``, else ``"flat"``):

    * ``"flat"`` — one ``lax.top_k`` over ``B*V`` columns.
    * ``"two_stage"`` — per-beam top-k over ``V`` first, then top-k over the
      ``B*k`` survivors.  Mathematically identical: any member of the flat
      top-k is beaten by < k elements globally, hence by < k within its own
      beam; and ``lax.top_k`` orders equal scores by ascending index, so the
      stage-2 order (beam, per-beam rank) equals the flat order (beam, vocab)
      on ties too.  Candidate for cutting the widest serial op in the decode
      loop (top-k over ~15k columns at the flagship shapes); kept switchable
      until measured faster on the real chip (docs/pallas_notes.md).
    """
    N, B, V = total.shape
    impl = impl or os.environ.get("ACVAE_TOPK", "flat")
    if impl == "two_stage" and B > 1:
        k1 = min(k, V)  # a beam can contribute at most V candidates
        cand_s, cand_w = jax.lax.top_k(total, k1)             # [N, B, k1]
        scores, idx = jax.lax.top_k(cand_s.reshape(N, B * k1), k)
        beam = idx // k1
        words = jnp.take_along_axis(cand_w.reshape(N, B * k1), idx, axis=1)
        return scores, beam * V + words
    return jax.lax.top_k(total.reshape(N, B * V), k)


def _gather_beams(state, prev_inds: jnp.ndarray, N: int, B: int):
    """Reorder [N*B, ...] pytree leaves along the beam axis by prev_inds [N, B]."""
    def gather(leaf):
        leaf = leaf.reshape((N, B) + leaf.shape[1:])
        idx = prev_inds.reshape((N, B) + (1,) * (leaf.ndim - 2))
        out = jnp.take_along_axis(leaf, idx, axis=1)
        return out.reshape((N * B,) + out.shape[2:])
    return jax.tree_util.tree_map(gather, state)


def _freeze(old, new, stopped: jnp.ndarray, N: int, B: int):
    """Keep `old` wherever `stopped` [N] is True (leaves have leading N*B)."""
    def sel(o, n):
        s = jnp.repeat(stopped, B).reshape((N * B,) + (1,) * (n.ndim - 1))
        return jnp.where(s, o, n)
    return jax.tree_util.tree_map(sel, old, new)


def batched_beam_search(step_fn: StepFn, init_state: Any, batch_size: int,
                        cfg: BeamConfig) -> Dict[str, jnp.ndarray]:
    """Run beam search for all instances at once.

    init_state: pytree with leading dim N*B (already replicated per beam).
    Returns {"seqs": [N, B, T], "scores": [N, B]} with beams in score order
    as maintained by top-k (beam 0 = best live beam).

    The time loop is a ``lax.scan`` over steps 1..T−1 (step 0 runs outside:
    ``first_step_row0`` needs a structurally different top-k) — the compiled
    program holds ONE copy of the step graph instead of T, which cuts the
    flagship decode's cold-compile time ~an order of magnitude (serve first
    launch, export_model lowering).  ``ACVAE_BEAM_LOOP=unroll`` restores the
    python-unrolled loop (token-identical; kept for on-chip A/B).
    """
    N, B, V_end = batch_size, cfg.beam_size, cfg.end_idx
    T = cfg.max_length

    def advance(carry, t, first_step: bool):
        state, words, scores, seqs, done_count, stopped = carry
        logits, new_state = step_fn(state, words, t)
        V = logits.shape[-1]
        # score math is always f32 (a no-op for the default f32 decode; the
        # bf16 decode mode — ops/amp.py — hands bf16 logits in)
        logprobs = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1).reshape(N, B, V)
        total = scores[:, :, None] + logprobs

        if first_step and cfg.first_step_row0:
            top_scores, next_words = jax.lax.top_k(total[:, 0], B)  # [N, B]
            prev_inds = jnp.zeros((N, B), jnp.int32)
        else:
            top_scores, flat_idx = beam_topk(total, B)
            prev_inds = flat_idx // V
            next_words = flat_idx % V

        new_state = _gather_beams(new_state, prev_inds, N, B)
        new_seqs = jnp.take_along_axis(seqs, prev_inds[:, :, None], axis=1)
        new_seqs = new_seqs.at[:, :, t].set(next_words)
        new_words = next_words.reshape(N * B).astype(jnp.int32)

        if cfg.end_handling:
            is_end = next_words == V_end  # [N, B]
            new_done = done_count + jnp.sum(is_end, axis=1, dtype=jnp.int32)
            new_scores = jnp.where(is_end, top_scores - 1000.0, top_scores)
        else:
            new_done = done_count
            new_scores = top_scores

        # freeze instances whose search already stopped
        state = _freeze(state, new_state, stopped, N, B)
        seqs = jnp.where(stopped[:, None, None], seqs, new_seqs)
        scores = jnp.where(stopped[:, None], scores, new_scores)
        words = jnp.where(jnp.repeat(stopped, B), words, new_words)
        done_count = jnp.where(stopped, done_count, new_done)
        if cfg.end_handling:
            stopped = stopped | (done_count >= B)
        return (state, words, scores, seqs, done_count, stopped)

    carry = (init_state,
             jnp.full((N * B,), cfg.start_idx, jnp.int32),
             jnp.zeros((N, B)),
             jnp.full((N, B, T), V_end, jnp.int32),
             jnp.zeros((N,), jnp.int32),
             jnp.zeros((N,), bool))
    if os.environ.get("ACVAE_BEAM_LOOP") == "unroll":
        for t in range(T):
            carry = advance(carry, t, t == 0)
    else:
        carry = advance(carry, 0, True)
        if T > 1:
            carry, _ = jax.lax.scan(
                lambda c, t: (advance(c, t, False), None),
                carry, jnp.arange(1, T))
    _, _, scores, seqs, _, _ = carry
    return {"seqs": seqs, "scores": scores}
