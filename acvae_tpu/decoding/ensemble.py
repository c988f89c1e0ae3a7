"""Ensemble decoding: probability-averaged greedy / beam search across models.

Equivalent of ``BaseRunner.ensemble`` (``runners/base_runner.py:397-694``):
each member model runs its own per-step computation; the next-word
distribution is the mean of the members' softmax outputs.  Here every member
contributes a step function over the shared flat [N(*B)] word axis, and the
whole ensemble loop is one jitted program.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from acvae_tpu import END_IDX, START_IDX
from acvae_tpu.decoding.beam import BeamConfig, batched_beam_search

StepFn = Callable[[Any, jnp.ndarray, int], Tuple[jnp.ndarray, Any]]


def _mean_logprobs(logits_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """log of the members' mean probability (base_runner.py:520-530 averages
    probs, not logits)."""
    probs = sum(jax.nn.softmax(l, axis=-1) for l in logits_list)
    return jnp.log(probs / len(logits_list) + 1e-12)


def ensemble_greedy(step_fns: List[StepFn], init_states: List[Any],
                    batch_size: int, max_length: int,
                    start_idx: int = START_IDX,
                    end_idx: int = END_IDX) -> Dict[str, jnp.ndarray]:
    """Prob-averaged greedy decode."""
    def body(carry, t):
        words, finished, seqs, states = carry
        logits_list, new_states = [], []
        for m, fn in enumerate(step_fns):
            logits_m, s_m = fn(states[m], words, t)
            logits_list.append(logits_m)
            new_states.append(s_m)
        logprobs = _mean_logprobs(logits_list)
        w_t = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        w_t = jnp.where(finished, end_idx, w_t)
        finished = finished | (w_t == end_idx)
        seqs = seqs.at[:, t].set(w_t)
        return (w_t, finished, seqs, tuple(new_states)), None

    carry = (jnp.full((batch_size,), start_idx, jnp.int32),
             jnp.zeros((batch_size,), bool),
             jnp.full((batch_size, max_length), end_idx, jnp.int32),
             tuple(init_states))
    (_, _, seqs, _), _ = jax.lax.scan(body, carry, jnp.arange(max_length))
    return {"seqs": seqs}


def ensemble_beam(step_fns: List[StepFn], init_states: List[Any],
                  batch_size: int, cfg: BeamConfig) -> Dict[str, jnp.ndarray]:
    """Prob-averaged batched beam search — a thin wrapper over the shared
    engine (``decoding.beam.batched_beam_search``): the combined step
    returns the log-mean-probability as its "logits" and carries the member
    states as one tuple pytree.  The engine's log_softmax re-normalization
    subtracts only the +1e-12-epsilon row constant (~V·1e-12), which cannot
    change top-k order or beam comparisons."""

    def step_fn(states, words, t):
        logits_list, new_states = [], []
        for m, fn in enumerate(step_fns):
            logits_m, s_m = fn(states[m], words, t)
            logits_list.append(logits_m)
            new_states.append(s_m)
        return _mean_logprobs(logits_list), tuple(new_states)

    return batched_beam_search(step_fn, tuple(init_states), batch_size, cfg)


def ensemble_decode(members: List[Tuple[Any, Any]], feats: jnp.ndarray,
                    feat_lens: jnp.ndarray, key: jax.Array,
                    decode_method: str = "beam", beam_size: int = 3,
                    max_length: int = 20) -> Dict[str, jnp.ndarray]:
    """High-level ensemble decode over (model, variables) pairs.

    Each member encodes independently; per-step next-word distributions are
    averaged.  Members draw independent prior noise (like independent
    reference models would).
    """
    N = feats.shape[0]
    B = beam_size if decode_method == "beam" else 1
    NB = N * B
    step_fns, init_states = [], []
    for m, (model, variables) in enumerate(members):
        encoded = model.apply(variables, feats, feat_lens, train=False,
                              method=model.encode)
        # ctx stays per-instance: AdditiveAttention folds the beam axis
        # from the [N*B] queries (models/attention.py)
        ctx = model.apply(variables, encoded, method=model.decode_ctx)
        state0 = model.apply(variables, NB, method=model.init_decode_state)
        E = model.decoder.embed_size
        eps = jax.random.normal(jax.random.fold_in(key, m),
                                (max_length, NB, E))

        def make_fn(model=model, variables=variables, ctx=ctx, eps=eps):
            def fn(state, words, t):
                return model.apply(variables, ctx, state, words, eps[t],
                                   method=model.decode_step_api)
            return fn

        step_fns.append(make_fn())
        init_states.append(state0)

    if decode_method == "beam":
        # reference ensemble beam (base_runner.py:681-684): at t=0 only row
        # 0's logprobs are expanded (logprobs_t[0].topk — all beams are
        # identical), and there is NO end handling (no -1000 kill, no done
        # count; the loop always runs max_length steps).  first_step_row0
        # must be True or deterministic members degenerate to B copies of
        # the greedy path.
        cfg = BeamConfig(beam_size=B, max_length=max_length,
                         first_step_row0=True, end_handling=False)
        return ensemble_beam(step_fns, init_states, N, cfg)
    return ensemble_greedy(step_fns, init_states, N, max_length)
