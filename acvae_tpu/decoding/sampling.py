"""Next-word sampling — batched, on-device.

Equivalent of ``CaptionModel.sample_next_word`` (``models/word_model.py:173-207``):
greedy argmax, gumbel perturbation, or temperature multinomial.  All methods
return (word [N], logprob-of-word [N]) and are jit/scan friendly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_next_word(logits: jnp.ndarray, key: jax.Array, method: str = "greedy",
                     temp: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits: [N, V] -> (word [N] int32, logprob [N]).

    * ``greedy``: argmax of log-softmax (word_model.py:178-179).
    * ``gumbel``: argmax of gumbel-perturbed logprobs; reported logprob is the
      unperturbed one (word_model.py:188-197).
    * ``sample``: multinomial over exp(logprobs / temp) — i.e. categorical with
      temperature applied to *logprobs* (word_model.py:198-203).
    """
    # always f32: sampling probabilities / reported logprobs keep full
    # precision even under the bf16 decode mode (ops/amp.py)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if method == "greedy":
        w = jnp.argmax(logprobs, axis=-1)
    elif method == "gumbel":
        # argmax of log_softmax((logprobs + g)/temp) == argmax(logprobs + g)
        g = jax.random.gumbel(key, logprobs.shape, logprobs.dtype)
        w = jnp.argmax(logprobs + g, axis=-1)
    elif method == "sample":
        w = jax.random.categorical(key, logprobs / temp, axis=-1)
    else:
        raise ValueError(f"unknown sampling method {method!r}")
    lp = jnp.take_along_axis(logprobs, w[:, None], axis=-1)[:, 0]
    return w.astype(jnp.int32), lp
