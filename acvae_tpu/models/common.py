"""Shared helpers for flax modules that scan over time."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def scan_or_init(module: nn.Module, step, carry, xs, length: int):
    """``lax.scan``, except while `module` is initializing run the body once
    eagerly (flax cannot create variables inside lax control flow) and
    broadcast the outputs to the scanned shape."""
    if module.is_initializing():
        xs0 = jax.tree_util.tree_map(lambda a: a[0], xs)
        carry, ys0 = step(carry, xs0)
        ys = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (length,) + a.shape), ys0)
        return carry, ys
    return jax.lax.scan(step, carry, xs)


def eps_stack(key, steps: int, rows: int, dim: int, dtype=None):
    """[steps, rows, dim] standard normals, drawn per step (split + vmap).

    A single ``normal(key, (steps, rows, dim))`` draw indexes elements by
    flat position, so the values assigned to a given (step, row) depend on
    ``rows`` — padding a batch would silently change every real row's noise
    from step 1 on.  Splitting per step makes the leading rows invariant to
    the batch size: padded / mesh-sharded decodes are token-identical to
    the unpadded decode.

    ``dtype``: always drawn in f32 (same underlying samples in every mode)
    then cast, so a bf16 decode (ops/amp.py) sees the f32 noise rounded
    rather than a different sample stream."""
    eps = jax.vmap(lambda k: jax.random.normal(k, (rows, dim)))(
        jax.random.split(key, steps))
    return eps if dtype is None else eps.astype(dtype)
