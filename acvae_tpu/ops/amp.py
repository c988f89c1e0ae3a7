"""Mixed-precision helpers: cast a variables pytree for bf16 decode.

The decode loop's serial ops (prior LSTM, decoder GRU, dual attention,
vocab classifier) run ~2-4× cheaper in bfloat16 on the MXU — the per-
component slope probes measured the f32 LSTM at 1.32 ms/step vs ~0.03 in
bf16 and the classifier+top-k stage at 0.82 vs 0.32 (tools/probe_decode.py
``slope``, docs/pallas_notes.md).  ``cast_floats_for_decode`` is the single
lever: cast every float *param* to bf16 at the decode jit boundary and let
dtype promotion carry it through the step (the models' state/eps/zero
initializers all follow the encoder-output dtype).

Score-sensitive math stays f32 regardless: the beam/DBS engines and
``sample_next_word`` log-softmax the logits in float32
(decoding/beam.py, decoding/dbs.py, decoding/sampling.py), and beam score
accumulation was always float32.

``batch_stats`` are left in f32: BatchNorm folds them with f32 compute in
the mel-domain ``bn0`` (encoders.py), and they sit outside the serial
decode chain — casting them buys nothing and rounds the normalization.

Token-level caveat: bf16 decode is NOT token-identical to the f32 decode
(≈8-bit mantissa rounding flips near-ties in argmax/top-k); caption quality
is unchanged at the corpus level (RESULTS.md "bf16 decode A/B").  The f32
path remains the default and keeps its exact-parity guarantees.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_F32_COLLECTIONS = ("batch_stats",)


def cast_floats(tree: Any, dtype: Any) -> Any:
    """Cast every inexact-dtype leaf of ``tree`` to ``dtype``."""
    dtype = jnp.dtype(dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        else x, tree)


def cast_floats_for_decode(variables: Dict[str, Any], dtype: Any) -> Dict[str, Any]:
    """Cast a flax variables dict's float collections to ``dtype``, keeping
    ``batch_stats`` in float32 (see module docstring)."""
    return {col: (v if col in _F32_COLLECTIONS else cast_floats(v, dtype))
            for col, v in variables.items()}


def resolve_decode_dtype(conf_value: Any = None):
    """Resolve a decode dtype from a config value or the
    ``ACVAE_DECODE_DTYPE`` env var.  Returns a jnp dtype or None (= keep
    float32, the exact default)."""
    import os
    v = conf_value if conf_value not in (None, "") else \
        os.environ.get("ACVAE_DECODE_DTYPE", "")
    if not v or str(v) == "float32":
        return None
    return jnp.dtype(str(v))
