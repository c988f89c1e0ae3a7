"""Serialized AOT decode artifacts (jax.export / StableHLO).

Deployment story the reference lacks entirely (its runners unpickle the
full Python model class — ``runners/base_runner.py:38-115``): the trained
decode program is exported once — weights baked in as constants — to a
self-contained StableHLO artifact that any JAX runtime can deserialize and
call without the model code, config, or checkpoint tree.  This is the
XLA-native analogue of a torchscript/ONNX export.

The batch dimension is exported symbolically when the program supports it
(``jax.export`` shape polymorphism), so one artifact serves any batch size;
mel time stays static (the data pipeline is bucketed anyway —
``DEFAULT_BUCKETS``).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def build_decode_fn(model, variables: Dict[str, Any],
                    decode_dtype: Optional[Any] = None, **decode_kwargs):
    """Decode closure with weights captured as constants; the rng comes in
    as a plain uint32 seed so the artifact's calling convention is
    framework-neutral (no typed PRNG keys in the signature).

    ``decode_dtype`` (e.g. ``jnp.bfloat16``) casts the float params at this
    boundary so the whole decode loop runs in that dtype (ops/amp.py; beam
    scores / log-softmax stay f32).  None keeps the exact f32 default."""
    if decode_dtype is not None:
        from acvae_tpu.ops.amp import cast_floats_for_decode
        variables = cast_floats_for_decode(variables, decode_dtype)

    def decode(feats, feat_lens, seed):
        # feats stay as given (the encoder stem casts to its compute dtype
        # itself; bn0 is f32 either way — use upload_dtype to shrink uploads)
        out = model.apply(variables, feats, feat_lens,
                          rngs={"sample": jax.random.key(seed)},
                          **decode_kwargs)
        # scores ride along so the artifact can feed re-ranking / parity
        # tooling; beam and DBS decodes always produce them
        return {k: out[k] for k in ("seqs", "scores") if k in out}

    return decode


def build_decode_fn_int8(model, variables: Dict[str, Any], quant,
                         **decode_kwargs):
    """Same calling convention, with the int8 serving encoder
    (models/quant.py) baked into the artifact in front of the model's
    decode machinery — the quantized weights/scales become constants, so
    the export IS the quantized deployment."""

    def decode(feats, feat_lens, seed):
        encoded = quant(feats, feat_lens)
        out = model.apply(variables, encoded, apply_ln=True,
                          rngs={"sample": jax.random.key(seed)},
                          method=model.inference_from_encoded,
                          **decode_kwargs)
        return {k: out[k] for k in ("seqs", "scores") if k in out}

    return decode


def export_decode(decode_fn, t_mel: int, n_mels: int,
                  batch: Optional[int] = None,
                  platforms: Optional[list] = None):
    """Export a decode closure (from :func:`build_decode_fn` or
    :func:`build_decode_fn_int8`).  ``batch=None`` tries a symbolic batch
    dimension first and falls back to a static default of 32 if the program
    does not trace under shape polymorphism; returns (exported, batch_desc).
    ``platforms`` lowers for multiple targets in one artifact (e.g.
    ``["cpu", "tpu"]`` — a CPU dev host can produce TPU-servable
    artifacts); default is the exporting process's platform."""
    from jax import export as jexport

    fn = jax.jit(decode_fn)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    kw = {"platforms": platforms} if platforms else {}

    if batch is None:
        try:
            (b,) = jexport.symbolic_shape("b")
            exp = jexport.export(fn, **kw)(
                jax.ShapeDtypeStruct((b, t_mel, n_mels), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.int32), seed_spec)
            return exp, "symbolic"
        except Exception as e:  # program not shape-polymorphic: pin the
            # batch — LOUDLY, because it changes the artifact's contract
            # (serve then forces this batch size); a real lowering error
            # will re-raise identically from the pinned export below
            import logging
            logging.getLogger("acvae_tpu").warning(
                "symbolic-batch export failed (%s: %s); pinning batch=32",
                type(e).__name__, str(e).splitlines()[0][:120])
            batch = 32
    exp = jexport.export(fn, **kw)(
        jax.ShapeDtypeStruct((batch, t_mel, n_mels), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32), seed_spec)
    return exp, str(batch)


def save_exported(exp, out_dir: str, meta: Dict[str, Any]) -> str:
    os.makedirs(out_dir, exist_ok=True)
    blob = exp.serialize()
    path = os.path.join(out_dir, "decode.jaxexport")
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({**meta, "jax_version": jax.__version__,
                   "artifact_bytes": len(blob)}, f, indent=1)
    return path


def load_exported(export_dir: str):
    """(callable, meta): deserialize a saved decode artifact.  The callable
    takes (feats [N, T, F] f32, feat_lens [N] i32, seed uint32-scalar) and
    returns {"seqs": ...} plus "scores" when the exported decode method
    produces them (beam/DBS; greedy/sample artifacts and artifacts exported
    before scores passthrough carry seqs only) — no model code or
    checkpoint needed."""
    from jax import export as jexport

    with open(os.path.join(export_dir, "decode.jaxexport"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(export_dir, "meta.json")) as f:
        meta = json.load(f)
    return exp.call, meta
