"""Per-scheme int8 decode throughput, drift-controlled (VERDICT r2 task 1).

One process builds the flagship + the int8 serving encoder under every
scheme (models/quant.py SCHEMES) plus the bf16-encoder baseline, warms all
programs, then interleaves the arms round-robin — the tunnel's minute-scale
throughput drift (CLAUDE.md) hits every arm equally, so the RATIOS are
trustworthy even when absolute numbers wander.

Pairs with the accuracy A/B (``cli evaluate --encoder_int8
--int8_scheme=...`` on the held-out test set) to fill the RESULTS table
scheme -> (CIDEr delta, captions/s) that decides the serving default.

Usage (real chip): python tools/probe_int8_schemes.py [rounds]
CPU smoke: PROBE_N=4 PROBE_T=64 JAX_PLATFORMS=cpu python tools/probe_int8_schemes.py 1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acvae_tpu.core.devprobe import apply_jax_platforms_env

apply_jax_platforms_env(label="probe_int8_schemes")

import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", 512))
T_MEL = int(os.environ.get("PROBE_T", 1024))
F_MEL = 64
VOCAB = 4981
BEAM = 3
MAX_LEN = 20
ITERS = int(os.environ.get("PROBE_ITERS", 4))  # batches per arm per round


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from __graft_entry__ import _build_flagship
    from acvae_tpu.models.quant import (int8_decode_fn, quant_encoder_for,
                                        scheme_kwargs)
    from acvae_tpu.ops.amp import cast_floats_for_decode

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(N, T_MEL, F_MEL)).astype(np.float32))
    feat_lens = jnp.full((N,), T_MEL, jnp.int32)
    fi = jnp.asarray(rng.normal(size=(8, 256, F_MEL)).astype(np.float32))

    def init(model):
        return model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            fi, jnp.full((8,), 256, jnp.int32),
            jnp.ones((8, 22), jnp.int32), jnp.full((8,), 22, jnp.int32),
            train=False)

    arms = {}

    # bf16-encoder baseline (the pre-int8 serving configuration)
    model_bf = _build_flagship(vocab_size=VOCAB, enc_dtype=jnp.bfloat16)
    var_bf = init(model_bf)

    @jax.jit
    def decode_bf(variables, feats, feat_lens, key):
        return model_bf.apply(variables, feats, feat_lens,
                              decode_method="beam", beam_size=BEAM,
                              max_length=MAX_LEN, rngs={"sample": key})

    arms["bf16"] = (decode_bf, var_bf)

    model = _build_flagship(vocab_size=VOCAB)
    var = init(model)
    for scheme in ("v1", "v2", "v2sym", "v3"):
        quant = quant_encoder_for({"encodermodel": "Cnn10"}, model,
                                  var["params"], var["batch_stats"],
                                  **scheme_kwargs(scheme))
        arms[scheme] = (int8_decode_fn(model, quant, decode_method="beam",
                                       beam_size=BEAM, max_length=MAX_LEN),
                        var)

    # warm every program before any timing
    for name, (fn, v) in arms.items():
        t0 = time.perf_counter()
        np.asarray(fn(v, feats, feat_lens, jax.random.key(2))["seqs"])
        print(f"# warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    totals = {k: [] for k in arms}
    names = list(arms)
    for r in range(rounds):
        # rotate arm order per round: a fixed order lets any monotonic
        # within-round drift bias the last arm consistently (observed as a
        # spurious ~4% v3-under-v2sym read in round 3 — pallas_notes)
        order = names[r % len(names):] + names[: r % len(names)]
        for name in order:
            fn, v = arms[name]
            t0 = time.perf_counter()
            outs = [fn(v, feats, feat_lens, jax.random.key(100 + 10 * r + i))
                    for i in range(ITERS)]
            for o in outs:
                np.asarray(o["seqs"])
            dt = time.perf_counter() - t0
            totals[name].append(N * ITERS / dt)
            print(f"# r{r} {name}: {N * ITERS / dt:.0f} captions/s",
                  flush=True)

    import json
    best_base = max(totals["bf16"])
    out = {}
    for name, vals in totals.items():
        out[name] = {"captions_per_sec_best": max(vals),
                     "captions_per_sec_median": sorted(vals)[len(vals) // 2],
                     "vs_bf16": max(vals) / best_base}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
