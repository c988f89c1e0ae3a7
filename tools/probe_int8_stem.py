"""Encoder-only int8 probe with stagewise attribution (VERDICT r3 task 3).

Arms, interleaved with per-round order rotation (the pallas_notes drift
lesson — never trust a fixed arm order on the tunneled runtime):

* ``bf16``  — the bf16 Cnn10 encoder forward (the serving baseline);
* ``int8``  — the round-4 int8 v2sym composite (fused stem quantizer +
  relu-folded symmetric requantize, models/quant.py);
* ``int8_v3`` — same runtime program, v3 bake (sanity: should tie int8).

Then a stagewise pass over the int8 encoder: truncated programs ending at
stem / each block / the head, each reduced to a scalar on device (a FULL
tensor sum — output-slicing would let XLA narrow the convs,
docs/pallas_notes.md "measurement pitfall") so the per-stage deltas
attribute the composite's time without shipping activations over the
tunnel.

Usage (real chip): python tools/probe_int8_stem.py [rounds]
CPU smoke: PROBE_N=4 PROBE_T=128 JAX_PLATFORMS=cpu python tools/probe_int8_stem.py 1
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acvae_tpu.core.devprobe import apply_jax_platforms_env

apply_jax_platforms_env(label="probe_int8_stem")

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("PROBE_N", 512))
T_MEL = int(os.environ.get("PROBE_T", 1024))
F_MEL = 64
CH = (64, 128, 256, 512)
ITERS = int(os.environ.get("PROBE_ITERS", 4))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from acvae_tpu.models.encoders import Cnn10
    from acvae_tpu.models.quant import QuantPannEncoder, scheme_kwargs

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(N, T_MEL, F_MEL)).astype(np.float32))
    feat_lens = jnp.full((N,), T_MEL, jnp.int32)
    nc, tc = min(8, N), min(256, T_MEL)
    calib = feats[:nc, :tc]
    calib_lens = jnp.full((nc,), tc, jnp.int32)

    enc_bf = Cnn10(embed_size=CH[-1], channels=CH, dtype=jnp.bfloat16)
    var = enc_bf.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      calib, calib_lens, train=False)
    quant = QuantPannEncoder(dict(var), calib, calib_lens, channels=CH,
                             **scheme_kwargs("v2sym"))
    quant_v3 = QuantPannEncoder(dict(var), calib, calib_lens, channels=CH,
                                **scheme_kwargs("v3"))
    quant_v4 = QuantPannEncoder(dict(var), calib, calib_lens, channels=CH,
                                **scheme_kwargs("v4"))

    @jax.jit
    def run_bf(feats, feat_lens):
        out = enc_bf.apply(var, feats, feat_lens, train=False)
        return jnp.sum(out["audio_embeds"].astype(jnp.float32)) \
            + jnp.sum(out["audio_embeds_pooled"].astype(jnp.float32))

    def int8_full(q):
        @jax.jit
        def run(feats, feat_lens):
            out = q(feats, feat_lens)
            return jnp.sum(out["audio_embeds"]) \
                + jnp.sum(out["audio_embeds_pooled"])
        return run

    arms = {"bf16": run_bf, "int8": int8_full(quant),
            "int8_v3": int8_full(quant_v3), "int8_v4": int8_full(quant_v4)}

    # stagewise truncations of the int8 composite: stem quantizer only,
    # then through block k (convs + pool), then the full encoder with head
    def int8_prefix(n_blocks):
        @jax.jit
        def run(feats, feat_lens):
            x_i8 = quant._quant_stem(feats)
            k = 0
            nb = len(quant.blocks)
            for bi, blk in enumerate(quant.blocks[:n_blocks]):
                for j in (1, 2):
                    k += 1
                    acc = quant._conv(x_i8, blk, j, offset_input=k > 1)
                    y = acc.astype(jnp.float32) * blk[f"A{j}"] + blk[f"B{j}"]
                    if bi == nb - 1 and j == 2:
                        x_f = jnp.maximum(y, 0.0)
                    else:
                        x_i8 = quant._requantize(y)
                if blk["pool"]:
                    if bi == nb - 1:
                        x_f = (jax.lax.reduce_window(
                            x_f, 0.0, jax.lax.add, (1, 2, 2, 1),
                            (1, 2, 2, 1), "VALID") * 0.25)
                        return jnp.sum(x_f)
                    from acvae_tpu.models.quant import _avgpool_i8
                    x_i8 = _avgpool_i8(x_i8)
            return jnp.sum(x_i8.astype(jnp.int32))
        return run

    # dispatch/reduce floor: a near-empty program over the same input —
    # the tunnel's per-call overhead (~25-40 ms/call unamortized) rides on
    # every stage, so absolute stage_ms near this floor means the stage's
    # REAL cost is the delta, not the reading (round-5 lesson: the 24 ms
    # "stem" stage is mostly floor)
    @jax.jit
    def run_null(feats, feat_lens):
        return jnp.sum(feats) + jnp.sum(feat_lens)

    stages = {"null": run_null, "stem": int8_prefix(0)}
    for b in range(1, len(quant.blocks) + 1):
        stages[f"thru_b{b - 1}"] = int8_prefix(b)
    stages["full"] = arms["int8"]

    for name, fn in {**arms, **stages}.items():
        t0 = time.perf_counter()
        np.asarray(fn(feats, feat_lens))
        print(f"# warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    totals = {k: [] for k in arms}
    names = list(arms)
    for r in range(rounds):
        order = names[r % len(names):] + names[: r % len(names)]
        for name in order:
            fn = arms[name]
            t0 = time.perf_counter()
            vals = [fn(feats, feat_lens) for _ in range(ITERS)]
            for v in vals:
                np.asarray(v)
            dt = time.perf_counter() - t0
            totals[name].append(dt / ITERS * 1000)
            print(f"# r{r} {name}: {dt / ITERS * 1000:.1f} ms/batch",
                  flush=True)

    # one stagewise round (ratios within a tight window; drift is small
    # across adjacent arms and the deltas are what matter)
    stage_ms = {}
    for name, fn in stages.items():
        t0 = time.perf_counter()
        vals = [fn(feats, feat_lens) for _ in range(ITERS)]
        for v in vals:
            np.asarray(v)
        stage_ms[name] = (time.perf_counter() - t0) / ITERS * 1000
        print(f"# stage {name}: {stage_ms[name]:.1f} ms", flush=True)

    best = {k: min(v) for k, v in totals.items()}
    deltas = {}
    prev = 0.0
    for name in stages:
        deltas[name] = round(stage_ms[name] - prev, 2)
        prev = stage_ms[name]
    print(json.dumps({
        "batch": N, "t_mel": T_MEL,
        "best_ms": {k: round(v, 2) for k, v in best.items()},
        "int8_vs_bf16": round(best["bf16"] / best["int8"], 3),
        "stage_ms": {k: round(v, 2) for k, v in stage_ms.items()},
        "stage_deltas_ms": deltas,
    }, indent=1))


if __name__ == "__main__":
    main()
