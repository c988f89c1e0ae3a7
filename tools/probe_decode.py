"""Decode-loop attribution + A/B harness for the real chip.

The beam decode step is the serial half of the serving headline
(docs/pallas_notes.md: bandwidth/precision levers measure flat; the open
question is *which* op chain dominates the ~2 ms/step).  This tool answers it
two ways:

* ``slope`` — per-component device time via in-jit chaining: each probe runs
  STEPS iterations of one component inside ONE jit program with a chained
  data dependency, so per-iteration time = (t(2k) − t(k)) / k and dispatch
  overhead cancels.  Components use the *actual* module math (folded
  attention, torch-gate-order GRU/LSTM recurrences) at flagship shapes.
* ``topk_ab`` — full flagship beam decode, flat vs two-stage top-k
  (``decoding.beam.beam_topk``), token-agreement checked, alternated to
  control tunnel drift.
* ``ablate`` — decode-only time as one shape dim varies (audio positions S,
  vocab V, width E, beam B) at fixed batch; the slopes attribute the per-step
  cost without ``jax.profiler`` (which hangs over the tunneled runtime).

Usage (run on the real chip, from the repo root):
    python tools/probe_decode.py slope [output|output2|attn|gru|lstm|gather|all]
    python tools/probe_decode.py topk_ab
    python tools/probe_decode.py loop_ab     # scanned vs unrolled time loop
    python tools/probe_decode.py attn_ab     # fused vs sequential dual attention
    python tools/probe_decode.py ablate [S|V|E|B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# flagship shapes; env-overridable for CPU smoke tests (PROBE_N=4 ...)
N = int(os.environ.get("PROBE_N", 512))
B = int(os.environ.get("PROBE_B", 3))
E = int(os.environ.get("PROBE_E", 512))
V = int(os.environ.get("PROBE_V", 4981))
T_MEL = int(os.environ.get("PROBE_T_MEL", 1024))
S = T_MEL // 16
NB = N * B
A = E            # attn_size == embed in the flagship config
MAX_LEN = 20
F_MEL = 64

_r = np.random.default_rng(0)

# PROBE_DTYPE=bfloat16 casts every slope-probe operand (weights AND
# activations), answering per-component whether the step is f32-matmul-bound
# — the full-decode bf16 A/B measured flat (docs/pallas_notes.md "bf16
# decode"), which contradicts a matmul-bound estimate; component slopes
# disambiguate.
_DTYPE = jnp.dtype(os.environ.get("PROBE_DTYPE", "float32"))


def f32(*shape):
    return jnp.asarray(_r.normal(size=shape).astype(np.float32) * 0.05,
                       dtype=_DTYPE)


def _time(fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # block (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def slope(make, label, k=40):
    f1, f2 = jax.jit(make(k)), jax.jit(make(2 * k))
    t1, t2 = _time(f1), _time(f2)
    print(f"{label:32s}: {(t2 - t1) / k * 1000:.3f} ms/step  "
          f"(t{k}={t1 * 1000:.0f}ms t{2 * k}={t2 * 1000:.0f}ms)", flush=True)


# ---------------------------------------------------------------- components
def mk_output(steps, two_stage=False):
    """Classifier matmul -> log_softmax -> beam top-k (the output stage)."""
    from acvae_tpu.decoding.beam import beam_topk
    W = f32(E, V)
    h0 = f32(NB, E)

    def f():
        def body(i, h):
            logits = (h @ W).reshape(N, B, V)
            lp = jax.nn.log_softmax(logits, axis=-1)
            s, idx = beam_topk(lp, B, impl="two_stage" if two_stage else "flat")
            return h + s.reshape(-1)[:, None] * 1e-6
        return jax.lax.fori_loop(0, steps, body, h0)
    return f


def mk_attn(steps):
    """One beam-folded additive attention read (two run per decode step)."""
    enc_proj, enc_mem, Wd, v = f32(N, S, A), f32(N, S, E), f32(E, A), f32(A)
    h0 = f32(NB, E)

    def f():
        def body(i, h):
            dec_p = (h @ Wd).reshape(N, B, 1, A)
            sc = jnp.tanh(enc_proj[:, None] + dec_p) @ v        # [N, B, S]
            w = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("nbs,nse->nbe", w, enc_mem).reshape(NB, E)
            return h + ctx * 1e-6
        return jax.lax.fori_loop(0, steps, body, h0)
    return f


def mk_gru(steps):
    """GRU recurrence exactly as models/rnn.py (input proj + recur)."""
    wi, wh = f32(3 * E, 3 * E), f32(E, 3 * E)
    x0, h0 = f32(NB, 3 * E), f32(NB, E)

    def f():
        def body(i, h):
            gi = x0 @ wi
            gh = h @ wh
            r = jax.nn.sigmoid(gi[:, :E] + gh[:, :E])
            z = jax.nn.sigmoid(gi[:, E:2 * E] + gh[:, E:2 * E])
            n_ = jnp.tanh(gi[:, 2 * E:] + r * gh[:, 2 * E:])
            return (1.0 - z) * n_ + z * h
        return jax.lax.fori_loop(0, steps, body, h0)
    return f


def mk_lstm(steps):
    """LSTM recurrence exactly as models/rnn.py (the prior's cell)."""
    wi, wh = f32(3 * E, 4 * E), f32(E, 4 * E)
    x0, h0, c0 = f32(NB, 3 * E), f32(NB, E), f32(NB, E)

    def f():
        def body(i, hc):
            h, c = hc
            g = x0 @ wi + h @ wh
            i_, fg = jax.nn.sigmoid(g[:, :E]), jax.nn.sigmoid(g[:, E:2 * E])
            gg, o = jnp.tanh(g[:, 2 * E:3 * E]), jax.nn.sigmoid(g[:, 3 * E:])
            c2 = fg * c + i_ * gg
            return (o * jnp.tanh(c2), c2)
        return jax.lax.fori_loop(0, steps, body, (h0, c0))
    return f


def mk_gather(steps):
    idx = jnp.asarray(_r.integers(0, B, size=(N, B)).astype(np.int32))
    flat = (jnp.arange(N)[:, None] * B + idx).reshape(-1)
    h0 = f32(NB, E)

    def f():
        def body(i, h):
            return h[flat] * 1.000001
        return jax.lax.fori_loop(0, steps, body, h0)
    return f


SLOPES = {
    "output": lambda: slope(mk_output, "logits+log_softmax+topk(flat)"),
    "output2": lambda: slope(lambda s: mk_output(s, two_stage=True),
                             "logits+log_softmax+topk(2stage)"),
    "attn": lambda: slope(mk_attn, "folded additive attention"),
    "gru": lambda: slope(mk_gru, "GRU cell (decoder)"),
    "lstm": lambda: slope(mk_lstm, "LSTM cell (prior)"),
    "gather": lambda: slope(mk_gather, "beam gather [NB,E]"),
}


# ------------------------------------------------------------- full-model A/B
def _flagship_decode(batch=N, t_mel=T_MEL, vocab=V, e=512):
    from __graft_entry__ import _build_flagship
    model = _build_flagship(vocab_size=vocab, enc_dtype=jnp.bfloat16,
                            channels=(64, 128, 256, e))
    fi = jnp.asarray(_r.normal(size=(8, 256, F_MEL)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        fi, jnp.full((8,), 256, jnp.int32),
        jnp.ones((8, 22), jnp.int32), jnp.full((8,), 22, jnp.int32),
        train=False)
    feats = jnp.asarray(
        _r.normal(size=(batch, t_mel, F_MEL)).astype(np.float32))
    feat_lens = jnp.full((batch,), t_mel, jnp.int32)
    enc = jax.jit(lambda v, f, l: model.apply(v, f, l, train=False,
                                              method=model.encode))
    encoded = dict(enc(variables, feats, feat_lens))
    np.asarray(encoded["audio_embeds"])
    return model, variables, encoded


def make_decode(model, variables, beam=B, max_len=MAX_LEN):
    from acvae_tpu.decoding.beam import BeamConfig, batched_beam_search
    cfg = BeamConfig(beam_size=beam, max_length=max_len,
                     first_step_row0=False, end_handling=False)
    Em = model.decoder.embed_size

    @jax.jit
    def dec(variables, encoded, key):
        ctx = model.apply(variables, encoded, method=model.decode_ctx)
        nb = encoded["audio_embeds"].shape[0] * beam
        state0 = model.apply(variables, nb, method=model.init_decode_state)
        eps = jax.random.normal(key, (max_len, nb, Em))

        def step_fn(state, words, t):
            return model.apply(variables, ctx, state, words, eps[t],
                               method=model.decode_step_api)
        return batched_beam_search(step_fn, state0,
                                   encoded["audio_embeds"].shape[0], cfg)
    return dec


def loop_ab():
    """Scanned vs unrolled beam time loop: cold compile, runtime, tokens."""
    model, variables, encoded = _flagship_decode()
    outs, decs = {}, {}
    for mode in ("scan", "unroll"):
        os.environ["ACVAE_BEAM_LOOP"] = mode
        decs[mode] = make_decode(model, variables)
        t0 = time.perf_counter()
        outs[mode] = decs[mode](variables, encoded, jax.random.key(2))
        np.asarray(outs[mode]["seqs"])
        print(f"{mode:7s}: first call (compile+run) "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
    same = np.array_equal(np.asarray(outs["scan"]["seqs"]),
                          np.asarray(outs["unroll"]["seqs"]))
    print(f"token-identical: {same}", flush=True)
    for rnd in range(3):
        for mode in ("scan", "unroll"):
            t = _time(lambda: decs[mode](variables, encoded,
                                         jax.random.key(3 + rnd)))
            print(f"round {rnd} {mode:7s}: {t * 1000:.1f} ms decode-only",
                  flush=True)


def attn_ab():
    """Fused (stacked) vs sequential dual-attention decode A/B."""
    model, variables, encoded = _flagship_decode()
    outs, decs = {}, {}
    for mode in ("seq", "fused"):
        os.environ["ACVAE_FUSED_ATTN"] = "1" if mode == "fused" else "0"
        decs[mode] = make_decode(model, variables)
        outs[mode] = decs[mode](variables, encoded, jax.random.key(2))
        np.asarray(outs[mode]["seqs"])
    same = np.array_equal(np.asarray(outs["seq"]["seqs"]),
                          np.asarray(outs["fused"]["seqs"]))
    print(f"token-identical: {same}", flush=True)
    for rnd in range(3):
        for mode in ("seq", "fused"):
            t = _time(lambda: decs[mode](variables, encoded,
                                         jax.random.key(3 + rnd)))
            print(f"round {rnd} {mode:6s}: {t * 1000:.1f} ms decode-only",
                  flush=True)


def step_ab():
    """Fused-gate-matmul step (ACVAE_FUSED_STEP) vs default decode A/B.

    The fused step batches the four start-of-step gate matmuls into one
    MXU call (models/vae.py::_fused_gate_step) — 3 fewer serial ops/step
    at ~2x the matmul FLOPs (padding waste).  The op-latency-bound loop
    (pallas_notes "decode chain") predicts a win iff per-op latency, not
    payload, binds."""
    model, variables, encoded = _flagship_decode()
    outs, decs = {}, {}
    for mode in ("default", "fusedstep"):
        os.environ["ACVAE_FUSED_STEP"] = "1" if mode == "fusedstep" else "0"
        os.environ["ACVAE_FUSED_ATTN"] = "0"
        decs[mode] = make_decode(model, variables)
        outs[mode] = decs[mode](variables, encoded, jax.random.key(2))
        np.asarray(outs[mode]["seqs"])
    same = np.array_equal(np.asarray(outs["default"]["seqs"]),
                          np.asarray(outs["fusedstep"]["seqs"]))
    print(f"token-identical: {same}", flush=True)
    for rnd in range(4):
        for mode in ("default", "fusedstep"):
            t = _time(lambda: decs[mode](variables, encoded,
                                         jax.random.key(3 + rnd)))
            print(f"round {rnd} {mode:9s}: {t * 1000:.1f} ms decode-only",
                  flush=True)


def topk_ab():
    model, variables, encoded = _flagship_decode()
    decs, outs = {}, {}
    for impl in ("flat", "two_stage"):
        os.environ["ACVAE_TOPK"] = impl
        decs[impl] = make_decode(model, variables)
        outs[impl] = decs[impl](variables, encoded, jax.random.key(2))
        np.asarray(outs[impl]["seqs"])  # compile now, under this impl
    same = np.array_equal(np.asarray(outs["flat"]["seqs"]),
                          np.asarray(outs["two_stage"]["seqs"]))
    print(f"token-identical: {same}", flush=True)
    for rnd in range(3):  # alternate to control drift
        for impl in ("flat", "two_stage"):
            t = _time(lambda: decs[impl](variables, encoded,
                                         jax.random.key(3 + rnd)))
            print(f"round {rnd} {impl:10s}: {t * 1000:.1f} ms decode-only",
                  flush=True)


def ablate(dim):
    """Decode-only time vs one shape dim; others at flagship values."""
    grids = {"S": [(256, "S=16"), (1024, "S=64"), (2048, "S=128")],
             "V": [(1024, "V=1k"), (4981, "V=5k"), (16384, "V=16k")],
             "B": [(1, "B=1"), (3, "B=3"), (8, "B=8")],
             "E": [(256, "E=256"), (512, "E=512"), (768, "E=768")]}
    for val, label in grids[dim]:
        t_mel = val if dim == "S" else T_MEL
        vocab = val if dim == "V" else V
        beam = val if dim == "B" else B
        e = val if dim == "E" else 512
        model, variables, encoded = _flagship_decode(t_mel=t_mel, vocab=vocab,
                                                     e=e)
        dec = make_decode(model, variables, beam=beam)
        out = dec(variables, encoded, jax.random.key(2))
        np.asarray(out["seqs"])
        t = _time(lambda: dec(variables, encoded, jax.random.key(3)))
        print(f"{label:8s}: {t * 1000:.1f} ms decode-only "
              f"({t / MAX_LEN * 1000:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "slope"
    if cmd == "slope":
        which = sys.argv[2] if len(sys.argv) > 2 else "all"
        for name in (SLOPES if which == "all" else [which]):
            SLOPES[name]()
    elif cmd == "topk_ab":
        topk_ab()
    elif cmd == "loop_ab":
        loop_ab()
    elif cmd == "attn_ab":
        attn_ab()
    elif cmd == "step_ab":
        step_ab()
    elif cmd == "ablate":
        ablate(sys.argv[2] if len(sys.argv) > 2 else "V")
    else:
        raise SystemExit(f"unknown command {cmd}")
