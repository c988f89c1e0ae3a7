"""Encoder attribution + A/B harness for the real chip.

The serving headline is encoder-bound (RESULTS.md: Cnn10 ~98 ms bf16 of the
~150 ms batch-512 decode; the int8 path measured only 1.1x despite the MXU's
nominal 2x int8 rate).  This tool answers *where* the encoder time goes and
*which* int8 step structure the TPU actually runs fast, the same way
``tools/probe_decode.py`` answered the decode loop:

* ``conv`` — per-variant device time for the dominant conv2 shapes (the
  cin==cout convs are ~5/6 of Cnn10's FLOPs) via in-jit ``fori_loop``
  chaining: per-iteration time = (t(2k) - t(k)) / k, so dispatch overhead
  and the loop carry cancel.  Variants: bf16 / f32 convs, raw int8 conv
  (int32 MXU accumulation), the full v1 epilogue step (SAME pad, affine +
  relu + requantize), the v2 epilogue step (explicit -ZP pad + VALID conv —
  does the 2 GB pad copy fuse or cost a pass?), and int8 data upcast to
  bf16 (is the int8 *conv* or the int8 *memory traffic* the win?).
* ``enc_ab`` — full flagship encoder forward, bf16 Cnn10 vs QuantPannEncoder
  v2 vs v1, arms interleaved within one process to control the tunnel's
  minute-scale throughput drift (CLAUDE.md).

Usage (run on the real chip, from the repo root):
    python tools/probe_encoder.py conv [b0|b1|b2|b3|all]
    python tools/probe_encoder.py enc_ab
CPU smoke: PROBE_N=2 PROBE_T=64 JAX_PLATFORMS=cpu python tools/probe_encoder.py ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acvae_tpu.core.devprobe import apply_jax_platforms_env

apply_jax_platforms_env(label="probe_encoder")  # raw env var is plugin-ignored

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# block-level probes at 256 (matches the round-1 block0 table); the full
# encoder A/B uses the serving batch 512
N = int(os.environ.get("PROBE_N", 256))
N_FULL = int(os.environ.get("PROBE_N_FULL", max(N, 2 * N)))
T = int(os.environ.get("PROBE_T", 1024))
F = 64
CH = (64, 128, 256, 512)

_DN = ("NHWC", "HWIO", "NHWC")
_r = np.random.default_rng(0)


def _time(fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # block (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def slope(mk, label, k=8):
    # the chained input rides in as an ARGUMENT (closure capture would bake
    # the multi-GB activation into the program as a constant — minutes of
    # lowering + transfer over the tunnel)
    make, x0 = mk
    x0 = jax.device_put(x0)
    f1, f2 = jax.jit(make(k)), jax.jit(make(2 * k))
    t1, t2 = _time(lambda: f1(x0)), _time(lambda: f2(x0))
    ms = (t2 - t1) / k * 1000
    print(f"{label:34s}: {ms:7.2f} ms/iter  "
          f"(t{k}={t1 * 1000:.0f}ms t{2 * k}={t2 * 1000:.0f}ms)", flush=True)
    return ms


# ------------------------------------------------------------- conv variants
def _shapes(block):
    """conv2 activation shape [N, h, w, c] for Cnn10 block `block`."""
    h, w, c = T >> block, F >> block, CH[block]
    return N, h, w, c


def _w8(c):
    return jnp.asarray(
        _r.integers(-127, 128, size=(3, 3, c, c)).astype(np.int8))


def _x8(n, h, w, c):
    return jnp.asarray(
        _r.integers(-128, 128, size=(n, h, w, c)).astype(np.int8))


def mk_conv_float(block, dtype):
    n, h, w, c = _shapes(block)
    x0 = jnp.asarray(_r.normal(size=(n, h, w, c)).astype(np.float32) * 0.05,
                     dtype=dtype)
    # small kernel scale: the chained activations decay toward zero instead
    # of overflowing across iterations (values don't affect timing)
    wk = jnp.asarray(_r.normal(size=(3, 3, c, c)).astype(np.float32) * 0.02,
                     dtype=dtype)

    def make(steps):
        def f(x0):
            def body(i, x):
                return lax.conv_general_dilated(
                    x, wk, (1, 1), "SAME", dimension_numbers=_DN)
            return lax.fori_loop(0, steps, body, x0).ravel()[0]
        return f
    return make, x0


def mk_conv_int8_raw(block):
    """int8 conv, int32 MXU accumulation, cheapest possible closure back to
    int8 (shift keeps magnitudes; no affine) — isolates the conv itself."""
    n, h, w, c = _shapes(block)
    x0, wk = _x8(n, h, w, c), _w8(c)

    def make(steps):
        def f(x0):
            def body(i, x):
                acc = lax.conv_general_dilated(
                    x, wk, (1, 1), "SAME", dimension_numbers=_DN,
                    preferred_element_type=jnp.int32)
                return (acc >> 12).astype(jnp.int8)
            return lax.fori_loop(0, steps, body, x0).ravel()[0]
        return f
    return make, x0


def mk_conv_int8_epilogue(block, offset_pad):
    """The shipped int8 step: conv → f32 affine → relu → requantize.
    offset_pad=True is the v2 structure (explicit -128 pad + VALID)."""
    n, h, w, c = _shapes(block)
    x0, wk = _x8(n, h, w, c), _w8(c)
    A = jnp.asarray(_r.random(c).astype(np.float32) * 1e-4)
    B = jnp.asarray(_r.random(c).astype(np.float32))

    def make(steps):
        def f(x0):
            def body(i, x):
                if offset_pad:
                    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                 constant_values=-128)
                    acc = lax.conv_general_dilated(
                        xp, wk, (1, 1), "VALID", dimension_numbers=_DN,
                        preferred_element_type=jnp.int32)
                else:
                    acc = lax.conv_general_dilated(
                        x, wk, (1, 1), "SAME", dimension_numbers=_DN,
                        preferred_element_type=jnp.int32)
                y = jnp.maximum(acc.astype(jnp.float32) * A + B, 0.0)
                return jnp.clip(jnp.round(y) - 128, -128, 127).astype(jnp.int8)
            return lax.fori_loop(0, steps, body, x0).ravel()[0]
        return f
    return make, x0


def mk_conv_int8_upcast(block):
    """int8 data in HBM, bf16 conv on the MXU: if this matches the raw int8
    conv, the int8 win is memory traffic, not MXU rate."""
    n, h, w, c = _shapes(block)
    x0, wk8 = _x8(n, h, w, c), _w8(c)
    wk = (wk8.astype(jnp.bfloat16) * jnp.bfloat16(2 ** -10))

    def make(steps):
        def f(x0):
            def body(i, x):
                acc = lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), wk, (1, 1), "SAME",
                    dimension_numbers=_DN,
                    preferred_element_type=jnp.float32)
                return jnp.clip(jnp.round(acc), -128, 127).astype(jnp.int8)
            return lax.fori_loop(0, steps, body, x0).ravel()[0]
        return f
    return make, x0


def conv(which):
    blocks = range(4) if which == "all" else [int(which[1])]
    for b in blocks:
        n, h, w, c = _shapes(b)
        flops = 2 * n * h * w * c * c * 9
        print(f"-- block{b} conv2 [{n},{h},{w},{c}]  "
              f"{flops / 1e12:.2f} TFLOP  "
              f"(bf16 MXU bound ~{flops / 197e12 * 1000:.1f} ms, "
              f"int8 ~{flops / 394e12 * 1000:.1f} ms)")
        slope(mk_conv_float(b, jnp.bfloat16), f"b{b} bf16 conv")
        slope(mk_conv_float(b, jnp.float32), f"b{b} f32 conv")
        slope(mk_conv_int8_raw(b), f"b{b} int8 conv (raw)")
        slope(mk_conv_int8_epilogue(b, False), f"b{b} int8 step v1 (SAME)")
        slope(mk_conv_int8_epilogue(b, True), f"b{b} int8 step v2 (pad+VALID)")
        slope(mk_conv_int8_upcast(b), f"b{b} int8 data, bf16 conv")


# --------------------------------------------------------------- full encoder
def _build_encoders():
    from acvae_tpu.models.encoders import Cnn10
    from acvae_tpu.models.quant import QuantPannEncoder

    enc_bf16 = Cnn10(inputdim=F, embed_size=CH[-1], channels=CH,
                     dtype=jnp.bfloat16)
    enc_f32 = Cnn10(inputdim=F, embed_size=CH[-1], channels=CH)
    feats0 = jnp.asarray(_r.normal(size=(2, T, F)).astype(np.float32))
    lens0 = jnp.asarray([T, T], jnp.int32)
    v = jax.jit(lambda: enc_f32.init(jax.random.key(0), feats0, lens0,
                                     train=True))()
    calib_feats = jnp.asarray(_r.normal(size=(8, T, F)).astype(np.float32))
    calib_lens = jnp.full((8,), T, jnp.int32)
    q2 = QuantPannEncoder(v, calib_feats, calib_lens, channels=CH)
    q1 = QuantPannEncoder(v, calib_feats, calib_lens, channels=CH,
                          per_channel=False, offset=False)
    # per-channel scales without the offset coding: the scales fold into
    # the weights at bake time (zero runtime cost), so this should run at
    # v1 speed — the first enc_ab showed v2's offset pad does NOT fuse in
    # the composed program (−17 ms at batch 512) though it fuses in the
    # isolated conv loops
    q2s = QuantPannEncoder(v, calib_feats, calib_lens, channels=CH,
                           offset=False)
    return enc_bf16, v, q2, q1, q2s


def enc_ab():
    enc_bf16, v, q2, q1, q2s = _build_encoders()
    feats = jax.device_put(
        jnp.asarray(_r.normal(size=(N_FULL, T, F)).astype(np.float32)))
    lens = jax.device_put(jnp.asarray(
        _r.integers(T // 2, T + 1, size=N_FULL).astype(np.int32)))

    f_bf16 = jax.jit(lambda ft, ln: enc_bf16.apply(
        v, ft, ln, train=False)["audio_embeds_pooled"].ravel()[0])
    f_q2 = jax.jit(lambda ft, ln: q2(ft, ln)["audio_embeds_pooled"].ravel()[0])
    f_q1 = jax.jit(lambda ft, ln: q1(ft, ln)["audio_embeds_pooled"].ravel()[0])
    f_q2s = jax.jit(
        lambda ft, ln: q2s(ft, ln)["audio_embeds_pooled"].ravel()[0])

    arms = [("bf16 Cnn10", f_bf16), ("int8 v2", f_q2), ("int8 v1", f_q1),
            ("int8 v2sym (pc, no offset)", f_q2s)]
    for label, f in arms:  # compile before any timing
        np.asarray(f(feats, lens))
    results = {label: [] for label, _ in arms}
    for _ in range(5):  # interleave: tunnel drift hits all arms equally
        for label, f in arms:
            t0 = time.perf_counter()
            np.asarray(f(feats, lens))
            results[label].append(time.perf_counter() - t0)
    print(f"-- full Cnn10 forward [{N_FULL},{T},{F}] (median of 5, "
          f"interleaved)")
    for label, ts in results.items():
        print(f"{label:34s}: {np.median(ts) * 1000:7.1f} ms  "
              f"({' '.join(f'{t * 1000:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "conv"
    if mode == "conv":
        conv(sys.argv[2] if len(sys.argv) > 2 else "all")
    elif mode == "enc_ab":
        enc_ab()
    else:
        raise SystemExit(f"unknown mode {mode}")
