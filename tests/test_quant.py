"""Int8 post-training quantization of Cnn10 (models/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.models.encoders import Cnn10
from acvae_tpu.models.quant import QuantCnn10

CH = (4, 8, 8, 16)
N, T, F = 4, 128, 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32))
    lens = jnp.array([T, T, 96, 64])
    enc = Cnn10(embed_size=CH[-1], channels=CH)
    v = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 feats, lens, train=False)
    # nontrivial batch stats so the BN fold is actually exercised
    v = jax.tree.map(lambda x: x, v)
    import flax
    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    return enc, v, feats, lens


def test_int8_encoder_matches_f32(setup):
    enc, v, feats, lens = setup
    ref = enc.apply(v, feats, lens, train=False)
    q = QuantCnn10(v, feats, lens, channels=CH)
    out = q(feats, lens)
    assert out["audio_embeds"].shape == ref["audio_embeds"].shape
    np.testing.assert_array_equal(np.asarray(out["audio_embeds_lens"]),
                                  np.asarray(ref["audio_embeds_lens"]))
    a = np.asarray(ref["audio_embeds"]).ravel()
    b = np.asarray(out["audio_embeds"]).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.995, cos
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
    assert rel < 0.1, rel


def test_int8_jits_and_is_static(setup):
    enc, v, feats, lens = setup
    q = QuantCnn10(v, feats, lens, channels=CH)
    jit_q = jax.jit(lambda f, l: q(f, l))
    o1 = jit_q(feats, lens)
    o2 = jit_q(feats * 0.5, lens)  # same compiled fn, different data
    assert np.all(np.isfinite(np.asarray(o1["audio_embeds"])))
    assert not np.allclose(np.asarray(o1["audio_embeds"]),
                           np.asarray(o2["audio_embeds"]))


def test_int8_cnn14_matches_f32(rng):
    """The generic PANN path: Cnn14's block plan (5 pooled blocks + one
    unpooled 2048 block, head fc1, /32 subsampling)."""
    from acvae_tpu.models.encoders import Cnn14
    from acvae_tpu.models.quant import QuantPannEncoder

    feats = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
    lens = jnp.array([128, 96])
    enc = Cnn14(embed_size=2048)
    v = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 feats, lens, train=False)
    ref = enc.apply(v, feats, lens, train=False)
    q = QuantPannEncoder(v, feats, lens, arch="Cnn14")
    out = q(feats, lens)
    assert out["audio_embeds"].shape == ref["audio_embeds"].shape
    np.testing.assert_array_equal(np.asarray(out["audio_embeds_lens"]),
                                  np.asarray(ref["audio_embeds_lens"]))
    a = np.asarray(ref["audio_embeds"]).ravel()
    b = np.asarray(out["audio_embeds"]).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos


def _err(enc, v, feats, lens, **scheme):
    ref = np.asarray(enc.apply(v, feats, lens,
                               train=False)["audio_embeds"]).ravel()
    q = QuantCnn10(v, feats, lens, channels=CH, **scheme)
    out = np.asarray(q(feats, lens)["audio_embeds"]).ravel()
    return np.linalg.norm(ref - out) / (np.linalg.norm(ref) + 1e-12)


def test_v2_scheme_tightens_error(setup):
    """Per-channel scale folding + the offset (255-level post-relu)
    representation must beat the round-1 per-tensor symmetric scheme."""
    enc, v, feats, lens = setup
    v1 = _err(enc, v, feats, lens, per_channel=False, offset=False)
    v2 = _err(enc, v, feats, lens, per_channel=True, offset=True)
    assert v2 < v1, (v1, v2)
    assert v2 < 0.02, v2


def test_per_channel_rescues_skewed_channels(setup):
    """Skew one post-relu activation's channel ranges by 5 orders of
    magnitude (scale bn1's affine per channel; undo it inside conv2's
    input channels — relu commutes with positive per-channel scaling, so
    the f32 output is unchanged): the per-tensor scheme starves the small
    channels of resolution; per-channel activation scales do not."""
    import copy
    enc, v, feats, lens = setup
    v_skew = copy.deepcopy(jax.tree.map(np.asarray, v))
    blk = v_skew["params"]["block0_4"]
    c = blk["conv1"]["kernel"].shape[-1]
    skew = np.logspace(-3, 2, c, dtype=np.float32)
    blk["bn1"]["scale"] = blk["bn1"]["scale"] * skew
    blk["bn1"]["bias"] = blk["bn1"]["bias"] * skew
    blk["conv2"]["kernel"] = (blk["conv2"]["kernel"]
                              / skew[None, None, :, None])
    v1 = _err(enc, v_skew, feats, lens, per_channel=False, offset=True)
    v2 = _err(enc, v_skew, feats, lens, per_channel=True, offset=True)
    assert v2 < v1 / 2, (v1, v2)


def test_mse_scale_clips_outliers():
    """With a large bulk and one outlier, the bulk's resolution loss
    outweighs the outlier's clip error and the MSE search picks a scale
    strictly below abs-max — and the resulting round-trip MSE must beat
    the abs-max scale's (r=1.0 is in the grid, so it can never lose)."""
    from acvae_tpu.models.quant import _mse_scale

    rng = np.random.default_rng(3)

    def mse_of(a, s):
        q = jnp.clip(jnp.round(a / s), 0, 127)
        return float(jnp.mean((a - q * s) ** 2))

    vals = np.abs(rng.normal(size=100_000).astype(np.float32))
    vals[0] = 50.0
    a = jnp.asarray(vals)
    s_absmax = np.float32(50.0 / 127.0)
    s = _mse_scale(a, s_absmax, 127.0, axes=None)
    assert s < s_absmax, (s, s_absmax)
    assert mse_of(a, s) < mse_of(a, s_absmax)
    # outlier-free data: abs-max is already near-optimal — the search must
    # never lose (r=1.0 is in the grid)
    clean = jnp.asarray(np.abs(rng.normal(size=100_000)).astype(np.float32))
    s_clean_max = np.float32(float(jnp.max(clean)) / 127.0)
    s_clean = _mse_scale(clean, s_clean_max, 127.0, axes=None)
    assert mse_of(clean, s_clean) <= mse_of(clean, s_clean_max)


def test_bias_correction_zeroes_mean_error(setup):
    """After the bias-correction pass, the per-channel mean of the final
    conv's pre-relu error on the calibration batch is ~0 (that is the
    quantity the pass folds into B), and the end-to-end embedding error
    must not degrade."""
    enc, v, feats, lens = setup
    ref = np.asarray(enc.apply(v, feats, lens, train=False)["audio_embeds"])

    def run(**kw):
        q = QuantCnn10(v, feats, lens, channels=CH, per_channel=True,
                       offset=False, **kw)
        return q, np.asarray(q(feats, lens)["audio_embeds"])

    q_plain, out_plain = run()
    q_corr, out_corr = run(bias_correct=True)
    # the corrected path's mean embedding error shrinks toward zero
    # (audio_embeds is the freq-mean of relu'd final conv output — the
    # correction target up to the relu nonlinearity)
    mean_err_plain = np.abs((ref - out_plain).mean(axis=(0, 1)))
    mean_err_corr = np.abs((ref - out_corr).mean(axis=(0, 1)))
    assert mean_err_corr.mean() < mean_err_plain.mean(), \
        (mean_err_corr.mean(), mean_err_plain.mean())
    rel_plain = np.linalg.norm(ref - out_plain) / np.linalg.norm(ref)
    rel_corr = np.linalg.norm(ref - out_corr) / np.linalg.norm(ref)
    assert rel_corr < rel_plain * 1.05, (rel_corr, rel_plain)


def test_v3_scheme_end_to_end(setup):
    """v3 (v2sym + mse_clip + bias_correct) resolves through SCHEMES, runs,
    and stays within the fidelity bar on the standard fixture."""
    from acvae_tpu.models.quant import scheme_kwargs
    enc, v, feats, lens = setup
    e = _err(enc, v, feats, lens, **scheme_kwargs("v3"))
    assert e < 0.02, e
    e_sym = _err(enc, v, feats, lens, **scheme_kwargs("v2sym"))
    # the bake-time levers must not be a net loss on ordinary data
    assert e <= e_sym * 1.1, (e, e_sym)


def test_offset_conv_border_math_is_exact():
    """The -ZP explicit padding + baked ZP·Σw correction must reproduce the
    f32 SAME-pad conv of the dequantized activation exactly (the conv is
    integer math; the only f32 is the final affine)."""
    from jax import lax
    from acvae_tpu.models.quant import _ZP, _DN

    rng = np.random.default_rng(1)
    q = rng.integers(-128, 128, size=(2, 6, 5, 3)).astype(np.int8)
    w8 = rng.integers(-127, 128, size=(3, 3, 3, 4)).astype(np.int8)
    s_in = 0.03125  # power of two: dequant is exact in f32
    # reference: f32 SAME conv of the dequantized values
    v = (q.astype(np.float32) + _ZP) * s_in
    ref = lax.conv_general_dilated(
        jnp.asarray(v), jnp.asarray(w8, jnp.float32), (1, 1), "SAME",
        dimension_numbers=_DN)
    # offset path: pad -ZP, VALID conv, + ZP·Σw correction, × s_in
    xp = jnp.pad(jnp.asarray(q), ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-_ZP)
    acc = lax.conv_general_dilated(
        xp, jnp.asarray(w8), (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    zpk = np.sum(w8.astype(np.int64), axis=(0, 1, 2)).astype(np.float32)
    got = (acc.astype(jnp.float32) + _ZP * zpk) * s_in
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_quantized_avgpool_matches_offset_semantics():
    """avg(q) + ZP == avg(q + ZP) with consistent round-half-up, so the
    int8 pool is representation-exact for the offset coding too."""
    from acvae_tpu.models.quant import _avgpool_i8

    rng = np.random.default_rng(2)
    q = rng.integers(-128, 128, size=(3, 8, 6, 5)).astype(np.int8)
    got = np.asarray(_avgpool_i8(jnp.asarray(q))).astype(np.int32)
    s = (q[:, ::2, ::2].astype(np.int64) + q[:, 1::2, ::2]
         + q[:, ::2, 1::2] + q[:, 1::2, 1::2])
    want = np.floor((s + 2) / 4).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    # and in the shifted (true-value) domain:
    s_shift = s + 4 * 128
    want_shift = np.floor((s_shift + 2) / 4).astype(np.int32) - 128
    np.testing.assert_array_equal(got, want_shift)


def test_offset_requant_folds_relu():
    """The offset requantize takes the PRE-relu affine output: negative
    values round below -ZP and clip to -128 — the exact code for v=0 — so
    skipping the explicit relu (one VPU op per element, quant.py
    ``_requantize``) is bit-exact, not an approximation."""
    from acvae_tpu.models.quant import _ZP

    rng = np.random.default_rng(5)
    # dense coverage of the rounding boundaries around 0 plus wide range
    y = jnp.asarray(np.concatenate([
        rng.normal(scale=300.0, size=20000),
        np.linspace(-2.0, 2.0, 4001),  # half-integer rounding boundaries
        np.array([0.0, -0.5, 0.5, -0.49999, 255.0, 254.5, 1e9, -1e9]),
    ]).astype(np.float32))
    with_relu = jnp.clip(jnp.round(jnp.maximum(y, 0.0)) - _ZP,
                         -128, 127).astype(jnp.int8)
    without = jnp.clip(jnp.round(y) - _ZP, -128, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(with_relu), np.asarray(without))


class TestPromotedDefaultConsistency:
    """The promoted serving scheme (models/quant.py DEFAULT_INT8_SCHEME)
    must be what every int8 entry point defaults to — a drifted default
    would silently serve a different program than the one the RESULTS
    decision table promoted."""

    def test_defaults_agree(self):
        import inspect

        from acvae_tpu.cli.main import Runner
        from acvae_tpu.models.quant import DEFAULT_INT8_SCHEME, SCHEMES
        from acvae_tpu.serve import CaptionService

        assert DEFAULT_INT8_SCHEME in SCHEMES
        for fn in (Runner.evaluate, Runner.serve, Runner.export_model):
            sig = inspect.signature(fn)
            assert sig.parameters["int8_scheme"].default \
                == DEFAULT_INT8_SCHEME, fn.__name__
        sig = inspect.signature(CaptionService.__init__)
        assert sig.parameters["int8_scheme"].default == DEFAULT_INT8_SCHEME


def test_symmetric_requant_folds_relu():
    """Round-4 twin of the offset relu fold: post-relu symmetric coding
    occupies codes 0..127, so ``clip(round(y), 0, 127)`` maps every y < 0
    to code 0 == relu — bit-exact vs the explicit ``maximum`` path
    (quant.py ``_requantize``, symmetric branch)."""
    rng = np.random.default_rng(6)
    y = jnp.asarray(np.concatenate([
        rng.normal(scale=300.0, size=20000),
        np.linspace(-2.0, 2.0, 4001),
        np.array([0.0, -0.5, 0.5, -0.49999, 127.0, 127.5, 1e9, -1e9]),
    ]).astype(np.float32))
    with_relu = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), -127,
                         127).astype(jnp.int8)
    without = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(with_relu), np.asarray(without))


def test_fused_stem_matches_two_step_quantizer():
    """_quant_stem (fused bn0+scale affine, int8 lane pad) agrees with the
    two-step f32 path (bn0 -> f32 pad -> divide by scale -> round/clip)
    everywhere except f32-associativity ULP ties: codes differ by at most
    1 on a vanishing fraction of elements."""
    from acvae_tpu.models.quant import QuantPannEncoder

    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(N, T, F)).astype(np.float32))
    lens = jnp.array([T, T, 96, 64])
    m = Cnn10(embed_size=CH[-1], channels=CH)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               feats, lens, train=False)
    enc = QuantCnn10(dict(v), feats, lens, channels=CH)
    q = enc._quant_stem(feats)
    x_f = enc._stem(feats)
    s0 = enc.act_scales[0]
    q_ref = jnp.clip(jnp.round(x_f / s0), -127, 127).astype(jnp.int8)
    d = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert d.max() <= 1
    assert (d != 0).mean() < 1e-3, (d != 0).mean()


def test_v4_tail_quantized_matches_f32(setup):
    """Scheme v4 (quant_tail): the final conv requantizes and the pool +
    freq mean run in the quantized domain — accuracy must stay within the
    family's cosine tolerance vs the f32 encoder."""
    from acvae_tpu.models.quant import scheme_kwargs

    enc, v, feats, lens = setup
    ref = enc.apply(v, feats, lens, train=False)
    q = QuantCnn10(v, feats, lens, channels=CH, **scheme_kwargs("v4"))
    out = q(feats, lens)
    assert out["audio_embeds"].shape == ref["audio_embeds"].shape
    a = np.asarray(ref["audio_embeds"]).ravel()
    b = np.asarray(out["audio_embeds"]).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.995, cos


def test_v4_invalid_compositions_rejected(setup):
    enc, v, feats, lens = setup
    with pytest.raises(ValueError, match="symmetric"):
        QuantCnn10(v, feats, lens, channels=CH, offset=True, quant_tail=True)
    with pytest.raises(ValueError, match="bias_correct"):
        QuantCnn10(v, feats, lens, channels=CH, offset=False,
                   quant_tail=True, bias_correct=True)
