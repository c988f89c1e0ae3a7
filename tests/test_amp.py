"""bf16 decode mode (ops/amp.py): boundary param cast + dtype-following loop.

The default f32 decode keeps its exact-parity guarantees (the beam/DBS
golden tests); these tests pin the bf16 mode's contract: it runs every
decode flavor, score math stays f32, and the cast itself is shaped right.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.models.decoders import VAERNNBahdanauAttnDecoder
from acvae_tpu.models.encoders import Cnn10
from acvae_tpu.models.latent import PosteriorRNNHybrid, PriorRNN
from acvae_tpu.models.vae import VAECaptionModel
from acvae_tpu.ops.amp import (cast_floats, cast_floats_for_decode,
                               resolve_decode_dtype)

VOCAB = 53
E = 16


def tiny_flagship():
    return VAECaptionModel(
        encoder=Cnn10(inputdim=64, embed_size=E, channels=(4, 4, 8, E)),
        decoder=VAERNNBahdanauAttnDecoder(vocab_size=VOCAB, enc_mem_size=E,
                                          embed_size=E, hidden_size=E),
        qnet=PosteriorRNNHybrid(vocab_size=VOCAB, word_dim=E, embed_size=E,
                                hidden_size=E),
        pnet=PriorRNN(vocab_size=VOCAB, word_dim=E, audiofeats_size=E,
                      embed_size=E, hidden_size=E),
        global_constraint=True)


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_flagship()
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(3, 64, 64)).astype(np.float32))
    feat_lens = jnp.asarray([64, 48, 32], jnp.int32)
    caps = jnp.asarray(rng.integers(4, VOCAB, size=(3, 10)).astype(np.int32))
    caps = caps.at[:, 0].set(1)
    cap_lens = jnp.asarray([10, 8, 6], jnp.int32)
    variables = model.init({"params": jax.random.key(0),
                            "sample": jax.random.key(1)},
                           feats, feat_lens, caps, cap_lens, train=False)
    return model, variables, feats, feat_lens, caps, cap_lens


def test_cast_floats_for_decode_shapes_and_dtypes(model_and_vars):
    _, variables, *_ = model_and_vars
    vb = cast_floats_for_decode(variables, jnp.bfloat16)
    # every float param is bf16, batch_stats stay f32, structure unchanged
    p_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(vb["params"])
                if jnp.issubdtype(x.dtype, jnp.inexact)}
    assert p_dtypes == {jnp.dtype(jnp.bfloat16)}
    s_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(vb["batch_stats"])}
    assert s_dtypes == {jnp.dtype(jnp.float32)}
    assert (jax.tree_util.tree_structure(vb)
            == jax.tree_util.tree_structure(variables))


def test_cast_floats_leaves_integers_alone():
    tree = {"a": jnp.zeros((2,), jnp.int32), "b": jnp.zeros((2,), jnp.float32)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.int32
    assert out["b"].dtype == jnp.bfloat16


def test_resolve_decode_dtype(monkeypatch):
    assert resolve_decode_dtype(None) is None
    assert resolve_decode_dtype("float32") is None
    assert resolve_decode_dtype("bfloat16") == jnp.dtype(jnp.bfloat16)
    monkeypatch.setenv("ACVAE_DECODE_DTYPE", "bfloat16")
    assert resolve_decode_dtype(None) == jnp.dtype(jnp.bfloat16)
    assert resolve_decode_dtype("float32") is None  # explicit f32 wins


@pytest.mark.parametrize("method,kwargs", [
    ("beam", {"beam_size": 3}),
    ("greedy", {}),
    ("sample", {"temp": 1.3}),
    ("dbs", {"beam_size": 4, "group_size": 2}),
])
def test_bf16_decode_runs_every_flavor(model_and_vars, method, kwargs):
    model, variables, feats, feat_lens, *_ = model_and_vars
    vb = cast_floats_for_decode(variables, jnp.bfloat16)
    out = model.apply(vb, feats, feat_lens, decode_method=method,
                      rngs={"sample": jax.random.key(3)}, **kwargs)
    seqs = np.asarray(out["seqs"])
    assert seqs.dtype == np.int32
    assert ((seqs >= 0) & (seqs < VOCAB)).all()
    if method in ("greedy", "sample"):
        # reported logprobs stay f32 (decoding/sampling.py casts)
        assert out["sampled_logprobs"].dtype == jnp.float32
    if method == "beam":
        assert out["scores"].dtype == jnp.float32


def test_bf16_forced_decode_replays(model_and_vars):
    """SCST replay contract holds in bf16: forced_decode over a bf16 rollout's
    seqs returns the same logprobs the rollout reported."""
    model, variables, feats, feat_lens, *_ = model_and_vars
    vb = cast_floats_for_decode(variables, jnp.bfloat16)
    key = jax.random.key(9)
    roll = model.apply(vb, feats, feat_lens, decode_method="sample",
                       rngs={"sample": key})
    replay = model.apply(vb, feats, feat_lens, roll["seqs"],
                         rngs={"sample": key}, method=model.forced_decode)
    # identical eps stream + identical (bf16) compute ⇒ identical logprobs
    # up to and including the first <end> (past it the rollout records the
    # pre-freeze sampled word's logprob while replay scores <end> — those
    # positions are masked out of the SCST loss, in f32 and bf16 alike)
    seqs = np.asarray(roll["seqs"])
    ended = np.cumsum(seqs == 2, axis=1) > 1  # strictly after first <end>
    lp_roll = np.asarray(roll["sampled_logprobs"])
    lp_rep = np.asarray(replay["sampled_logprobs"])
    np.testing.assert_allclose(lp_rep[~ended], lp_roll[~ended],
                               rtol=0, atol=0)


def test_default_f32_decode_unchanged_by_amp_plumbing(model_and_vars):
    """build_decode_fn(decode_dtype=None) is bit-identical to a direct
    apply — the amp plumbing must be a no-op for the exact default."""
    from acvae_tpu.export import build_decode_fn
    model, variables, feats, feat_lens, *_ = model_and_vars
    direct = model.apply(variables, feats, feat_lens, decode_method="beam",
                         beam_size=3, max_length=8,
                         rngs={"sample": jax.random.key(7)})
    fn = build_decode_fn(model, variables, decode_dtype=None,
                         decode_method="beam", beam_size=3, max_length=8)
    via = fn(feats, feat_lens, 7)
    # same seed route: build_decode_fn uses jax.random.key(seed)
    np.testing.assert_array_equal(np.asarray(direct["seqs"]),
                                  np.asarray(via["seqs"]))


@pytest.mark.parametrize("family", ["trans_vae", "attn", "transformer"])
def test_bf16_decode_other_model_families(family):
    """The boundary cast must hold for every captioner family the decode
    CLI can route (dtype-following carries in trans_vae.py/captioner.py)."""
    from acvae_tpu.models.captioner import (AttnCaptionModel,
                                            TransformerCaptionModel)
    from acvae_tpu.models.decoders import (RNNBahdanauAttnDecoder,
                                           TransformerDecoder,
                                           VAETransformerDecoder)
    from acvae_tpu.models.latent import PosteriorRNN
    from acvae_tpu.models.trans_vae import TransVAECaptionModel

    enc = Cnn10(inputdim=64, embed_size=E, channels=(4, 4, 8, E))
    if family == "trans_vae":
        model = TransVAECaptionModel(
            encoder=enc,
            decoder=VAETransformerDecoder(vocab_size=VOCAB, enc_mem_size=E,
                                          embed_size=E, nhead=2, nlayers=1,
                                          hidden_size=32),
            qnet=PosteriorRNN(vocab_size=VOCAB, word_dim=E, embed_size=E,
                              hidden_size=E),
            pnet=PriorRNN(vocab_size=VOCAB, word_dim=E, audiofeats_size=E,
                          embed_size=E, hidden_size=E))
    elif family == "attn":
        model = AttnCaptionModel(
            encoder=enc,
            decoder=RNNBahdanauAttnDecoder(vocab_size=VOCAB, enc_mem_size=E,
                                           embed_size=E, hidden_size=E))
    else:
        model = TransformerCaptionModel(
            encoder=enc,
            decoder=TransformerDecoder(vocab_size=VOCAB, enc_mem_size=E,
                                       embed_size=E, nhead=2, nlayers=1,
                                       hidden_size=32))
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    feat_lens = jnp.asarray([64, 48], jnp.int32)
    caps = jnp.asarray(rng.integers(4, VOCAB, size=(2, 8)).astype(np.int32))
    caps = caps.at[:, 0].set(1)
    cap_lens = jnp.asarray([8, 6], jnp.int32)
    variables = model.init({"params": jax.random.key(0),
                            "sample": jax.random.key(1)},
                           feats, feat_lens, caps, cap_lens, train=False)
    vb = cast_floats_for_decode(variables, jnp.bfloat16)
    for method in ("beam", "greedy"):
        out = model.apply(vb, feats, feat_lens, decode_method=method,
                          max_length=6, rngs={"sample": jax.random.key(3)})
        seqs = np.asarray(out["seqs"])
        assert ((seqs >= 0) & (seqs < VOCAB)).all()


def test_bf16_vs_f32_tokens_mostly_agree_after_training_signal(model_and_vars):
    """On an *untrained* model near-ties dominate, so token equality is not
    required — but both modes must emit the same shapes and valid tokens,
    and the bf16 logits must track f32 closely at the first step."""
    model, variables, feats, feat_lens, caps, cap_lens = model_and_vars
    vb = cast_floats_for_decode(variables, jnp.bfloat16)
    o32 = model.apply(variables, feats, feat_lens, decode_method="beam",
                      beam_size=3, rngs={"sample": jax.random.key(3)})
    o16 = model.apply(vb, feats, feat_lens, decode_method="beam",
                      beam_size=3, rngs={"sample": jax.random.key(3)})
    assert np.asarray(o16["seqs"]).shape == np.asarray(o32["seqs"]).shape
    # scores land in the same range (not wildly diverged programs)
    s32, s16 = np.asarray(o32["scores"]), np.asarray(o16["scores"])
    assert np.isfinite(s16).all()
    assert abs(s32.mean() - s16.mean()) < 1.0
