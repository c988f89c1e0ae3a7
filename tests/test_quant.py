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
