"""Regression tests for bugs found driving the CLI end-to-end.

1. Encoder/decoder embed-size mismatch: every model family adapts the encoder
   memory with the ``ln`` Dense (the reference's ``self.ln``,
   vae_model.py:30-32), so the factory must size the decoder's ``enc_mem_size``
   by the *decoder* embed dim, not the raw encoder dim.
2. YAML 1.1 scientific notation: pyyaml parses ``1e-3`` as a string; the
   config loader coerces bare scientific-notation scalars to float so
   ``lr: 1e-3`` works like every YAML-1.2 reader expects.
"""
import jax
import jax.numpy as jnp
import numpy as np

from acvae_tpu.core.config import load_config
from acvae_tpu.models.build import build_model


def test_mismatched_encoder_decoder_dims(rng):
    cfg = {
        "model": "Hybrid_VAEModel",
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": 16, "channels": [4, 8, 8, 16]},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": 8, "hidden_size": 8},
        "model_args": {
            "posterior_model": "PosteriorRNN_hybrid",
            "posterior_args": {"hidden_size": 8},
            "prior_model": "PriorRNN",
            "prior_args": {"hidden_size": 8},
        },
    }
    model = build_model(cfg, vocab_size=23, data_dim=64)
    feats = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    feat_lens = jnp.array([64, 48])
    caps = jnp.ones((2, 10), jnp.int32)
    cap_lens = jnp.array([10, 7])
    v = model.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                   feats, feat_lens, caps, cap_lens, train=False)
    out, _ = model.apply(v, feats, feat_lens, caps, cap_lens, train=True,
                         ss_ratio=1.0, dis_ratio=0.0,
                         rngs={"sample": jax.random.key(2),
                               "dropout": jax.random.key(3)},
                         mutable=["batch_stats"])
    assert out["logits"].shape == (2, 9, 23)
    # the adapter exists and the decoder sees 8-dim memory
    assert "ln" in v["params"]


def test_yaml11_scientific_notation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("optimizer_args:\n  lr: 1e-3\n"
                 "beta: 5E4\nremark: exp_1e\nvalues: [1e-2, two]\n")
    cfg = load_config(str(p))
    assert cfg["optimizer_args"]["lr"] == 1e-3
    assert cfg["beta"] == 5e4
    assert cfg["remark"] == "exp_1e"        # not bare sci-notation: untouched
    assert cfg["values"] == [1e-2, "two"]
    # CLI overrides too
    cfg = load_config(str(p), **{"optimizer_args.lr": "2e-4"})
    assert cfg["optimizer_args"]["lr"] == 2e-4
