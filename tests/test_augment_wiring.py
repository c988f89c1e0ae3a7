"""On-device augmentation wired into the train step."""
import jax
import jax.numpy as jnp
import numpy as np

from acvae_tpu.data import CaptionDataset, CaptionLoader, make_synthetic_clotho
from acvae_tpu.models.build import build_model
from acvae_tpu.ops.specaug import build_augment
from acvae_tpu.train.trainer import TrainState, build_optimizer, make_train_step

E = 16


def test_build_augment_semantics(rng):
    feats = jnp.asarray(rng.normal(size=(4, 64, 8)).astype(np.float32))
    lens = jnp.array([64, 48, 32, 64])
    fn = build_augment(["timemask", "freqmask"], p=1.0)
    out, out_lens = fn(feats, lens, jax.random.key(0))
    assert out.shape == feats.shape
    assert not np.array_equal(np.asarray(out), np.asarray(feats))
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(lens))
    # crop keeps the static buffer; winners' lens drop to the crop size
    fn2 = build_augment(["randomcrop"], crop_size=32, crop_p=1.0)
    out2, lens2 = fn2(feats, lens, jax.random.key(1))
    assert out2.shape == (4, 64, 8)
    assert int(lens2.max()) == 32


def test_train_step_with_augment(rng):
    feats, info, vocab = make_synthetic_clotho(num_audios=3)
    cfg = {"model": "VAEModel", "encodermodel": "Cnn10",
           "encoder_args": {"embed_size": E, "channels": (4, 8, 8, E)},
           "decoder": "VAERNNBahdanauAttnDecoder",
           "decoder_args": {"embed_size": E, "hidden_size": E},
           "model_args": {"posterior_model": "PosteriorRNN",
                          "posterior_args": {"hidden_size": E},
                          "prior_model": "PriorRNN",
                          "prior_args": {"hidden_size": E}}}
    model = build_model(cfg, len(vocab), 64)
    ds = CaptionDataset(caption_info=info, vocabulary=vocab, features=feats)
    batch = next(iter(CaptionLoader(ds, batch_size=6, buckets=(256,))))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        arrays["feats"], arrays["feat_lens"], arrays["caps"],
        arrays["cap_lens"], train=False)
    state = TrainState.create(variables, build_optimizer("Adam", 1e-3))
    aug = build_augment(["timemask", "freqmask"], p=0.5)
    step = make_train_step(model, augment=aug, donate=False)
    state, metrics = step(state, arrays, jax.random.key(2), 1.0, 0.0, 0.5, 0.0)
    assert np.isfinite(float(metrics["loss"]))
