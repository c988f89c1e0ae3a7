"""Stage-1 GE2E, global sentence VAE, discriminators, loss wrappers,
pretrained merging."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.losses.wrappers import (adverse_loss, augment_keep_mask,
                                       augment_loss, bce_logits_loss,
                                       condition_loss, gumbel_softmax,
                                       masked_cross_entropy,
                                       reparameterize_argmax,
                                       specificity_loss)
from acvae_tpu.models.discriminator import DiscriminatorModel
from acvae_tpu.models.global_vae import GlobalSentenceVAE
from acvae_tpu.models.stage1 import (GE2ELoss, Stage1Encoder, get_centroids,
                                     get_cossim, get_utterance_centroids)
from acvae_tpu.train.pretrained import merge_pretrained

V = 29


class TestStage1:
    def test_ge2e_matches_torch_reference_math(self, rng):
        """get_cossim/calc_loss vs the reference torch code
        (models/utils.py:214-274) re-executed here."""
        import torch
        import torch.nn.functional as F

        A, M, E = 4, 3, 8
        emb = rng.normal(size=(A, M, E)).astype(np.float32)

        ours_cos = np.asarray(get_cossim(jnp.asarray(emb),
                                         get_centroids(jnp.asarray(emb))))

        # torch reference
        temb = torch.tensor(emb)
        centroids = temb.mean(dim=1)
        sum_c = temb.sum(dim=1).reshape(A, 1, E)
        utt_centroids = (sum_c - temb) / (M - 1)
        cos_same = F.cosine_similarity(temb.reshape(A * M, E),
                                       utt_centroids.reshape(A * M, E))
        cent_exp = centroids.repeat(M * A, 1)
        emb_exp = temb.reshape(A * M, E).unsqueeze(1).repeat(1, A, 1)
        emb_exp = emb_exp.reshape(A * M * A, E)
        cos_diff = F.cosine_similarity(emb_exp, cent_exp).reshape(A, M, A)
        idx = list(range(A))
        cos_diff[idx, :, idx] = cos_same.reshape(A, M)
        ref_cos = (cos_diff + 1e-6).numpy()
        np.testing.assert_allclose(ours_cos, ref_cos, rtol=1e-4, atol=1e-5)

        loss_mod = GE2ELoss()
        params = loss_mod.init(jax.random.key(0), jnp.asarray(emb))
        ours_loss = loss_mod.apply(params, jnp.asarray(emb))
        sim = 10.0 * torch.tensor(ref_cos) - 5.0
        pos = sim[idx, :, idx]
        neg = (torch.exp(sim).sum(dim=2) + 1e-6).log()
        ref_loss = (-1 * (pos - neg)).sum()
        np.testing.assert_allclose(float(ours_loss), float(ref_loss),
                                   rtol=1e-4)

    def test_encoder_shapes(self, rng):
        caps = jnp.asarray(rng.integers(1, V, size=(6, 10)))
        lens = jnp.array([10, 8, 5, 10, 4, 7])
        enc = Stage1Encoder(vocab_size=V, word_dim=8, hidden_size=8,
                            embed_size=16)
        variables = enc.init(jax.random.key(0), caps, lens, train=False)
        out = enc.apply(variables, caps, lens, train=False)
        assert out.shape == (6, 16)

    def test_ge2e_training_separates(self, rng):
        """A few GE2E steps should decrease the loss."""
        import optax
        A, M = 3, 4
        caps = jnp.asarray(rng.integers(4, V, size=(A * M, 8)))
        lens = jnp.full((A * M,), 8)
        enc = Stage1Encoder(vocab_size=V, word_dim=8, hidden_size=8,
                            embed_size=8)
        loss_mod = GE2ELoss()
        ev = enc.init(jax.random.key(0), caps, lens, train=False)
        lv = loss_mod.init(jax.random.key(1), jnp.zeros((A, M, 8)))
        params = {"enc": ev["params"], "loss": lv["params"]}
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        def loss_fn(p, bs):
            emb, updates = enc.apply(
                {"params": p["enc"], "batch_stats": bs}, caps, lens,
                train=True, mutable=["batch_stats"])
            emb = emb.reshape(A, M, -1)
            return loss_mod.apply({"params": p["loss"]}, emb), updates

        bs = ev["batch_stats"]
        losses = []
        for _ in range(20):
            (l, updates), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs)
            bs = updates["batch_stats"]
            upd, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
        assert losses[-1] < losses[0]


class TestGlobalVAE:
    def test_train_and_inference(self, rng):
        caps = jnp.asarray(rng.integers(4, V, size=(5, 9)))
        lens = jnp.full((5,), 9)
        model = GlobalSentenceVAE(vocab_size=V, word_dim=8, hidden_size=8,
                                  latent_size=8)
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            caps, lens, train=False)
        out = model.apply(variables, caps, lens, train=True,
                          rngs={"sample": jax.random.key(2)})
        assert out["logits"].shape == (5, 8, V)
        assert out["mu"].shape == (5, 8)
        gen = model.apply(variables, 4, method=model.inference,
                          rngs={"sample": jax.random.key(3)})
        assert gen["seqs"].shape[0] == 4


class TestDiscriminator:
    def test_probability_output(self, rng):
        caps = jnp.asarray(rng.integers(1, V, size=(4, 7)))
        lens = jnp.full((4,), 7)
        audio = jnp.asarray(rng.normal(size=(4, 10, 12)).astype(np.float32))
        alens = jnp.full((4,), 10)
        d = DiscriminatorModel(vocab_size=V, audio_dim=12, word_dim=8,
                               hidden_size=8, embed_size=8)
        variables = d.init(jax.random.key(0),
                           {"audio_feats": audio, "feats_lens": alens,
                            "caps": caps, "lens": lens})
        p = d.apply(variables, {"audio_feats": audio, "feats_lens": alens,
                                "caps": caps, "lens": lens})
        assert p.shape == (4,)
        assert np.all((np.asarray(p) > 0) & (np.asarray(p) < 1))

    def test_soft_caption_input_differentiable(self, rng):
        soft = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(4, 7, V)).astype(np.float32)))
        lens = jnp.full((4,), 7)
        audio = jnp.asarray(rng.normal(size=(4, 12)).astype(np.float32))
        d = DiscriminatorModel(vocab_size=V, audio_dim=12, word_dim=8,
                               hidden_size=8, embed_size=8)
        variables = d.init(jax.random.key(0),
                           {"audio_feats": audio, "feats_lens": None,
                            "caps": soft, "lens": lens})

        def f(s):
            return jnp.sum(d.apply(variables,
                                   {"audio_feats": audio, "feats_lens": None,
                                    "caps": s, "lens": lens}))

        g = jax.grad(f)(soft)
        assert np.all(np.isfinite(np.asarray(g)))


class TestLossWrappers:
    def test_straight_through_argmax(self, rng):
        logits = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
        out = reparameterize_argmax(logits)
        # forward value equals the one-hot of the argmax
        hard = np.asarray(jax.nn.one_hot(np.argmax(logits, -1), 5))
        np.testing.assert_allclose(np.asarray(out), hard, atol=1e-5)
        # gradient flows to logits
        g = jax.grad(lambda l: jnp.sum(reparameterize_argmax(l) ** 2))(logits)
        assert np.any(np.asarray(g) != 0)

    def test_gumbel_softmax_one_hot(self, rng):
        logits = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
        out = gumbel_softmax(logits, jax.random.key(0))
        s = np.asarray(out).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_augment_loss_downweights(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 6, V)).astype(np.float32))
        targets = jnp.asarray(rng.integers(0, V, size=(4, 6)))
        lens = jnp.full((4,), 6)
        keep = augment_keep_mask(["c1", "c2_aug", "c3", "c4_aug"], 0.0,
                                 np.random.default_rng(0))
        np.testing.assert_array_equal(np.asarray(keep),
                                      [True, False, True, False])
        l_all = augment_loss(logits, targets, lens, jnp.ones(4, bool))
        l_half = augment_loss(logits, targets, lens, keep)
        assert np.isfinite(float(l_half)) and float(l_half) != float(l_all)

    def test_adverse_loss_components(self, rng):
        N, T = 3, 5
        logits = jnp.asarray(rng.normal(size=(N, T, V)).astype(np.float32))
        targets = jnp.asarray(rng.integers(0, V, size=(N, T)))
        stats = [jnp.asarray(rng.normal(size=(N, T, 4)).astype(np.float32))
                 for _ in range(4)]
        lens = jnp.full((N,), T)
        label = jnp.asarray(rng.uniform(size=(N,)).astype(np.float32))

        def dscrm_fn(batch):
            return jnp.full((N,), 0.7)

        loss, ce, kl, ds = adverse_loss(
            logits, targets, *stats, logits, label, lens, dscrm_fn,
            jax.random.key(0), alpha=0.3, beta=0.5)
        np.testing.assert_allclose(float(loss),
                                   float(ce + 0.5 * kl + 0.3 * ds), rtol=1e-5)

    def test_condition_and_specificity(self, rng):
        N, T = 3, 5
        logits = jnp.asarray(rng.normal(size=(N, T, V)).astype(np.float32))
        lens = jnp.full((N,), T)
        cond = jnp.asarray(rng.uniform(size=(N,)).astype(np.float32))
        word_loss = jnp.asarray(1.5)
        total, w, c = condition_loss(
            word_loss, logits, cond, lens,
            lambda b: jnp.full((N,), 0.5), jax.random.key(0), alpha=2.0)
        np.testing.assert_allclose(float(total), float(w + 2.0 * c), rtol=1e-5)
        spec = jnp.asarray(rng.uniform(size=(V,)).astype(np.float32))
        total2, _, c2 = specificity_loss(word_loss, logits, cond, lens, spec)
        assert np.isfinite(float(total2))


class TestPretrained:
    def test_shape_filtered_merge(self):
        params = {"a": {"w": np.zeros((3, 3)), "b": np.zeros((3,))},
                  "c": {"w": np.zeros((2, 2))}}
        pre = {"a": {"w": np.ones((3, 3)), "b": np.ones((5,))},
               "d": {"w": np.ones((9,))}}
        merged, n, total = merge_pretrained(params, pre, log=lambda *a: None)
        assert n == 1 and total == 3
        np.testing.assert_array_equal(merged["a"]["w"], np.ones((3, 3)))
        np.testing.assert_array_equal(merged["a"]["b"], np.zeros((3,)))


class TestEqualErrorRate:
    def test_separable_scores_zero_eer(self):
        from acvae_tpu.models.stage1 import equal_error_rate
        # A=2 audios, Mv=2 verify caps: genuine 0.9, impostor 0.1
        sim = np.full((2, 2, 2), 0.1)
        sim[0, :, 0] = sim[1, :, 1] = 0.9
        eer, thr = equal_error_rate(jnp.asarray(sim))
        assert eer == 0.0
        assert 0.1 <= thr < 0.9

    def test_overlapping_scores_hand_computed(self):
        from acvae_tpu.models.stage1 import equal_error_rate
        # genuine [0.8, 0.4], impostor [0.6, 0.2]: FAR=FRR=0.5 on
        # thresholds [0.4, 0.6) -> EER 0.5 at the first such threshold
        sim = np.zeros((2, 1, 2))
        sim[0, 0] = [0.8, 0.6]
        sim[1, 0] = [0.2, 0.4]
        eer, thr = equal_error_rate(jnp.asarray(sim))
        assert eer == 0.5
        assert abs(thr - 0.4) < 1e-9

    def test_degenerate_similarities_report_half(self):
        """Regression: a collapsed embedder (all similarities identical and
        high) must report EER 0.5, not a perfect 0.0 (the reference's
        diff=1 init bug, stage1_runner.py:190)."""
        from acvae_tpu.models.stage1 import equal_error_rate
        sim = np.full((2, 2, 2), 0.995)
        eer, _ = equal_error_rate(jnp.asarray(sim))
        assert eer == 0.5
        with pytest.raises(ValueError):
            equal_error_rate(jnp.full((1, 2, 1), 0.5))
