"""Golden-value tests for masked ops and losses against torch reference math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from acvae_tpu.ops import (
    cross_entropy,
    gmm_kl_loss,
    label_smoothing_loss,
    length_mask,
    max_with_lens,
    mean_with_lens,
    normal_kl_loss,
    scst_loss,
)


def torch_mean_with_lens(features, lens):
    # utils/train_util.py:207-217
    N, T = features.shape[:2]
    idxs = torch.arange(T).repeat(N).view(N, T)
    mask = (idxs < lens.view(-1, 1))
    fm = features * mask.unsqueeze(-1)
    return fm.sum(1) / lens.unsqueeze(1)


def torch_max_with_lens(features, lens):
    # utils/train_util.py:220-231
    N, T = features.shape[:2]
    idxs = torch.arange(T).repeat(N).view(N, T)
    mask = (idxs < lens.view(-1, 1))
    fmax = features.clone()
    fmax[~mask] = float("-inf")
    return fmax.max(1)[0]


class TestMasked:
    def test_length_mask(self):
        m = length_mask(jnp.array([1, 3, 0]), 4)
        expected = np.array([
            [True, False, False, False],
            [True, True, True, False],
            [False, False, False, False],
        ])
        np.testing.assert_array_equal(np.asarray(m), expected)

    @pytest.mark.parametrize("shape", [(4, 7, 5), (3, 9, 2)])
    def test_mean_with_lens_matches_torch(self, rng, shape):
        x = rng.normal(size=shape).astype(np.float32)
        lens = rng.integers(1, shape[1] + 1, size=shape[0])
        ours = mean_with_lens(jnp.asarray(x), jnp.asarray(lens))
        ref = torch_mean_with_lens(torch.tensor(x), torch.tensor(lens))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_max_with_lens_matches_torch(self, rng):
        x = rng.normal(size=(4, 7, 5)).astype(np.float32)
        lens = rng.integers(1, 8, size=4)
        ours = max_with_lens(jnp.asarray(x), jnp.asarray(lens))
        ref = torch_max_with_lens(torch.tensor(x), torch.tensor(lens))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


class TestLosses:
    def test_cross_entropy_matches_torch(self, rng):
        logits = rng.normal(size=(30, 11)).astype(np.float32)
        targets = rng.integers(0, 11, size=30)
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(targets))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_cross_entropy_masked_equals_packed(self, rng):
        # masked CE over padded [N, T] == CE over the packed valid tokens
        N, T, V = 3, 6, 9
        logits = rng.normal(size=(N, T, V)).astype(np.float32)
        targets = rng.integers(0, V, size=(N, T))
        lens = np.array([6, 2, 4])
        mask = np.asarray(length_mask(jnp.asarray(lens), T))
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask))
        packed_logits = np.concatenate([logits[i, :l] for i, l in enumerate(lens)])
        packed_tgts = np.concatenate([targets[i, :l] for i, l in enumerate(lens)])
        ref = F.cross_entropy(torch.tensor(packed_logits), torch.tensor(packed_tgts))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_label_smoothing_matches_reference_formula(self, rng):
        # utils/train_util.py:243-251
        logits = rng.normal(size=(20, 13)).astype(np.float32)
        targets = rng.integers(0, 13, size=20)
        smoothing = 0.1
        pred = F.log_softmax(torch.tensor(logits), dim=-1)
        true_dist = torch.zeros_like(pred).fill_(smoothing / (13 - 1))
        true_dist.scatter_(1, torch.tensor(targets).unsqueeze(1), 1.0 - smoothing)
        ref = torch.mean(torch.sum(-true_dist * pred, dim=-1))
        ours = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), smoothing)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_normal_kl_matches_reference_formula(self, rng):
        # utils/train_util.py:259-266
        mu1, lv1, mu2, lv2 = (rng.normal(size=(4, 5, 8)).astype(np.float32) for _ in range(4))
        t = [torch.tensor(a) for a in (mu1, lv1, mu2, lv2)]
        v1, v2 = torch.exp(t[1]), torch.exp(t[3])
        kl = t[3] / 2 - t[1] / 2 + ((v1 + (t[0] - t[2]) ** 2) / (2 * v2)) - 0.5
        ref = kl.sum(-1).mean()
        ours = normal_kl_loss(*(jnp.asarray(a) for a in (mu1, lv1, mu2, lv2)))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_normal_kl_zero_when_equal(self, rng):
        mu = rng.normal(size=(3, 4)).astype(np.float32)
        lv = rng.normal(size=(3, 4)).astype(np.float32)
        out = normal_kl_loss(jnp.asarray(mu), jnp.asarray(lv), jnp.asarray(mu), jnp.asarray(lv))
        np.testing.assert_allclose(float(out), 0.0, atol=1e-6)

    def test_gmm_kl_matches_reference_formula(self, rng):
        # utils/train_util.py:279-291
        K, N, E = 3, 5, 4
        mu1, lv1, mu2, lv2 = (rng.normal(size=(K, N, E)).astype(np.float32) for _ in range(4))
        c1, c2 = (rng.normal(size=(K,)).astype(np.float32) for _ in range(2))
        tc1 = torch.softmax(torch.tensor(c1), dim=0)
        tc2 = torch.softmax(torch.tensor(c2), dim=0)
        t = [torch.tensor(a) for a in (mu1, lv1, mu2, lv2)]
        v1, v2 = torch.exp(t[1]), torch.exp(t[3])
        kl_i = t[3] / 2 - t[1] / 2 + ((v1 + (t[0] - t[2]) ** 2) / (2 * v2)) - 0.5
        kl_c = (tc1 * (tc1.log() - tc2.log())).sum()
        kl = (tc1.view(K, 1, 1) * kl_i).sum(0)
        ref = kl_c + kl.sum(-1).mean()
        ours = gmm_kl_loss(
            jnp.asarray(mu1), jnp.asarray(lv1), jnp.asarray(c1),
            jnp.asarray(mu2), jnp.asarray(lv2), jnp.asarray(c2))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_scst_loss_mask_semantics(self):
        # utils/train_util.py:401-409: mask is 1 at t=0 and where prev != end
        logprobs = jnp.array([[-1.0, -1.0, -1.0, -1.0]])
        seqs = jnp.array([[5, 2, 2, 2]])  # ends at position 1
        reward = jnp.array([2.0])
        # mask = [1, 1, 0, 0] -> loss = -(-1*2) * 2 valid = 4
        out = scst_loss(logprobs, seqs, reward)
        np.testing.assert_allclose(float(out), 4.0, rtol=1e-6)

    def test_losses_are_jittable(self, rng):
        logits = jnp.asarray(rng.normal(size=(6, 7)).astype(np.float32))
        targets = jnp.asarray(rng.integers(0, 7, size=6))
        out = jax.jit(label_smoothing_loss, static_argnames="smoothing")(
            logits, targets, smoothing=0.1)
        assert jnp.isfinite(out)
