"""Training integration: schedules, jitted train step, overfit-a-tiny-set."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.data import CaptionDataset, CaptionLoader, make_synthetic_clotho
from acvae_tpu.models.decoders import VAERNNBahdanauAttnDecoder
from acvae_tpu.models.encoders import Cnn10
from acvae_tpu.models.latent import PosteriorRNNHybrid, PriorRNN
from acvae_tpu.models.vae import VAECaptionModel
from acvae_tpu.train.schedules import (exponential_decay_schedule,
                                       noam_schedule, warmup_cosine_schedule,
                                       warmup_linear_schedule)
from acvae_tpu.train.trainer import (TrainState, build_optimizer,
                                     dis_ratio_for_epoch, kl_weight_for_epoch,
                                     make_train_step, update_ss_ratio)


class TestSchedules:
    def test_exponential_matches_reference_formula(self):
        import math
        base, final, total, warm = 5e-4, 5e-7, 1000, 100
        s = exponential_decay_schedule(base, total, final, warmup_iters=warm)
        # reference closed form at iter=50 (warmup) and iter=500
        for it in (50, 500):
            warmup_coeff = it / warm if it < warm else 1.0
            ref = warmup_coeff * base * math.exp(
                ((it - warm) / total) * math.log(final / base))
            assert float(s(it - 1)) == pytest.approx(ref, rel=1e-6)

    def test_noam_peak_at_warmup(self):
        s = noam_schedule(1e-3, model_size=64, warmup_iters=100)
        lrs = [float(s(i)) for i in range(300)]
        assert np.argmax(lrs) == 99

    def test_warmup_linear_steps(self):
        s = warmup_linear_schedule(1.0, warmup_steps=5, gamma=0.1,
                                   update_epoch=10)
        assert float(s(1)) == pytest.approx(2 / 5)
        assert float(s(6)) == pytest.approx(1.0)      # before first decay
        assert float(s(16)) == pytest.approx(0.1)     # one decay step

    def test_warmup_cosine_decays(self):
        s = warmup_cosine_schedule(1.0, warmup_steps=10, t_total=100)
        assert float(s(4)) < 1.0
        assert float(s(99)) < 0.05


class TestScheduleHelpers:
    def test_ss_exponential(self):
        r = update_ss_ratio(1.0, "exponential", total_iters=100)
        assert r == pytest.approx(0.01 ** (1 / 100))

    def test_dis_ratio_ramp(self):
        assert dis_ratio_for_epoch(3, 20, freeze_epoch=5, final_ratio=0.4) == 0
        assert dis_ratio_for_epoch(20, 20, 5, 0.4) == pytest.approx(0.4)
        assert dis_ratio_for_epoch(10, 20, 5, 0.4) == pytest.approx(0.4 / 3)

    def test_kl_weight(self):
        assert kl_weight_for_epoch(1, 10, 1.0) == 0.5
        assert kl_weight_for_epoch(10, 10, 2.0) == 2.0


def _tiny_setup():
    E, V_feats = 16, 64
    feats, info, vocab = make_synthetic_clotho(num_audios=4, mel_frames=128)
    ds = CaptionDataset(caption_info=info, vocabulary=vocab, features=feats)
    model = VAECaptionModel(
        encoder=Cnn10(inputdim=V_feats, embed_size=E, channels=(4, 8, 8, E)),
        decoder=VAERNNBahdanauAttnDecoder(vocab_size=len(vocab), enc_mem_size=E,
                                          embed_size=E, hidden_size=E),
        qnet=PosteriorRNNHybrid(vocab_size=len(vocab), word_dim=E,
                                embed_size=E, hidden_size=E),
        pnet=PriorRNN(vocab_size=len(vocab), word_dim=E, audiofeats_size=E,
                      embed_size=E, hidden_size=E),
        global_constraint=True)
    loader = CaptionLoader(ds, batch_size=10, shuffle=True, seed=0,
                           buckets=(128,))
    batch = next(iter(loader))
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(batch.feats), jnp.asarray(batch.feat_lens),
        jnp.asarray(batch.caps), jnp.asarray(batch.cap_lens), train=False)
    return model, variables, loader, vocab, ds


class TestTrainStep:
    def test_loss_decreases_overfit(self):
        model, variables, loader, vocab, ds = _tiny_setup()
        tx = build_optimizer("Adam", 5e-3, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, label_smoothing=True, smoothing=0.1,
                               alpha=1.0, global_loss="MSE")
        key = jax.random.key(42)
        losses = []
        for it in range(40):
            for batch in loader:
                key, sub = jax.random.split(key)
                arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
                state, metrics = step(state, arrays, sub,
                                      1.0, 0.0, 0.5, 1.0)
                losses.append(float(metrics["ce"]))
        # cross-entropy should fall substantially when overfitting 4 clips
        assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])

    def test_decode_after_training_produces_valid_tokens(self):
        model, variables, loader, vocab, ds = _tiny_setup()
        tx = build_optimizer("Adam", 3e-3, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        step = make_train_step(model)
        key = jax.random.key(0)
        for it in range(15):
            for batch in loader:
                key, sub = jax.random.split(key)
                arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
                state, _ = step(state, arrays, sub, 1.0, 0.0, 0.5, 0.0)
        batch = next(iter(loader))
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch.feats), jnp.asarray(batch.feat_lens),
            decode_method="greedy", max_length=20,
            rngs={"sample": jax.random.key(9)})
        seqs = np.asarray(out["seqs"])
        words = vocab.decode(seqs[0])
        assert all(w != "<unk>" for w in words)


class TestReduceLROnPlateau:
    def test_scale_applied_to_updates(self):
        """lr_scale lives in the optimizer state so the host can halve the
        effective lr between jitted steps (torch ReduceLROnPlateau parity,
        pytorch_runner_vae.py:364-365)."""
        import optax

        from acvae_tpu.train.trainer import (TrainState, build_optimizer,
                                             set_lr_scale)

        tx = build_optimizer("SGD", 1.0)
        params = {"w": jnp.asarray(2.0)}
        state = TrainState.create({"params": params}, tx)
        grads = {"w": jnp.asarray(1.0)}

        @jax.jit
        def step(state):
            return state.apply_gradients(grads, state.batch_stats)

        s1 = step(state)
        assert float(s1.params["w"]) == 1.0          # full lr
        s1 = set_lr_scale(s1, 0.25)
        s2 = step(s1)
        assert float(s2.params["w"]) == 0.75          # 1.0 - 0.25·1.0

    def test_plateau_semantics(self):
        from acvae_tpu.train.trainer import (ReduceLROnPlateau, TrainState,
                                             build_optimizer)

        tx = build_optimizer("SGD", 1.0)
        state = TrainState.create({"params": {"w": jnp.asarray(0.0)}}, tx)
        pl = ReduceLROnPlateau(mode="max", factor=0.5, patience=1)
        state = pl.step(state, 1.0)     # best = 1.0
        state = pl.step(state, 0.9)     # bad 1
        assert pl.scale == 1.0
        state = pl.step(state, 0.9)     # bad 2 > patience -> scale 0.5
        assert pl.scale == 0.5
        state = pl.step(state, 2.0)     # improvement resets counter
        assert pl.scale == 0.5 and pl.best == 2.0

    def test_masked_optimizer_scale_reachable(self):
        """set_lr_scale finds the scale leaf through optax.masked."""
        from acvae_tpu.train.trainer import (TrainState, build_optimizer,
                                             set_lr_scale)

        params = {"w": jnp.asarray(2.0), "frozen": jnp.asarray(3.0)}
        tx = build_optimizer("SGD", 1.0,
                             trainable_mask={"w": True, "frozen": False})
        state = TrainState.create({"params": params}, tx)
        state = set_lr_scale(state, 0.5)
        grads = {"w": jnp.asarray(1.0), "frozen": jnp.asarray(1.0)}
        s1 = state.apply_gradients(grads, state.batch_stats)
        assert float(s1.params["w"]) == 1.5           # scaled update
        # regression: optax.masked passed raw gradients through to
        # "frozen" params (they moved by +grad); multi_transform freezes
        assert float(s1.params["frozen"]) == 3.0


def test_exponential_decay_short_run_bounded():
    """Regression: with total_iters < warmup_iters the reference formula
    explodes (lr ~1e14 → instant nan on 1-epoch runs); the shrunk-warmup
    fallback keeps the lr bounded and decaying to final_lr."""
    from acvae_tpu.train.schedules import SCHEDULES

    sch = SCHEDULES.build("ExponentialDecayScheduler", base_lr=5e-4,
                          final_lr=5e-7, warmup_iters=3000, total_iters=421)
    lrs = [float(sch(s)) for s in range(0, 421, 20)]
    assert max(lrs) < 5e-3, lrs
    assert lrs[-1] < lrs[5]
    # sane regime (warmup < total) unchanged: exact reference formula
    import math
    sch2 = SCHEDULES.build("ExponentialDecayScheduler", base_lr=5e-4,
                           final_lr=5e-7, warmup_iters=10, total_iters=1000)
    it = 501
    expect = 1.0 * 5e-4 * math.exp(((it - 10) / 1000) * math.log(5e-7 / 5e-4))
    assert abs(float(sch2(500)) - expect) / expect < 1e-5


class TestGradAccumulation:
    """accum_steps > 1 wraps the chain in optax.MultiSteps: params hold
    still for k-1 micro-batches, then one update with the MEAN gradient."""

    def test_mean_gradient_applied_every_k(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        params = {"w": jnp.zeros((3,))}
        tx = build_optimizer("SGD", 1.0, accum_steps=2)
        opt_state = tx.init(params)
        g1 = {"w": jnp.asarray([1.0, 2.0, 3.0])}
        g2 = {"w": jnp.asarray([3.0, 0.0, -1.0])}

        upd, opt_state = tx.update(g1, opt_state, params)
        p1 = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        np.testing.assert_array_equal(np.asarray(p1["w"]), 0.0)  # held

        upd, opt_state = tx.update(g2, opt_state, p1)
        p2 = jax.tree_util.tree_map(lambda p, u: p + u, p1, upd)
        np.testing.assert_allclose(  # SGD lr=1: -mean(g1, g2)
            np.asarray(p2["w"]), -np.asarray((g1["w"] + g2["w"]) / 2),
            rtol=1e-6)

    def test_composes_with_clip_and_freeze(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        params = {"enc": jnp.ones((2,)), "dec": jnp.ones((2,))}
        mask = {"enc": False, "dec": True}
        tx = build_optimizer("SGD", 1.0, max_grad_norm=1e9,
                             trainable_mask=mask, accum_steps=3)
        opt_state = tx.init(params)
        g = {"enc": jnp.full((2,), 5.0), "dec": jnp.full((2,), 2.0)}
        p = params
        for _ in range(3):
            upd, opt_state = tx.update(g, opt_state, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
        np.testing.assert_array_equal(np.asarray(p["enc"]), 1.0)  # frozen
        np.testing.assert_allclose(np.asarray(p["dec"]), 1.0 - 2.0, rtol=1e-6)


class TestKLScheduleModes:
    """kl_weight_schedule (trainer.py) — the kl_anneal config surface."""

    def test_reference_mode_matches_reference_formula(self):
        from acvae_tpu.train.trainer import kl_weight_schedule
        for e in range(1, 11):
            assert kl_weight_schedule(e, 10, 0.5) == \
                kl_weight_for_epoch(e, 10, 0.5)

    def test_linear_warmup_starts_below_reference_floor(self):
        from acvae_tpu.train.trainer import kl_weight_schedule
        w1 = kl_weight_schedule(1, 20, 0.5, mode="linear", floor=0.0)
        assert w1 == pytest.approx(0.025)
        assert kl_weight_schedule(20, 20, 0.5, mode="linear") == 0.5

    def test_cyclical_resets_each_cycle(self):
        from acvae_tpu.train.trainer import kl_weight_schedule
        # 20 epochs, 4 cycles of 5; ramp over first half of each cycle
        ws = [kl_weight_schedule(e, 20, 0.5, mode="cyclical", cycles=4,
                                 ramp=0.5, floor=0.0) for e in range(1, 21)]
        # epoch 1 starts at floor, mid-cycle reaches beta, epoch 6 resets
        assert ws[0] == 0.0
        assert ws[3] == pytest.approx(0.5)  # tau=3/5 >= ramp -> hold at beta
        assert ws[5] == pytest.approx(0.0)  # cycle 2 restart
        assert max(ws) == pytest.approx(0.5)

    def test_constant_and_unknown(self):
        from acvae_tpu.train.trainer import kl_weight_schedule
        assert kl_weight_schedule(3, 10, 0.7, mode="constant") == 0.7
        with pytest.raises(ValueError):
            kl_weight_schedule(1, 10, 0.5, mode="bogus")

    def test_parse_kl_anneal_validates_config_surface(self):
        """ADVICE r4: typo'd keys and bare scalars must fail fast, not
        silently run the default schedule."""
        from acvae_tpu.train.trainer import parse_kl_anneal
        assert parse_kl_anneal(None) == {}
        assert parse_kl_anneal({"mode": "linear", "floor": 0.1}) == \
            {"mode": "linear", "floor": 0.1}
        with pytest.raises(ValueError, match="unknown kl_anneal key"):
            parse_kl_anneal({"mode": "cyclical", "cycle": 4})
        with pytest.raises(ValueError, match="must be a mapping"):
            parse_kl_anneal("linear")


class TestFreeBitsAndDiagnostics:
    def test_diagnostics_emitted_and_finite(self):
        model, variables, loader, vocab, ds = _tiny_setup()
        tx = build_optimizer("Adam", 1e-3, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        step = make_train_step(model)
        batch = next(iter(loader))
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
        state, metrics = step(state, arrays, jax.random.key(0),
                              1.0, 0.0, 0.5, 0.0)
        for k in ("active_units", "kl_dim_max", "qp_mse"):
            v = float(metrics[k])
            assert np.isfinite(v), (k, v)
        au = float(metrics["active_units"])
        assert 0.0 <= au <= 16.0  # E=16 latent dims in _tiny_setup

    def test_free_bits_floors_the_kl_term(self):
        from acvae_tpu.ops.losses import normal_kl_per_dim
        model, variables, loader, vocab, ds = _tiny_setup()
        tx = build_optimizer("Adam", 1e-3, max_grad_norm=1.0)
        state = TrainState.create(variables, tx)
        lam = 2.0  # large floor so it certainly binds at init
        step_fb = make_train_step(model, free_bits=lam)
        batch = next(iter(loader))
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
        _, m = step_fb(state, arrays, jax.random.key(0), 1.0, 0.0, 0.5, 0.0)
        kl_fb, kl_raw = float(m["kl"]), float(m["kl_raw"])
        # floored KL >= raw KL always, and >= E*lam when the floor binds
        assert kl_fb >= kl_raw - 1e-5
        assert kl_fb >= 16 * lam - 1e-3

    def test_free_bits_matches_manual_formula(self):
        from acvae_tpu.ops.losses import normal_kl_per_dim
        rng = np.random.default_rng(0)
        q_m = jnp.asarray(rng.normal(size=(4, 7, 8)), jnp.float32)
        q_l = jnp.asarray(rng.normal(size=(4, 7, 8)) * 0.1, jnp.float32)
        p_m = jnp.zeros((4, 7, 8))
        p_l = jnp.zeros((4, 7, 8))
        mask = jnp.asarray(rng.random((4, 7)) > 0.3)
        kl_d = np.asarray(normal_kl_per_dim(q_m, q_l, p_m, p_l, mask))
        # manual: per-position per-dim KL, masked mean over (N,T), per dim
        v_q = np.exp(np.asarray(q_l))
        kl = 0.5 * (-np.asarray(q_l)) + (v_q + np.asarray(q_m) ** 2) / 2.0 - 0.5
        mf = np.asarray(mask, np.float32)[..., None]
        manual = (kl * mf).reshape(-1, 8).sum(0) / mf.sum()
        np.testing.assert_allclose(kl_d, manual, rtol=1e-5)

    def test_free_bits_rejected_for_gmm_prior(self):
        from acvae_tpu.models.latent import GMMPriorRNN
        E = 16
        feats, info, vocab = make_synthetic_clotho(num_audios=4, mel_frames=128)
        ds = CaptionDataset(caption_info=info, vocabulary=vocab, features=feats)
        model = VAECaptionModel(
            encoder=Cnn10(inputdim=64, embed_size=E, channels=(4, 8, 8, E)),
            decoder=VAERNNBahdanauAttnDecoder(vocab_size=len(vocab),
                                              enc_mem_size=E, embed_size=E,
                                              hidden_size=E),
            qnet=PosteriorRNNHybrid(vocab_size=len(vocab), word_dim=E,
                                    embed_size=E, hidden_size=E),
            pnet=GMMPriorRNN(vocab_size=len(vocab), word_dim=E,
                             audiofeats_size=E, embed_size=E, hidden_size=E,
                             gmm_kernel=2))
        loader = CaptionLoader(ds, batch_size=10, shuffle=True, seed=0,
                               buckets=(128,))
        batch = next(iter(loader))
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.asarray(batch.feats), jnp.asarray(batch.feat_lens),
            jnp.asarray(batch.caps), jnp.asarray(batch.cap_lens), train=False)
        tx = build_optimizer("Adam", 1e-3)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, free_bits=0.1)
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
        with pytest.raises(ValueError, match="free_bits requires a Normal"):
            step(state, arrays, jax.random.key(0), 1.0, 0.0, 0.5, 0.0)
