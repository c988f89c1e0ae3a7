"""Numeric parity of scan-based GRU/LSTM against torch (packed-sequence semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from acvae_tpu.models.rnn import GRU, GRUCell, LSTMCell


def _copy_gru_weights(params, tgru, direction="fwd", suffix=""):
    """Load torch GRU weights into our param tree."""
    p = dict(params)
    p[direction] = {
        "wi": jnp.asarray(getattr(tgru, f"weight_ih_l0{suffix}").detach().numpy().T),
        "wh": jnp.asarray(getattr(tgru, f"weight_hh_l0{suffix}").detach().numpy().T),
        "bi": jnp.asarray(getattr(tgru, f"bias_ih_l0{suffix}").detach().numpy()),
        "bh": jnp.asarray(getattr(tgru, f"bias_hh_l0{suffix}").detach().numpy()),
    }
    return p


class TestGRUCell:
    def test_step_matches_torch(self, rng):
        N, D, H = 3, 6, 5
        x = rng.normal(size=(N, D)).astype(np.float32)
        h = rng.normal(size=(N, H)).astype(np.float32)
        cell = GRUCell(H, D)
        params = cell.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(h))["params"]

        tcell = torch.nn.GRUCell(D, H)
        params = {
            "wi": jnp.asarray(tcell.weight_ih.detach().numpy().T),
            "wh": jnp.asarray(tcell.weight_hh.detach().numpy().T),
            "bi": jnp.asarray(tcell.bias_ih.detach().numpy()),
            "bh": jnp.asarray(tcell.bias_hh.detach().numpy()),
        }
        ours = cell.apply({"params": params}, jnp.asarray(x), jnp.asarray(h))
        ref = tcell(torch.tensor(x), torch.tensor(h)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


class TestLSTMCell:
    def test_step_matches_torch(self, rng):
        N, D, H = 3, 6, 5
        x = rng.normal(size=(N, D)).astype(np.float32)
        h = rng.normal(size=(N, H)).astype(np.float32)
        c = rng.normal(size=(N, H)).astype(np.float32)
        cell = LSTMCell(H, D)
        tcell = torch.nn.LSTMCell(D, H)
        params = {
            "wi": jnp.asarray(tcell.weight_ih.detach().numpy().T),
            "wh": jnp.asarray(tcell.weight_hh.detach().numpy().T),
            "bi": jnp.asarray(tcell.bias_ih.detach().numpy()),
            "bh": jnp.asarray(tcell.bias_hh.detach().numpy()),
        }
        h_ours, c_ours = cell.apply({"params": params}, jnp.asarray(x),
                                    (jnp.asarray(h), jnp.asarray(c)))
        h_ref, c_ref = tcell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
        np.testing.assert_allclose(np.asarray(h_ours), h_ref.detach().numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_ours), c_ref.detach().numpy(), rtol=1e-5, atol=1e-5)


class TestGRUSequence:
    def test_unidirectional_matches_torch_packed(self, rng):
        N, T, D, H = 4, 7, 6, 5
        x = rng.normal(size=(N, T, D)).astype(np.float32)
        lens = np.array([7, 3, 5, 1])

        gru = GRU(H, D)
        params = gru.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lens))["params"]
        tgru = torch.nn.GRU(D, H, batch_first=True)
        params = _copy_gru_weights(params, tgru)
        outs, h_n = gru.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))

        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.tensor(x), torch.tensor(lens), batch_first=True, enforce_sorted=False)
        tout, th_n = tgru(packed)
        tout, _ = torch.nn.utils.rnn.pad_packed_sequence(tout, batch_first=True, total_length=T)
        np.testing.assert_allclose(np.asarray(outs), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_n), th_n.detach().numpy(), rtol=1e-4, atol=1e-5)

    def test_bidirectional_matches_torch_packed(self, rng):
        N, T, D, H = 4, 7, 6, 5
        x = rng.normal(size=(N, T, D)).astype(np.float32)
        lens = np.array([7, 3, 5, 2])

        gru = GRU(H, D, bidirectional=True)
        params = gru.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lens))["params"]
        tgru = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
        params = _copy_gru_weights(params, tgru, "fwd")
        params = _copy_gru_weights(params, tgru, "bwd", suffix="_reverse")
        outs, h_n = gru.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))

        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.tensor(x), torch.tensor(lens), batch_first=True, enforce_sorted=False)
        tout, th_n = tgru(packed)
        tout, _ = torch.nn.utils.rnn.pad_packed_sequence(tout, batch_first=True, total_length=T)
        np.testing.assert_allclose(np.asarray(outs), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_n), th_n.detach().numpy(), rtol=1e-4, atol=1e-5)

    def test_jit_and_grad(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
        lens = jnp.array([5, 3])
        gru = GRU(8, 4, bidirectional=True)
        params = gru.init(jax.random.key(0), x, lens)["params"]

        @jax.jit
        def loss_fn(p):
            outs, _ = gru.apply({"params": p}, x, lens)
            return jnp.sum(outs ** 2)

        g = jax.grad(loss_fn)(params)
        assert jnp.isfinite(loss_fn(params))
        flat = jax.tree_util.tree_leaves(g)
        assert all(jnp.all(jnp.isfinite(leaf)) for leaf in flat)
