"""Recurrent primitives designed for the TPU compilation model.

The reference uses cuDNN ``nn.GRU`` / ``nn.LSTM`` with ``pack_padded_sequence``
(e.g. ``models/text_encoder.py:106-129``, ``models/decoder.py:39-44``).  On TPU
the idiomatic formulation is:

* batch the *input* projections for the whole sequence into one MXU matmul
  (``[N·T, in] @ [in, gates]``), then
* run only the recurrent ``[N, H] @ [H, gates]`` matmul inside ``lax.scan``;
* replace packed sequences with static shapes + length masks: the carry holds
  its value once ``t >= len`` so the final state equals the state at ``len-1``,
  and outputs are zeroed beyond ``len`` (mirroring ``pad_packed_sequence``'s
  zero fill, which the reference's posterior relies on —
  ``text_encoder.py:129-139``).

Gate order and math follow torch exactly (GRU: r,z,n with the reset gate
applied after the hidden matmul; LSTM: i,f,g,o), so unit tests can check
numeric parity against ``torch.nn.GRU``/``LSTM``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)
    return init


class GRUCell(nn.Module):
    """torch-compatible GRU cell: r,z,n gates, reset applied post hidden-matmul."""
    hidden_size: int
    in_dim: int

    def setup(self):
        H, scale = self.hidden_size, 1.0 / self.hidden_size ** 0.5
        self.wi = self.param("wi", _uniform_init(scale), (self.in_dim, 3 * H))
        self.bi = self.param("bi", _uniform_init(scale), (3 * H,))
        self.wh = self.param("wh", _uniform_init(scale), (H, 3 * H))
        self.bh = self.param("bh", _uniform_init(scale), (3 * H,))

    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        return self.recur(self.input_proj(x), h)

    def input_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        """Input half of the gates; call once per sequence ([.., in] -> [.., 3H])."""
        return x @ self.wi + self.bi

    def recur(self, gi: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        """One recurrent step from precomputed input gates gi: [N, 3H]."""
        return self.recur_from_gates(gi, h @ self.wh + self.bh, h)

    def recur_from_gates(self, gi: jnp.ndarray, gh: jnp.ndarray,
                         h: jnp.ndarray) -> jnp.ndarray:
        """Gate math alone — both matmul halves precomputed (the fused-step
        decode path batches them with the prior's, models/vae.py)."""
        H = self.hidden_size
        r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi[..., H:2 * H] + gh[..., H:2 * H])
        n = jnp.tanh(gi[..., 2 * H:] + r * gh[..., 2 * H:])
        return (1.0 - z) * n + z * h


class LSTMCell(nn.Module):
    """torch-compatible LSTM cell (i,f,g,o gate order)."""
    hidden_size: int
    in_dim: int

    def setup(self):
        H, scale = self.hidden_size, 1.0 / self.hidden_size ** 0.5
        self.wi = self.param("wi", _uniform_init(scale), (self.in_dim, 4 * H))
        self.bi = self.param("bi", _uniform_init(scale), (4 * H,))
        self.wh = self.param("wh", _uniform_init(scale), (H, 4 * H))
        self.bh = self.param("bh", _uniform_init(scale), (4 * H,))

    def __call__(self, x: jnp.ndarray,
                 state: Tuple[jnp.ndarray, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.recur(self.input_proj(x), state)

    def input_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        return x @ self.wi + self.bi

    def recur(self, gi: jnp.ndarray,
              state: Tuple[jnp.ndarray, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h, _ = state
        return self.recur_from_gates(gi, h @ self.wh + self.bh, state)

    def recur_from_gates(self, gi: jnp.ndarray, gh: jnp.ndarray,
                         state: Tuple[jnp.ndarray, jnp.ndarray]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Gate math alone — both matmul halves precomputed (fused-step)."""
        h, c = state
        H = self.hidden_size
        g = gi + gh
        i = jax.nn.sigmoid(g[..., :H])
        f = jax.nn.sigmoid(g[..., H:2 * H])
        gg = jnp.tanh(g[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(g[..., 3 * H:])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new


def _scan_gru(cell: GRUCell, gi_seq: jnp.ndarray, h0: jnp.ndarray,
              lens: Optional[jnp.ndarray], reverse: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan a GRU over precomputed input gates gi_seq: [N, T, 3H].

    Returns (outputs [N, T, H] zeroed beyond len, final state [N, H]).
    """
    N, T, _ = gi_seq.shape
    steps = jnp.arange(T)
    if reverse:
        steps = steps[::-1]

    def body(h, t):
        h_new = cell.recur(gi_seq[:, t], h)
        if lens is not None:
            valid = (t < lens)[:, None]
            h_new = jnp.where(valid, h_new, h)
            out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        else:
            out = h_new
        return h_new, out

    h_final, outs = jax.lax.scan(body, h0, steps)
    outs = jnp.moveaxis(outs, 0, 1)  # [N, T, H] in scan order
    if reverse:
        outs = outs[:, ::-1]
    return outs, h_final


class GRU(nn.Module):
    """Full-sequence (optionally bidirectional) GRU with length masking.

    Single layer — the reference never uses num_layers > 1 in a live config
    (posterior/prior defaults num_layers=1, text_encoder.py:101,224).
    """
    hidden_size: int
    in_dim: int
    bidirectional: bool = False

    def setup(self):
        self.fwd = GRUCell(self.hidden_size, self.in_dim, name="fwd")
        if self.bidirectional:
            self.bwd = GRUCell(self.hidden_size, self.in_dim, name="bwd")

    def __call__(self, x: jnp.ndarray, lens: Optional[jnp.ndarray] = None,
                 h0: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [N, T, in] -> (outputs [N, T, H*dirs], h_n [dirs, N, H])."""
        N = x.shape[0]
        if h0 is None:
            h0 = jnp.zeros((N, self.hidden_size), x.dtype)
        out_f, h_f = _scan_gru(self.fwd, self.fwd.input_proj(x), h0, lens, reverse=False)
        if not self.bidirectional:
            return out_f, h_f[None]
        out_b, h_b = _scan_gru(self.bwd, self.bwd.input_proj(x), h0, lens, reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1), jnp.stack([h_f, h_b])
