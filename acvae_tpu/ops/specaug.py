"""On-device batched SpecAugment.

The reference runs SpecAugment per-sample in NumPy inside CPU DataLoader
workers on *unpadded* [T, F] samples (``datasets/augment.py``; SURVEY §2.6).
Here every transform is a batched jnp op that fuses into the surrounding
jitted train step — so each op takes the per-sample valid length ``lens``
and reproduces the reference's unpadded semantics on the padded buffer:

* :func:`freq_mask` / :func:`time_mask` — augment.py:29-66.  Reference
  quirks preserved: the drawn width ``f`` only bounds the mask (the actual
  masked span is ``[f0, randrange(f0, f0+f))``); a drawn width of 0 returns
  immediately, skipping that mask AND all remaining masks of the call
  (augment.py:39,59); the mean fill is recomputed from the *current*
  (partially masked) values at every mask application (``cloned.mean()``
  at assignment time) over the sample's valid frames only.
* :func:`spec_augment` — the p-gated combinator (augment.py:69-82); the gate
  is per *sample* here (the reference gates per worker call, which is
  per-sample too).
* :func:`random_crop` — augment.py:93-101.  Samples keep their full length
  when shorter than ``size`` or when the p-coin loses (the reference
  returns the sample untouched); only winners are cropped to a random
  ``size``-frame window.  The padded buffer keeps its static time size.
* :func:`time_roll` / :func:`gaussian_noise` — augment.py:85-111, rolling /
  normalizing over the valid frames rather than the padded buffer.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _span_mask(length: int, start: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """[N] starts/ends -> [N, length] bool mask of [start, end)."""
    idx = jnp.arange(length)[None, :]
    return (idx >= start[:, None]) & (idx < end[:, None])


def _rand_span(key, max_extent: int, axis_size: jnp.ndarray, n: int):
    """Reference extent sampling (augment.py:34-41): f ~ U[0, F),
    f0 ~ U[0, size - f), end ~ U[f0, f0 + f).  Returns (f0, end, f)."""
    k1, k2, k3 = jax.random.split(key, 3)
    f = jax.random.randint(k1, (n,), 0, max_extent)
    f0 = jax.random.randint(k2, (n,), 0, jnp.maximum(axis_size - f, 1))
    u = jax.random.uniform(k3, (n,))
    end = f0 + (u * jnp.maximum(f, 1)).astype(jnp.int32)
    return f0, end, f


def _valid_mean(spec: jnp.ndarray, lens: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-sample mean over the valid [0, len) frames ([N, 1, 1]) — the
    reference's ``cloned.mean()`` is over the unpadded sample."""
    if lens is None:
        return jnp.mean(spec, axis=(1, 2), keepdims=True)
    N, Tmax, Fbins = spec.shape
    valid = (jnp.arange(Tmax)[None, :] < lens[:, None])[:, :, None]
    total = jnp.sum(jnp.where(valid, spec, 0.0), axis=(1, 2), keepdims=True)
    count = (lens * Fbins).reshape(N, 1, 1).astype(spec.dtype)
    return total / jnp.maximum(count, 1.0)


def freq_mask(spec: jnp.ndarray, key: jax.Array, F: int = 30,
              num_masks: int = 1, replace_with_zero: bool = False,
              lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """spec: [N, T, Fbins]; ``lens`` scopes the mean fill to valid frames."""
    N, T, Fbins = spec.shape
    dead = jnp.zeros((N,), bool)
    for i in range(num_masks):
        key, sub = jax.random.split(key)
        f0, end, f = _rand_span(sub, F, jnp.full((N,), Fbins), N)
        # width 0 => reference returns before applying (augment.py:39)
        dead = dead | (f == 0)
        fill = 0.0 if replace_with_zero else _valid_mean(spec, lens)
        mask = _span_mask(Fbins, f0, end)[:, None, :] & ~dead[:, None, None]
        spec = jnp.where(mask, fill, spec)
    return spec


def time_mask(spec: jnp.ndarray, key: jax.Array, T: int = 40,
              num_masks: int = 1, replace_with_zero: bool = False,
              lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """spec: [N, Tmax, F]; masks within each sample's valid length when
    `lens` given (the reference works on unpadded samples)."""
    N, Tmax, Fbins = spec.shape
    size = lens if lens is not None else jnp.full((N,), Tmax)
    dead = jnp.zeros((N,), bool)
    for i in range(num_masks):
        key, sub = jax.random.split(key)
        t0, end, t = _rand_span(sub, T, size, N)
        dead = dead | (t == 0)
        fill = 0.0 if replace_with_zero else _valid_mean(spec, lens)
        mask = _span_mask(Tmax, t0, end)[:, :, None] & ~dead[:, None, None]
        spec = jnp.where(mask, fill, spec)
    return spec


def spec_augment(spec: jnp.ndarray, key: jax.Array,
                 lens: Optional[jnp.ndarray] = None,
                 timemask: bool = True, num_timemask: int = 2,
                 freqmask: bool = True, num_freqmask: int = 2,
                 timewarp: bool = False,
                 F: int = 15, W: int = 40, T: int = 30,
                 p: float = 0.2) -> jnp.ndarray:
    """p-gated per-sample SpecAugment (augment.py:69-82)."""
    k_gate, k_t, k_f, k_w = jax.random.split(key, 4)
    gate = jax.random.uniform(k_gate, (spec.shape[0],)) < p
    out = spec
    if timemask and num_timemask > 0:
        out = time_mask(out, k_t, T=T, num_masks=num_timemask, lens=lens)
    if freqmask and num_freqmask > 0:
        out = freq_mask(out, k_f, F=F, num_masks=num_freqmask, lens=lens)
    if timewarp:
        from acvae_tpu.ops.warp import time_warp
        out = time_warp(out, k_w, W_param=W, lens=lens)
    return jnp.where(gate[:, None, None], out, spec)


def random_crop(spec: jnp.ndarray, lens: jnp.ndarray, key: jax.Array,
                size: int = 1000, p: float = 0.2):
    """Per-sample random window of `size` frames (augment.py:93-101).

    Returns (spec [N, Tmax, F], new_lens).  Matching the reference, a sample
    is cropped ONLY when it is longer than ``size`` AND wins the p-coin;
    otherwise it is returned untouched at its full length (the reference's
    early return).  Cropped samples have their window moved to the front,
    new length ``size``, and zeros beyond it (the padding invariant).
    """
    N, Tmax, F = spec.shape
    k_gate, k_start = jax.random.split(key)
    gate = (jax.random.uniform(k_gate, (N,)) <= p) & (lens > size)
    hi = jnp.maximum(lens - size, 1)
    start = (jax.random.uniform(k_start, (N,)) * hi).astype(jnp.int32)
    start = jnp.where(gate, start, 0)

    def shift_one(x, s):
        # roll the window to the front; cheaper than a dynamic_slice when
        # Tmax is static (the tail is re-zeroed below)
        return jnp.roll(x, -s, axis=0)

    shifted = jax.vmap(shift_one)(spec, start)
    new_lens = jnp.where(gate, size, lens)
    t_idx = jnp.arange(Tmax)[None, :, None]
    valid = t_idx < new_lens[:, None, None]
    out = jnp.where(gate[:, None, None], jnp.where(valid, shifted, 0.0), spec)
    return out, new_lens


def time_roll(x: jnp.ndarray, key: jax.Array, mean: float = 0.0,
              std: float = 10.0,
              lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-sample circular shift along time (augment.py:103-111), within the
    valid [0, len) frames when ``lens`` is given — the reference rolls the
    unpadded sample, so padding must not wrap into the signal."""
    N, T = x.shape[0], x.shape[1]
    shift = (jax.random.normal(key, (N,)) * std + mean).astype(jnp.int32)
    size = lens if lens is not None else jnp.full((N,), T)
    t = jnp.arange(T)[None, :]
    idx = (t - shift[:, None]) % jnp.maximum(size[:, None], 1)
    idx = jnp.where(t < size[:, None], idx, t)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)),
                               axis=1)


def build_augment(augment_list, crop_size: int = 1000, crop_p: float = 0.2,
                  roll_std: float = 10.0, **spec_kwargs):
    """Config strings → one fused on-device augmentation fn
    (``parse_augments``, utils/train_util.py:92-114): "timemask" /
    "freqmask" / "timewarp" enable the corresponding SpecAugment parts;
    "randomcrop" and "timeroll" are applied first like the reference's
    transform list.

    Returns fn(feats [N,T,F], lens [N], key) -> (feats, lens), jit-safe.
    """
    timemask = "timemask" in augment_list
    freqmask = "freqmask" in augment_list
    timewarp = "timewarp" in augment_list
    use_crop = "randomcrop" in augment_list
    use_roll = "timeroll" in augment_list

    def fn(feats, lens, key):
        k_crop, k_roll, k_spec = jax.random.split(key, 3)
        if use_crop:
            feats, lens = random_crop(feats, lens, k_crop, size=crop_size,
                                      p=crop_p)
        if use_roll:
            feats = time_roll(feats, k_roll, std=roll_std, lens=lens)
        feats = spec_augment(feats, k_spec, lens=lens, timemask=timemask,
                             freqmask=freqmask, timewarp=timewarp,
                             **spec_kwargs)
        return feats, lens

    return fn


def gaussian_noise(x: jnp.ndarray, key: jax.Array, snr: float = 30.0,
                   mean: float = 0.0,
                   lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Additive noise at the given SNR (augment.py:85-91).  Signal/noise
    energies are normalized by the sample's true length (reference divides
    by ``x.shape[0]`` of the unpadded sample) and noise is confined to the
    valid frames so padding stays zero."""
    T = x.shape[1]
    if lens is None:
        valid = jnp.ones(x.shape, bool)
        denom = jnp.full((x.shape[0],), T, x.dtype)
    else:
        valid = jnp.arange(T)[None, :] < lens[:, None]
        valid = valid.reshape(valid.shape + (1,) * (x.ndim - 2))
        denom = lens.astype(x.dtype)
    denom = denom.reshape((-1,) + (1,) * (x.ndim - 1))
    reduce_axes = tuple(range(1, x.ndim))
    e_x = jnp.sum(jnp.where(valid, x, 0.0) ** 2, axis=reduce_axes,
                  keepdims=True) / denom
    noise = jnp.where(valid, jax.random.normal(key, x.shape) + mean, 0.0)
    e_n = jnp.sum(noise ** 2, axis=reduce_axes, keepdims=True) / denom
    alpha = jnp.sqrt(e_x / jnp.maximum(e_n * 10.0 ** (snr / 10.0), 1e-12))
    return x + alpha * noise
