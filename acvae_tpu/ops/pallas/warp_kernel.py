"""Pallas TPU kernel for the SpecAugment time warp.

Why a kernel: the generic XLA gather behind ``interpolate_bilinear``
(``acvae_tpu.ops.warp``) costs ~800 ms for a [256, 1024, 64] batch on a v5e —
200× the rest of SpecAugment.  Mosaic has no dynamic gather either, but the
time warp has structure the kernel exploits:

* the warp displaces **time only** (the spline's y-targets are zero, so the
  solved flow's y-component is exactly 0 — verified in tests), making the
  2-D bilinear warp a per-row 1-D interpolation;
* the gather decomposes into shift-enumerated selects,
  ``out[t] = Σ_d 1[fx(t) - t == d] · w(t) · img[t + d]``, and because spline
  flows are smooth, each 128-frame output chunk only uses a handful of
  distinct shifts — per-(image, chunk) shift bounds are computed outside the
  kernel and drive a dynamic ``fori_loop`` over sublane-aligned 8-row
  windows, so the work scales with the *actual* local flow range rather
  than the ±max_shift worst case.

Each batch image is staged once into a zero-padded VMEM buffer (one HBM read
and one write per image).  Measured on a v5e at [256, 1024, 64]: **7.9 ms vs
785.7 ms** for the XLA gather path (~99×) with bit-exact outputs.

Falls back to the jnp gather path off-TPU (CPU tests, interpret mode).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(bounds_ref, flow_ref, img_ref, out_ref, pad_ref,
                 *, max_shift: int, T: int, chunk: int):
    """Chunked 1-D warp.

    Grid is (B, T/chunk).  The image is staged once per batch row into a
    zero-padded VMEM buffer; for each output chunk a ``fori_loop`` runs over
    that chunk's *local* shift range (bounds_ref, scalar-prefetched) — for
    smooth spline flows that's a handful of iterations instead of the
    2·max_shift static worst case.  Each iteration reads ``pad[t0 + d + P]``
    via a dynamic slice (a traced shift needs no static roll) and
    accumulates the bilinear-weighted contribution."""
    # rounded UP to a multiple of 8: `start` below is promised 8-aligned to
    # Mosaic (pl.multiple_of), and t0/d_base are multiples of 8 — P must be
    # too, or the promise is false and the window reads shifted rows
    P = -(-max(max_shift + 1, chunk) // 8) * 8
    b = pl.program_id(0)
    c = pl.program_id(1)
    flow = flow_ref[0]   # [chunk, F]
    F = flow.shape[1]

    @pl.when(c == 0)
    def _stage():
        pad_ref[pl.ds(0, P), :] = jnp.zeros((P, F), pad_ref.dtype)
        pad_ref[pl.ds(P, T), :] = img_ref[0]
        pad_ref[pl.ds(P + T, P), :] = jnp.zeros((P, F), pad_ref.dtype)

    smin = bounds_ref[0, c, 0]
    smax = bounds_ref[0, c, 1]
    t0 = c * chunk
    t_int = t0 + jax.lax.broadcasted_iota(jnp.int32, flow.shape, 0)
    t_idx = t_int.astype(flow.dtype)
    q = t_idx - flow
    floor = jnp.clip(jnp.floor(q), 0.0, T - 2)
    alpha = jnp.clip(q - floor, 0.0, 1.0)
    d_low = floor.astype(jnp.int32) - t_int   # chunk-local corner shifts

    # iterate sublane-ALIGNED 8-row windows (unaligned dynamic slices lower
    # to slow shuffles); each window covers 8 consecutive shifts via static
    # value slices
    k_lo = jnp.floor_divide(smin, 8)
    k_hi = jnp.floor_divide(smax, 8)

    def body(k, acc):
        d_base = k * 8
        start = pl.multiple_of(t0 + d_base + P, 8)
        window = pad_ref[pl.ds(start, chunk + 8), :]
        for r in range(8):
            d = d_base + r
            w = jnp.where(d_low == d, 1.0 - alpha, 0.0) \
                + jnp.where(d_low + 1 == d, alpha, 0.0)
            acc = acc + w * jax.lax.slice_in_dim(window, r, r + chunk, axis=0)
        return acc

    acc = jax.lax.fori_loop(k_lo, k_hi + 1, body, jnp.zeros_like(flow))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def time_warp_1d(image: jnp.ndarray, flow_t: jnp.ndarray,
                 max_shift: int = 64,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """1-D (time-axis) bilinear warp: out[b,t,f] = image[b, t - flow, f].

    image, flow_t: [B, T, F].  Displacements are clamped to ±max_shift
    (documented divergence: the reference's unregularized single-point spline
    can ramp linearly toward the clip edges; clamping bounds that artifact).

    interpret=True forces the Pallas kernel through interpret mode off-TPU
    so CPU tests can pin kernel-vs-fallback parity (default: env
    ``ACVAE_WARP_INTERPRET=1``).
    """
    B, T, F = image.shape
    flow_t = jnp.clip(flow_t, -max_shift, max_shift)
    # the kernel needs an 8-aligned chunk that divides T exactly (the grid
    # covers T/chunk blocks and the staged window slices are 8-row aligned);
    # largest such chunk <= 128, else the jnp gather path.
    if interpret is None:
        import os
        interpret = os.environ.get("ACVAE_WARP_INTERPRET") == "1"
    chunk_cands = [c for c in range(8, min(128, T) + 1, 8) if T % c == 0]
    if (not chunk_cands
            or (not interpret
                and jax.devices()[0].platform not in ("tpu", "axon"))):
        # jnp fallback: per-row 1-D gather
        t_idx = jnp.arange(T, dtype=image.dtype)[None, :, None]
        q = t_idx - flow_t
        floor = jnp.clip(jnp.floor(q), 0, T - 2)
        alpha = jnp.clip(q - floor, 0.0, 1.0)
        fi = floor.astype(jnp.int32)
        low = jnp.take_along_axis(image, fi, axis=1)
        high = jnp.take_along_axis(image, fi + 1, axis=1)
        return (1.0 - alpha) * low + alpha * high

    # per-(image, chunk) shift bounds from the *clipped* corner indices —
    # edge clipping (floor→[0, T-2]) can push shifts outside the raw flow
    # range, so bounds must come from d_low itself
    chunk = max(chunk_cands)
    C = T // chunk
    t_idx = jnp.arange(T, dtype=flow_t.dtype)[None, :, None]
    d_low_all = (jnp.clip(jnp.floor(t_idx - flow_t), 0, T - 2)
                 - t_idx).astype(jnp.int32)
    dc = d_low_all.reshape(B, C, chunk, F)
    smin = jnp.min(dc, axis=(2, 3))
    smax = jnp.max(dc, axis=(2, 3)) + 1   # +1 covers the upper corner
    bounds = jnp.stack([smin, smax], axis=-1)  # [B, C, 2]

    kernel = functools.partial(_warp_kernel, max_shift=max_shift, T=T,
                               chunk=chunk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, F), image.dtype),
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, C, 2), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, F), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, F), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, F), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        # pad must cover edge-clipped shifts (±chunk) + the 8-row window
        # tail; P here must match the kernel's 8-rounded P exactly
        scratch_shapes=[pltpu.VMEM(
            (T + 2 * (-(-max(max_shift + 1, chunk) // 8) * 8) + 16, F),
            image.dtype)],
        interpret=interpret,
    )(bounds, flow_t.astype(image.dtype), image)
