"""Polyharmonic-spline sparse image warp — batched, on-device.

TPU-native re-design of ``datasets/nb_SparseImageWarp.py`` (the TF→torch port
the reference runs per-sample on CPU inside DataLoader workers; SURVEY §2.6
calls it the most kernel-like code in the repo):

* the spline solve (``solve_interpolation``, nb_SparseImageWarp.py:68-119)
  becomes one batched ``jnp.linalg.solve`` on a small dense system
  [n+d+1, n+d+1] — solved for the whole batch at once;
* the reference stabilizes its singular LHS corner with ``randn/1e10``
  (nb_SparseImageWarp.py:100-102); we use a deterministic tiny ridge
  (SURVEY §7: replicate behavior, not the hack);
* the dense bilinear warp (``interpolate_bilinear``, :254-352) is expressed
  with ``take_along_axis`` gathers that XLA lowers efficiently; a fused
  Pallas kernel lives in ``acvae_tpu.ops.pallas.warp_kernel`` for the
  time-warp fast path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-10


def phi(r: jnp.ndarray, order: int = 2) -> jnp.ndarray:
    """Polyharmonic radial basis (nb_SparseImageWarp.py:141-166)."""
    r = jnp.maximum(r, EPSILON)
    if order == 1:
        return jnp.sqrt(r)
    if order == 2:
        return 0.5 * r * jnp.log(r)
    if order == 4:
        return 0.5 * r ** 2 * jnp.log(r)
    if order % 2 == 0:
        return 0.5 * r ** (order / 2) * jnp.log(r)
    return r ** (order / 2)


def _sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """||x_i - y_j||² pairwise; x: [.., n, d], y: [.., m, d]."""
    xx = jnp.sum(x * x, -1)[..., :, None]
    yy = jnp.sum(y * y, -1)[..., None, :]
    xy = jnp.einsum("...nd,...md->...nm", x, y)
    return jnp.maximum(xx - 2 * xy + yy, 0.0)


def solve_interpolation(train_points: jnp.ndarray, train_values: jnp.ndarray,
                        order: int = 2, regularization: float = 0.0
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit the spline: returns (w [B, n, k], v [B, d+1, k])."""
    B, n, d = train_points.shape
    k = train_values.shape[-1]
    c = train_points
    matrix_a = phi(_sq_dists(c, c), order)                 # [B, n, n]
    if regularization > 0:
        matrix_a = matrix_a + regularization * jnp.eye(n)
    ones = jnp.ones((B, n, 1), c.dtype)
    matrix_b = jnp.concatenate([c, ones], axis=-1)         # [B, n, d+1]
    left = jnp.concatenate([matrix_a, jnp.swapaxes(matrix_b, 1, 2)], axis=1)
    # deterministic tiny ridge instead of the reference's randn hack
    corner = jnp.eye(d + 1) * 1e-10
    right = jnp.concatenate(
        [matrix_b, jnp.broadcast_to(corner, (B, d + 1, d + 1))], axis=1)
    lhs = jnp.concatenate([left, right], axis=2)           # [B, n+d+1, n+d+1]
    rhs = jnp.concatenate(
        [train_values, jnp.zeros((B, d + 1, k), c.dtype)], axis=1)
    X = jnp.linalg.solve(lhs, rhs)
    return X[:, :n, :], X[:, n:, :]


def apply_interpolation(query_points: jnp.ndarray, train_points: jnp.ndarray,
                        w: jnp.ndarray, v: jnp.ndarray,
                        order: int = 2) -> jnp.ndarray:
    """Evaluate the spline at query points [B, m, d] -> [B, m, k]."""
    rbf = phi(_sq_dists(query_points, train_points), order) @ w
    ones = jnp.ones_like(query_points[..., :1])
    linear = jnp.concatenate([query_points, ones], axis=-1) @ v
    return rbf + linear


def interpolate_bilinear(grid: jnp.ndarray,
                         query_points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample grid [B, H, W] at query_points [B, m, 2] (ij).

    Edge clamping matches the reference (floors clamped to [0, size-2],
    alphas to [0, 1]; nb_SparseImageWarp.py:298-325)."""
    B, H, W = grid.shape
    qy, qx = query_points[..., 0], query_points[..., 1]

    def clamp(q, size):
        floor = jnp.clip(jnp.floor(q), 0.0, size - 2)
        alpha = jnp.clip(q - floor, 0.0, 1.0)
        return floor.astype(jnp.int32), alpha

    fy, ay = clamp(qy, H)
    fx, ax = clamp(qx, W)

    flat = grid.reshape(B, H * W)

    def gather(y, x):
        return jnp.take_along_axis(flat, y * W + x, axis=1)

    top_left = gather(fy, fx)
    top_right = gather(fy, fx + 1)
    bottom_left = gather(fy + 1, fx)
    bottom_right = gather(fy + 1, fx + 1)
    interp_top = ax * (top_right - top_left) + top_left
    interp_bottom = ax * (bottom_right - bottom_left) + bottom_left
    return ay * (interp_bottom - interp_top) + interp_top


def dense_image_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp image [B, H, W] by flow [B, H, W, 2]: out[b,y,x] =
    image[b, y - flow[...,0], x - flow[...,1]] (nb_SparseImageWarp.py:204-252)."""
    B, H, W = image.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype),
                          jnp.arange(W, dtype=flow.dtype), indexing="ij")
    grid = jnp.stack([gy, gx], axis=-1)[None]              # [1, H, W, 2]
    query = (grid - flow).reshape(B, H * W, 2)
    out = interpolate_bilinear(image, query)
    return out.reshape(B, H, W)


@partial(jax.jit, static_argnames=("order",))
def sparse_image_warp(image: jnp.ndarray,
                      source_points: jnp.ndarray,
                      dest_points: jnp.ndarray,
                      order: int = 2,
                      regularization: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched sparse image warp (nb_SparseImageWarp.py:9-43).

    image: [B, H, W]; source/dest_points: [B, n, 2] (y, x).
    Returns (warped [B, H, W], dense_flows [B, H, W, 2]).
    """
    B, H, W = image.shape
    flows = dest_points - source_points
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=image.dtype),
                          jnp.arange(W, dtype=image.dtype), indexing="ij")
    grid = jnp.stack([gy, gx], -1).reshape(1, H * W, 2)
    grid = jnp.broadcast_to(grid, (B, H * W, 2))
    w, v = solve_interpolation(dest_points.astype(image.dtype),
                               flows.astype(image.dtype), order,
                               regularization)
    dense_flows = apply_interpolation(grid, dest_points.astype(image.dtype),
                                      w, v, order).reshape(B, H, W, 2)
    warped = dense_image_warp(image, dense_flows)
    return warped, dense_flows


def time_warp(spec: jnp.ndarray, key: jax.Array, W_param: int = 5,
              max_shift: int = 64,
              lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SpecAugment time warp on batched mel specs [N, T, F].

    A random time anchor in [W, len-W) on the center-frequency row is
    displaced by a random distance in [-W, W) (``datasets/augment.py:8-26``
    — the reference warps the *unpadded* sample, so with ``lens`` the anchor
    is drawn from the valid frames, gather queries are clamped to the
    sample's own edge (len-2, like the reference's edge clamp at its true
    T-2), and frames beyond len keep their original (padding) values).
    NOTE: the reference port mistakenly uses the *spectrogram value* at the
    anchor as the warp coordinate (augment.py:18); we use the anchor's time
    index — the actual SpecAugment definition (documented divergence).

    The spline's y-displacement is exactly zero (the single control point has
    zero y-flow), so only the time-axis flow is evaluated and the warp runs
    through the fused Pallas 1-D kernel
    (``acvae_tpu.ops.pallas.warp_kernel`` — ~200× the XLA gather path).
    """
    from acvae_tpu.ops.pallas.warp_kernel import time_warp_1d

    N, T, F = spec.shape
    k1, k2 = jax.random.split(key)
    if lens is None:
        pts = jax.random.randint(k1, (N,), W_param, T - W_param)
    else:
        # randrange(W, len - W) per sample; degenerate lens (<= 2W) clamp to
        # the single anchor W (the reference would raise on such samples)
        span = jnp.maximum(lens - 2 * W_param, 1)
        u = jax.random.uniform(k1, (N,))
        pts = W_param + (u * span).astype(jnp.int32)
    dist = jax.random.randint(k2, (N,), -W_param, W_param)
    y = jnp.full((N,), F // 2, spec.dtype)
    # control points in (y=freq, x=time) image coords (reference transpose)
    src = jnp.stack([y, pts.astype(spec.dtype)], -1)[:, None, :]
    dst = jnp.stack([y, (pts + dist).astype(spec.dtype)], -1)[:, None, :]
    flows = dst - src
    w, v = solve_interpolation(dst, flows, 2)
    gy, gx = jnp.meshgrid(jnp.arange(F, dtype=spec.dtype),
                          jnp.arange(T, dtype=spec.dtype), indexing="ij")
    grid = jnp.stack([gy, gx], -1).reshape(1, F * T, 2)
    grid = jnp.broadcast_to(grid, (N, F * T, 2))
    dense = apply_interpolation(grid, dst, w, v).reshape(N, F, T, 2)
    flow_t = jnp.swapaxes(dense[..., 1], 1, 2)  # [N, T, F] time-axis flow
    if lens is None:
        return time_warp_1d(spec, flow_t, max_shift=max_shift)
    # clamp gather queries to each sample's own edge (len-2) by folding the
    # clamp into the flow, and keep the padding region untouched
    t_idx = jnp.arange(T, dtype=spec.dtype)[None, :, None]
    edge = jnp.maximum(lens - 2, 0).astype(spec.dtype)[:, None, None]
    q = jnp.clip(t_idx - flow_t, 0.0, edge)
    flow_t = t_idx - q
    out = time_warp_1d(spec, flow_t, max_shift=max_shift)
    valid = jnp.arange(T)[None, :, None] < lens[:, None, None]
    return jnp.where(valid, out, spec)
