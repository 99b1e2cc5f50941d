"""Pairwise distance / inner-product ops — the O(N^2 D) half of the GP hot path.

TPU-first design notes:

- All pairwise computations are expressed through ONE batched matmul
  (`x @ y.T`) plus rank-1 row/col norm corrections, so the FLOPs land on the
  MXU and XLA fuses the elementwise epilogue (exp / polynomial) into the
  matmul consumer.  This replaces the reference's per-element Julia
  broadcasting over `ColVecs` (KernelFunctions.jl `pairwise` path).
- Shapes are kept static; inputs are canonicalised to (N, D) once at the edge.
- A Pallas fused kernel for `exp(-0.5 * sqdist)`-style matrices lives in
  `stheno_tpu.experimental.pallas.kernelmatrix`; this module is the XLA fallback and
  the reference implementation for its tests.

Reference behavior being replicated: KernelFunctions.jl `kernelmatrix` /
`kernelmatrix_diag` (reexported by Stheno at src/Stheno.jl:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ensure_2d(x) -> jnp.ndarray:
    """Canonicalise inputs to (N, D).  Scalars-per-point arrive as (N,)."""
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x.reshape(1, 1)
    if x.ndim == 1:
        return x[:, None]
    if x.ndim == 2:
        return x
    raise ValueError(f"inputs must be (N,) or (N, D); got shape {x.shape}")


def pairwise_dot(x, y) -> jnp.ndarray:
    """<x_i, y_j> as an (N, M) matrix — a single MXU matmul."""
    x = ensure_2d(x)
    y = ensure_2d(y)
    return jnp.matmul(x, y.T, preferred_element_type=x.dtype)


def pairwise_sqdist(x, y) -> jnp.ndarray:
    """||x_i - y_j||^2 via the matmul identity |x|^2 - 2<x,y> + |y|^2.

    The identity can go slightly negative in floating point, which would
    poison downstream sqrt (Matern kernels), so the *value* is clamped at
    zero — but via stop_gradient, so derivatives remain those of the raw
    polynomial (exact at any order; a plain `maximum` zeroes the tangents of
    every clamped entry, which silently corrupts derivative processes and
    Hessian-of-kernel computations on the diagonal).
    """
    x = ensure_2d(x)
    y = ensure_2d(y)
    if x.shape[1] == 1:
        # D=1: the direct difference is exact (a square is non-negative by
        # construction — no clamp machinery) and both cheaper and simpler
        # to differentiate than the matmul identity: measured ~90 ms off
        # the N=16k logpdf+grad pipeline backward on v5e (round 3)
        d = x[:, 0][:, None] - y[:, 0][None, :]
        return d * d
    xx = jnp.sum(x * x, axis=-1)
    yy = jnp.sum(y * y, axis=-1)
    sq = xx[:, None] - 2.0 * jnp.matmul(x, y.T, preferred_element_type=x.dtype) + yy[None, :]
    return sq + jax.lax.stop_gradient(jnp.maximum(sq, 0.0) - sq)


def pairwise_dist(x, y) -> jnp.ndarray:
    """||x_i - y_j|| with a safe gradient at 0.

    d/dx sqrt(u) blows up at u=0; Matern kernels are exactly the place where
    the diagonal hits u=0, so we lower-bound inside the sqrt and zero out the
    true-zero entries exactly.
    """
    x2 = ensure_2d(x)
    y2 = ensure_2d(y)
    if x2.shape[1] == 1:
        # D=1: |x_i − y_j| exactly; jnp.abs has gradient sign(d) with
        # sign(0) = 0, matching the masked-sqrt convention on the diagonal
        return jnp.abs(x2[:, 0][:, None] - y2[:, 0][None, :])
    sq = pairwise_sqdist(x, y)
    # Floor at eps^2 (not tiny): robust on hardware that flushes denormals,
    # and the resulting O(eps) distance bias is masked to exact zero anyway.
    eps = jnp.finfo(sq.dtype).eps ** 2
    return jnp.sqrt(jnp.maximum(sq, eps)) * (sq > 0)


def sqdist_diag(x, y) -> jnp.ndarray:
    """||x_i - y_i||^2 elementwise — the O(N) diag path (internals.md:12-24)."""
    x = ensure_2d(x)
    y = ensure_2d(y)
    d = x - y
    return jnp.sum(d * d, axis=-1)


def dist_diag(x, y) -> jnp.ndarray:
    sq = sqdist_diag(x, y)
    eps = jnp.finfo(sq.dtype).eps ** 2
    return jnp.sqrt(jnp.maximum(sq, eps)) * (sq > 0)


def dot_diag(x, y) -> jnp.ndarray:
    x = ensure_2d(x)
    y = ensure_2d(y)
    return jnp.sum(x * y, axis=-1)
