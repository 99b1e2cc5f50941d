"""Pallas TPU kernel: fused tiled pairwise kernel matrix.

Computes K[i,j] = g(||x_i - y_j||²) in one pass: the cross-term lands on the
MXU as a (T×D)@(D×T) matmul per tile, the norms are rank-1 broadcasts, and
the kernel epilogue g (exp / Matern polynomial) is applied in VMEM before the
tile is written — K touches HBM exactly once, with no d² intermediate.

This replaces the reference's KernelFunctions.jl pairwise path (the layer-0
hot spot of SURVEY.md §3.2) for the kernels that dominate the workloads
(SE, Matern 1/2, 3/2, 5/2).

The module autodetects TPU; elsewhere (CPU tests) it runs in interpret mode,
and `kernelmatrix_pallas` falls back to the pure-XLA path for unsupported
kernels (algebraic compositions etc.).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stheno_tpu.ops.pairwise import ensure_2d


def _interpret():
    return jax.default_backend() != "tpu"


def _epilogue(name, sq, dtype):
    """Elementwise kernel function applied to squared distances."""
    if name == "se":
        return jnp.exp(-0.5 * sq)
    eps = jnp.asarray(jnp.finfo(dtype).eps ** 2, dtype)
    d = jnp.sqrt(jnp.maximum(sq, eps)) * (sq > 0)
    if name == "matern12":
        return jnp.exp(-d)
    if name == "matern32":
        d3 = jnp.sqrt(jnp.asarray(3.0, dtype)) * d
        return (1.0 + d3) * jnp.exp(-d3)
    if name == "matern52":
        d5 = jnp.sqrt(jnp.asarray(5.0, dtype)) * d
        return (1.0 + d5 + d5 * d5 / 3.0) * jnp.exp(-d5)
    raise ValueError(f"unknown kernel epilogue {name!r}")


def _km_kernel(var_ref, x_ref, y_ref, out_ref, *, name):
    # lengthscale is folded into the inputs by the caller; variance arrives
    # as a (1, 1) SMEM scalar
    x = x_ref[:]  # (Tm, D)
    y = y_ref[:]  # (Tn, D)
    xx = jnp.sum(x * x, axis=-1)  # (Tm,)
    yy = jnp.sum(y * y, axis=-1)  # (Tn,)
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tm, Tn) on the MXU
    sq = jnp.maximum(xx[:, None] - 2.0 * cross + yy[None, :], 0.0)
    out_ref[:] = (var_ref[0, 0] * _epilogue(name, sq, sq.dtype)).astype(out_ref.dtype)


def pairwise_kernelmatrix(
    x,
    y=None,
    *,
    name="se",
    variance=1.0,
    lengthscale=1.0,
    tile_m=512,
    tile_n=512,
):
    """Fused pairwise kernel matrix for stationary kernels.

    x: (N, D) or (N,); y defaults to x.  `lengthscale` may be a scalar or a
    per-dimension vector (ARD).  Returns (N, M).
    """
    same = y is None
    x = ensure_2d(x)
    y = x if same else ensure_2d(y)
    n, d = x.shape
    m = y.shape[0]
    dt = x.dtype

    tile_m = min(tile_m, n)
    tile_n = min(tile_n, m)
    if n % tile_m != 0 or m % tile_n != 0:
        # ragged sizes: single-tile fallback grid via padding-free XLA path
        raise ValueError(
            f"N={n}, M={m} must be multiples of tiles ({tile_m}, {tile_n}); "
            "pad inputs or use the XLA kernelmatrix"
        )

    inv_ls = (1.0 / jnp.asarray(lengthscale, dt)) * jnp.ones((d,), dt)
    xs = x * inv_ls[None, :]
    ys = xs if same else y * inv_ls[None, :]
    var2d = jnp.asarray(variance, dt).reshape(1, 1)

    grid = (n // tile_m, m // tile_n)
    out = pl.pallas_call(
        functools.partial(_km_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((n, m), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d + 8 * n * m,
            bytes_accessed=(n * d + m * d + n * m) * x.dtype.itemsize,
            transcendentals=n * m,
        ),
    )(var2d, xs, ys)

    if same and name != "se":
        # pin the diagonal exactly (distance-based kernels)
        out = out.at[jnp.arange(n), jnp.arange(n)].set(variance)
    return out
