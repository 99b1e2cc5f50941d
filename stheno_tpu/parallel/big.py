"""Big-N exact GPs: row-sharded kernel matrices and the distributed logpdf
path (ring/blockwise evaluation — the GP analogue of sequence parallelism,
SURVEY.md §2.3 'SP' row).

`sharded_kernelmatrix` computes K with rows sharded over the mesh: each
device holds its slab of inputs and receives the full input set via
`all_gather` (inputs are O(N·D) — tiny next to the O(N²) matrix, so a single
gather beats a ring for the sizes where the matrix itself is the constraint).
The resulting K never exists on one device.

`big_gp_logpdf` = sharded K rows + distributed Cholesky + panel solve
(parallel.cholesky) — exact-GP log-marginal-likelihood for N ≫ 10⁴ across a
pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from stheno_tpu.parallel.cholesky import (
    distributed_cholesky_auto,
    distributed_solve_lower,
    distributed_logdet_chol,
)


def sharded_kernelmatrix(mesh, kernel, x, noise=None, axis_name="rows"):
    """K(x, x) (+ noise·I) with rows sharded over `axis_name`.

    `x`: (N,) or (N, D) — will be placed row-sharded.  Returns the global
    (N, N) array whose row axis is sharded on the mesh.
    """
    n = x.shape[0]
    p = mesh.shape[axis_name]
    if n % p != 0:
        raise ValueError(f"N={n} must divide over {p} devices (pad inputs)")

    def body(x_loc):
        rank = lax.axis_index(axis_name)
        x_all = lax.all_gather(x_loc, axis_name)  # (p, n_loc, ...)
        x_full = x_all.reshape((n,) + x_loc.shape[1:])
        K_rows = kernel.matrix(x_loc, x_full)  # (n_loc, N)
        if noise is not None:
            n_loc = x_loc.shape[0]
            cols = jnp.arange(n)
            rows = rank * n_loc + jnp.arange(n_loc)
            K_rows = K_rows + jnp.asarray(noise, K_rows.dtype) * (
                rows[:, None] == cols[None, :]
            )
        return K_rows

    in_spec = P(axis_name) if x.ndim == 1 else P(axis_name, None)
    fn = shard_map(
        body, mesh=mesh, in_specs=in_spec, out_specs=P(axis_name, None)
    )
    return fn(x)


def sharded_matvec(mesh, K, v, axis_name="rows"):
    """y = K v with K rows sharded: local matmul + replicated v."""

    def body(K_loc, v_full):
        # >=HIGH precision: a length-N f32 dot accumulated in 1-pass bf16
        # loses ~2^-8 relative — visible in posterior means at large N
        from stheno_tpu.ops.blocked_cholesky import _mm

        if v_full.ndim == 1:
            return _mm(K_loc, v_full[:, None])[:, 0]
        return _mm(K_loc, v_full)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(axis_name),
    )
    return fn(K, v)


def big_gp_logpdf(mesh, kernel, x, y, noise, block_size=128, axis_name="rows"):
    """Exact log N(y; 0, K + σ²I) with every O(N²)+ object sharded.

    The mean is taken as zero (center y beforehand for nonzero means).
    Differentiable: the whole pipeline is shard_map'd jnp, so `jax.grad`
    w.r.t. kernel hyperparameters / noise works through the collectives.
    """
    K = sharded_kernelmatrix(mesh, kernel, x, noise=noise, axis_name=axis_name)
    n = K.shape[0]
    L = distributed_cholesky_auto(
        mesh, K, block_size=block_size, axis_name=axis_name
    )
    alpha = distributed_solve_lower(
        mesh, L, y, block_size=block_size, axis_name=axis_name
    )
    logdet = distributed_logdet_chol(mesh, L, axis_name=axis_name)
    dt = K.dtype
    return -0.5 * (
        n * jnp.log(jnp.asarray(2.0 * jnp.pi, dt)) + logdet + jnp.sum(alpha * alpha)
    )
