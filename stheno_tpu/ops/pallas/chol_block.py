"""Pallas single-block Cholesky: factor one PSD block entirely in VMEM.

Why: the blocked factorisation (`ops/blocked_cholesky.py`) recurses down to a
base case; XLA's `lax.linalg.cholesky` at that size is latency-bound (its
internal loop round-trips HBM per mini-step).  At N=16k the pipeline runs
N/base = 64 *serially dependent* base factorisations, so base-case latency is
on the critical path.  This kernel keeps the whole block in VMEM and runs the
classic left-looking column sweep as one `fori_loop` — no HBM traffic between
columns.

Column update (the zero-column invariant does the masking for us: columns
≥ j of L are still zero, so a full-width matvec only picks up factored
columns):

    w   = A[:, j] - L @ L[j, :]ᵀ
    L[:, j] = w · rsqrt(w[j])  on rows ≥ j,  0 above the diagonal

Replaces the reference's LAPACK `cholesky` base (AbstractGPs delegates to
Julia's LinearAlgebra — SURVEY.md §0); interpret mode covers CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(a_ref, l_ref):
    n = a_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    l_ref[:] = jnp.zeros_like(l_ref)

    def col_step(j, _):
        a_col = a_ref[:, pl.ds(j, 1)]                      # (n, 1)
        l_row = l_ref[pl.ds(j, 1), :]                      # (1, n)
        w = a_col - jnp.dot(
            l_ref[:], l_row.T, preferred_element_type=a_col.dtype
        )
        d = jnp.sum(jnp.where(row_ids == j, w, 0.0))
        col = jnp.where(row_ids >= j, w * jax.lax.rsqrt(d), 0.0)
        l_ref[:, pl.ds(j, 1)] = col.astype(l_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n, col_step, 0)


@functools.partial(jax.jit, static_argnums=(1,))
def chol_block(A, interpret=False):
    """Lower Cholesky factor of a single PSD block (n ≤ ~1024, f32).

    The whole block lives in VMEM for the duration; intended as the base case
    of `blocked_cholesky`, not for large n.
    """
    n = A.shape[-1]
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=2 * n * n * A.dtype.itemsize,
            transcendentals=n,
        ),
    )(A)


def chol_block_auto(A):
    """`chol_block` with interpret mode on non-TPU backends (CPU tests)."""
    return chol_block(A, jax.default_backend() != "tpu")
