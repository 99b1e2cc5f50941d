"""Pallas single-block Cholesky + triangular inverse: one PSD/triangular
block factorised entirely in VMEM.

Why: the blocked factorisation (`ops/blocked_cholesky.py`) recurses down to a
base case; XLA's `lax.linalg.cholesky` / TRSM at that size are latency-bound
(their internal loops round-trip HBM per mini-step).  At N=16k the pipeline
runs N/base = 64 *serially dependent* base factorisations, so base-case
latency is on the critical path.  These kernels keep the whole block in VMEM
and run the classic column/row sweeps as one `fori_loop` — no HBM traffic
between steps.

Mosaic does not allow dynamic indexing in the lane (last) dimension, so the
sweeps avoid dynamic slicing altogether: the running factor is a loop-carried
VALUE, rows/columns are extracted with mask-reductions and written back with
`where` masks (an O(n²) VPU pass per step — cheap next to the per-step MXU
matvec, and entirely in-register/VMEM).

Column update for the Cholesky sweep (the zero-column invariant does the
masking: columns ≥ j of L are still zero, so a full-width matvec only picks
up factored columns):

    w       = A[:, j] - L @ L[j, :]ᵀ
    L[:, j] = w · rsqrt(w[j])  on rows ≥ j,  0 above the diagonal

Replaces the reference's LAPACK `cholesky`/`trsm` base (AbstractGPs delegates
to Julia's LinearAlgebra — SURVEY.md §0); interpret mode covers CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(a_ref, l_ref):
    n = a_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    A = a_ref[:]

    def col_step(j, L):
        # row j of L / column j of A via mask-reductions (no dynamic lanes)
        l_row = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0, keepdims=True)
        a_col = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1, keepdims=True)
        w = a_col - jnp.dot(L, l_row.T, preferred_element_type=A.dtype)
        d = jnp.sum(jnp.where(rows1 == j, w, 0.0))
        col = jnp.where(rows1 >= j, w * jax.lax.rsqrt(d), 0.0)
        return jnp.where(cols == j, col, L)

    l_ref[:] = jax.lax.fori_loop(0, n, col_step, jnp.zeros_like(A))


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


def _tri_inv_kernel(l_ref, m_ref):
    n = l_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    L = l_ref[:]

    def row_step(i, M):
        l_row = jnp.sum(jnp.where(rows == i, L, 0.0), axis=0, keepdims=True)
        # rows ≥ i of M are still zero → full vecmat picks up rows < i only
        acc = jnp.dot(l_row, M, preferred_element_type=L.dtype)
        d = jnp.sum(jnp.where(cols1 == i, l_row, 0.0))
        e_i = jnp.where(cols1 == i, 1.0, 0.0).astype(L.dtype)
        row = jnp.where(cols1 <= i, (e_i - acc) / d, 0.0)
        return jnp.where(rows == i, row, M)

    m_ref[:] = jax.lax.fori_loop(0, n, row_step, jnp.zeros_like(L))


@functools.partial(jax.jit, static_argnums=(1,))
def tri_inv_block(L, interpret=False):
    """Inverse of a single lower-triangular block, fully in VMEM (n ≤ ~1024).

    Base case of `blocked_tri_inv_lower` — replaces XLA's sequential
    TRSM-vs-I, which round-trips HBM per internal step."""
    n = L.shape[-1]
    return pl.pallas_call(
        _tri_inv_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=2 * n * n * L.dtype.itemsize,
            transcendentals=0,
        ),
    )(L)


def tri_inv_block_auto(L):
    """`tri_inv_block` with interpret mode on non-TPU backends."""
    return tri_inv_block(L, jax.default_backend() != "tpu")
