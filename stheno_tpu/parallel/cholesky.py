"""Distributed blocked Cholesky + triangular solve + logpdf over a row-sharded
mesh axis — the big-N exact-GP path (SURVEY.md §2.3 'TP' row and §7.3: the
single riskiest component).

Layout: K (N, N) with **rows block-sharded** over mesh axis `rows` (device d
holds the contiguous row slab [d·N/P, (d+1)·N/P)).  Right-looking panel
algorithm, one `lax.fori_loop` over column panels inside `shard_map`:

  for each B-column panel k:
    1. every device extracts its (possibly empty) slice of the diagonal
       block; a `psum` assembles it everywhere (replicated O(B²) compute);
    2. L_kk = chol(diag) computed redundantly on all devices (cheap, avoids
       a broadcast round-trip);
    3. each device TRSMs its local panel rows;
    4. `all_gather` of the panel column (N·B) — the only O(N) communication,
       riding ICI;
    5. trailing update of local rows: one (N/P × B) @ (B × N) MXU matmul,
       masked to the active trailing region.

FLOPs per device: ~N³/(2P) + masking overhead; communication: (N/B) rounds ×
N·B words = N² words total, independent of P.  Panel size B should be an MXU
multiple (128 on TPU).

The forward/backward substitutions follow the same panel structure, and
`distributed_mvn_logpdf` composes kernel-rows → Cholesky → solve → logdet
with only psum/all_gather collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from stheno_tpu.ops import chol as _chol
from stheno_tpu.ops.blocked_cholesky import _mm


def _axis_rank(axis_name):
    return lax.axis_index(axis_name)


def _local_slab(n, p):
    if n % p != 0:
        raise ValueError(f"N={n} must divide evenly over {p} devices (pad first)")
    return n // p


def _chol_panel_loop(K_loc, block_size, axis_name, n_total):
    """The shard_map body: in-place panel factorisation of the local slab."""
    p = lax.axis_size(axis_name)
    rank = _axis_rank(axis_name)
    n_loc = K_loc.shape[0]
    dt = K_loc.dtype
    nb = n_total // block_size
    B = block_size

    row_base = jnp.int32(rank) * n_loc  # global index of this slab's first row
    local_rows = row_base + jnp.arange(n_loc)  # (n_loc,) global row ids
    cols = jnp.arange(n_total)

    def body(k, K_loc):
        c = jnp.int32(k) * B  # global first column of the panel

        # -- 1+2: assemble the diagonal block everywhere, factor it --------
        start = jnp.clip(c - row_base, 0, n_loc - B)
        mine = (c >= row_base) & (c + B <= row_base + n_loc)
        diag_contrib = lax.dynamic_slice(K_loc, (start, c), (B, B))
        diag = lax.psum(
            jnp.where(mine, diag_contrib, jnp.zeros((B, B), dt)), axis_name
        )
        L_kk = _chol.cholesky_psd(diag)

        # -- 3: TRSM local panel rows -------------------------------------
        panel = lax.dynamic_slice(K_loc, (jnp.int32(0), c), (n_loc, B))  # (n_loc, B)
        # L_ik = A_ik L_kk^{-T}  ⇔  solve L_kk X^T = A^T
        P_loc = _chol.solve_lower(L_kk, panel.T).T  # (n_loc, B)

        # rows inside the diagonal block take L_kk's rows; rows above c are
        # already final (zeros in these columns); rows below get the TRSM.
        in_diag = (local_rows >= c) & (local_rows < c + B)
        below = local_rows >= c + B
        # row i in diag block ↦ row (i - c) of L_kk
        diag_rows = L_kk[jnp.clip(local_rows - c, 0, B - 1)]
        new_panel = jnp.where(
            in_diag[:, None], diag_rows, jnp.where(below[:, None], P_loc, 0.0)
        )
        K_loc = lax.dynamic_update_slice(K_loc, new_panel, (jnp.int32(0), c))

        # -- 4: gather the full panel column ------------------------------
        P_full = lax.all_gather(new_panel, axis_name)  # (p, n_loc, B)
        P_full = P_full.reshape(p * n_loc, B)  # (N, B) natural order

        # -- 5: trailing update -------------------------------------------
        row_act = below[:, None]  # local rows strictly below the panel
        col_act = (cols >= c + B)[None, :]  # trailing columns
        # accumulation precision matters here exactly as in the single-chip
        # blocked factorisation (ops/blocked_cholesky.py): TPU's default
        # 1-pass-bf16 matmul drives late diagonal blocks indefinite at large
        # N — route through the shared >=HIGH-precision GEMM.
        update = _mm(new_panel * row_act, P_full.T * col_act)
        K_loc = K_loc - jnp.where(col_act, update, 0.0)
        return K_loc

    K_loc = lax.fori_loop(0, nb, body, K_loc)
    # zero the strict upper triangle of the global matrix in local rows
    K_loc = jnp.where(cols[None, :] <= local_rows[:, None], K_loc, 0.0)
    return K_loc


def distributed_cholesky(mesh, K, block_size=128, axis_name="rows"):
    """Lower Cholesky factor of a PSD matrix whose rows are sharded over
    `axis_name`.  Returns L with the same row sharding."""
    n = K.shape[0]
    p = mesh.shape[axis_name]
    n_loc = _local_slab(n, p)
    if n % block_size != 0:
        raise ValueError(f"N={n} must be a multiple of block_size={block_size}")
    if n_loc % block_size != 0:
        raise ValueError(
            f"local slab {n_loc} must be a multiple of block_size={block_size} "
            "(diagonal blocks may not straddle devices)"
        )

    fn = shard_map(
        functools.partial(
            _chol_panel_loop,
            block_size=block_size,
            axis_name=axis_name,
            n_total=n,
        ),
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
    )
    return fn(K)


def _fwd_solve_loop(L_loc, b_loc, block_size, axis_name, n_total):
    """Solve L a = b (L lower, rows sharded; b sharded the same way).
    Returns `a` replicated on every device."""
    p = lax.axis_size(axis_name)
    rank = _axis_rank(axis_name)
    n_loc = L_loc.shape[0]
    dt = L_loc.dtype
    B = block_size
    nb = n_total // B
    row_base = jnp.int32(rank) * n_loc
    local_rows = row_base + jnp.arange(n_loc)

    # running local residual r = b - L[:, :done] @ a[:done]
    def body(k, carry):
        r_loc, a = carry
        c = jnp.int32(k) * B
        start = jnp.clip(c - row_base, 0, n_loc - B)
        mine = (c >= row_base) & (c + B <= row_base + n_loc)
        # diagonal block of L and the matching residual slice
        Lkk = lax.psum(
            jnp.where(
                mine,
                lax.dynamic_slice(L_loc, (start, c), (B, B)),
                jnp.zeros((B, B), dt),
            ),
            axis_name,
        )
        r_blk = lax.psum(
            jnp.where(mine, lax.dynamic_slice(r_loc, (start,), (B,)), jnp.zeros((B,), dt)),
            axis_name,
        )
        a_blk = _chol.solve_lower(Lkk, r_blk)
        a = lax.dynamic_update_slice(a, a_blk, (c,))
        # update residual of rows below the panel
        L_panel = lax.dynamic_slice(L_loc, (jnp.int32(0), c), (n_loc, B))
        below = (local_rows >= c + B)
        r_loc = r_loc - jnp.where(below, _mm(L_panel, a_blk[:, None])[:, 0], 0.0)
        return r_loc, a

    a0 = jnp.zeros((n_total,), dt)
    _, a = lax.fori_loop(0, nb, body, (b_loc, a0))
    return a


def distributed_solve_lower(mesh, L, b, block_size=128, axis_name="rows"):
    """Solve L a = b with L row-sharded; returns `a` replicated."""
    n = L.shape[0]
    fn = shard_map(
        functools.partial(
            _fwd_solve_loop, block_size=block_size, axis_name=axis_name, n_total=n
        ),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L, b)


def distributed_logdet_chol(mesh, L, axis_name="rows"):
    """log det(L Lᵀ) for a row-sharded lower factor."""
    n = L.shape[0]
    p = mesh.shape[axis_name]
    n_loc = n // p

    def body(L_loc):
        rank = _axis_rank(axis_name)
        local_rows = rank * n_loc + jnp.arange(n_loc)
        d = L_loc[jnp.arange(n_loc), local_rows]
        return lax.psum(2.0 * jnp.sum(jnp.log(d)), axis_name)

    fn = shard_map(
        body, mesh=mesh, in_specs=P(axis_name, None), out_specs=P(),
        check_vma=False,
    )
    return fn(L)


def distributed_mvn_logpdf(mesh, K, mean, y, block_size=128, axis_name="rows"):
    """log N(y; mean, K) with K rows sharded over `axis_name`.

    One distributed Cholesky + one distributed forward solve + psum'd
    logdet/quadratic — the sharded analogue of ops.chol.mvn_logpdf_chol.
    """
    n = K.shape[0]
    L = distributed_cholesky(mesh, K, block_size=block_size, axis_name=axis_name)
    alpha = distributed_solve_lower(
        mesh, L, y - mean, block_size=block_size, axis_name=axis_name
    )
    logdet = distributed_logdet_chol(mesh, L, axis_name=axis_name)
    quad = jnp.sum(alpha * alpha)
    dt = K.dtype
    return -0.5 * (n * jnp.log(jnp.asarray(2.0 * jnp.pi, dt)) + logdet + quad)
