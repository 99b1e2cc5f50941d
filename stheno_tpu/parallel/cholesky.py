"""Distributed blocked Cholesky + triangular solves + logpdf over a
row-sharded mesh axis — the big-N exact-GP path (SURVEY.md §2.3 'TP' row and
§7.3: the single riskiest component).

Layout: K (N, N) with **rows block-sharded** over mesh axis `rows` (device d
holds the contiguous row slab [d·N/P, (d+1)·N/P)).  Right-looking panel
algorithm, with the panel loop **statically unrolled** (N/B steps, like the
single-chip blocked factorisation) so every trailing-update GEMM runs on the
exact static trailing column slice — no masked full-width GEMMs:

  for each B-column panel k (c = k·B, static):
    1. every device extracts its (possibly empty) slice of the diagonal
       block; a `psum` assembles it everywhere (replicated O(B²) compute);
    2. L_kk = chol(diag) computed redundantly on all devices (cheap, avoids
       a broadcast round-trip);
    3. each device TRSMs its local panel rows;
    4. `all_gather` of the panel column (N·B) — the only O(N) communication,
       riding ICI;
    5. trailing update of local rows below the panel: one
       (n_loc × B) @ (B × N−c−B) MXU matmul on the *static* trailing slice.

Per-device program cost: Σ_k n_loc·B·(N−kB) ≈ **N³/(2P) multiply-adds**
(verified against the XLA cost model in tests/test_parallel.py).  That is
the SPMD floor for a 1-D *contiguous-slab* row layout: the last device's
rows genuinely need every trailing column, and every device executes the
same program.  A 2-D block-cyclic ('row','col') layout would cut this to
~N³/(6P) MACs at the price of a second collective axis — the identified
round-3 lever if pod-scale profiles show the factorisation dominating.
Communication: (N/B) rounds × N·B words = N² words total, independent of P.
Panel size B should be an MXU multiple (128+ on TPU).

The forward/backward substitutions follow the same panel structure (multi-RHS:
b may be (N,) or (N, K)), and `distributed_mvn_logpdf` composes kernel-rows →
Cholesky → solve → logdet with only psum/all_gather collectives.
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


def _assemble_diag_block(M_loc, c, B, row_base, n_loc, axis_name):
    """psum-assemble the (B, B) diagonal block at global offset c from the
    row-sharded M (each device contributes its slice or zeros)."""
    dt = M_loc.dtype
    start = jnp.clip(jnp.int32(c) - row_base, 0, n_loc - B)
    mine = (jnp.int32(c) >= row_base) & (jnp.int32(c + B) <= row_base + n_loc)
    contrib = lax.dynamic_slice(M_loc, (start, jnp.int32(c)), (B, B))
    return lax.psum(
        jnp.where(mine, contrib, jnp.zeros((B, B), dt)), axis_name
    )


def _chol_panel_loop(K_loc, block_size, axis_name, n_total):
    """The shard_map body: in-place panel factorisation of the local slab.

    Statically unrolled over panels — the trailing update is an exact-shape
    GEMM per step (no column masking), so per-device program FLOPs are
    N³/(2P) + O(N²B) instead of the N³/P a masked full-width update costs.
    """
    p = lax.axis_size(axis_name)
    rank = _axis_rank(axis_name)
    n_loc = K_loc.shape[0]
    dt = K_loc.dtype
    B = block_size
    nb = n_total // B

    row_base = jnp.int32(rank) * n_loc  # global index of this slab's first row
    local_rows = row_base + jnp.arange(n_loc)  # (n_loc,) global row ids
    cols = jnp.arange(n_total)

    for kb in range(nb):
        c = kb * B  # static

        # -- 1+2: assemble the diagonal block everywhere, factor it --------
        diag = _assemble_diag_block(K_loc, c, B, row_base, n_loc, axis_name)
        L_kk = _chol.cholesky_psd(diag)

        # -- 3: TRSM local panel rows -------------------------------------
        panel = K_loc[:, c : c + B]  # (n_loc, B), static slice
        # L_ik = A_ik L_kk^{-T}  ⇔  solve L_kk X^T = A^T
        P_loc = _chol.solve_lower(L_kk, panel.T).T  # (n_loc, B)

        # rows inside the diagonal block take L_kk's rows; rows above c are
        # already final (zeros in these columns); rows below get the TRSM.
        in_diag = (local_rows >= c) & (local_rows < c + B)
        below = local_rows >= c + B
        diag_rows = L_kk[jnp.clip(local_rows - c, 0, B - 1)]
        new_panel = jnp.where(
            in_diag[:, None], diag_rows, jnp.where(below[:, None], P_loc, 0.0)
        )
        K_loc = lax.dynamic_update_slice(K_loc, new_panel, (jnp.int32(0), jnp.int32(c)))

        if c + B >= n_total:
            break

        # -- 4: gather the full panel column ------------------------------
        P_full = lax.all_gather(new_panel, axis_name)  # (p, n_loc, B)
        P_full = P_full.reshape(p * n_loc, B)  # (N, B) natural order

        # -- 5: trailing update on the static trailing column slice -------
        # rows not strictly below the panel contribute zero (their columns
        # beyond c+B are upper-triangle / already-final); accumulation
        # precision matters exactly as in the single-chip blocked
        # factorisation (ops/blocked_cholesky.py): route through the shared
        # >=HIGH-precision GEMM.
        trail = P_full[c + B :]  # (N - c - B, B), static slice
        update = _mm(new_panel * below[:, None], trail.T)  # (n_loc, N-c-B)
        K_loc = K_loc.at[:, c + B :].add(-update)

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
    """Solve L a = b (L lower, rows sharded; b sharded the same way; b may be
    (n_loc,) or (n_loc, K)).  Returns `a` replicated on every device."""
    rank = _axis_rank(axis_name)
    n_loc = L_loc.shape[0]
    dt = L_loc.dtype
    B = block_size
    nb = n_total // B
    row_base = jnp.int32(rank) * n_loc
    local_rows = row_base + jnp.arange(n_loc)

    vec = b_loc.ndim == 1
    if vec:
        b_loc = b_loc[:, None]
    k_rhs = b_loc.shape[1]

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
            jnp.where(
                mine,
                lax.dynamic_slice(r_loc, (start, jnp.int32(0)), (B, k_rhs)),
                jnp.zeros((B, k_rhs), dt),
            ),
            axis_name,
        )
        a_blk = _chol.solve_lower(Lkk, r_blk)
        a = lax.dynamic_update_slice(a, a_blk, (c, jnp.int32(0)))
        # update residual of rows below the panel
        L_panel = lax.dynamic_slice(L_loc, (jnp.int32(0), c), (n_loc, B))
        below = (local_rows >= c + B)[:, None]
        r_loc = r_loc - jnp.where(below, _mm(L_panel, a_blk), 0.0)
        return r_loc, a

    a0 = jnp.zeros((n_total, k_rhs), dt)
    _, a = lax.fori_loop(0, nb, body, (b_loc, a0))
    return a[:, 0] if vec else a


def distributed_solve_lower(mesh, L, b, block_size=128, axis_name="rows"):
    """Solve L a = b with L row-sharded and b row-sharded the same way
    (b: (N,) or (N, K)); returns `a` replicated."""
    n = L.shape[0]
    b_spec = P(axis_name) if b.ndim == 1 else P(axis_name, None)
    fn = shard_map(
        functools.partial(
            _fwd_solve_loop, block_size=block_size, axis_name=axis_name, n_total=n
        ),
        mesh=mesh,
        in_specs=(P(axis_name, None), b_spec),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L, b)


def _bwd_solve_loop(L_loc, b, block_size, axis_name, n_total):
    """Solve Lᵀ a = b (L lower, rows sharded; b REPLICATED, (N,) or (N, K)).
    Returns `a` replicated — blocked backward substitution from the last
    panel; each step's off-diagonal application is a local (B × n_loc) GEMM
    against the already-solved entries in this device's rows, psum-reduced.
    """
    rank = _axis_rank(axis_name)
    n_loc = L_loc.shape[0]
    dt = L_loc.dtype
    B = block_size
    nb = n_total // B
    row_base = jnp.int32(rank) * n_loc
    local_rows = row_base + jnp.arange(n_loc)

    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    k_rhs = b.shape[1]

    def body(i, a):
        k = nb - 1 - i
        c = jnp.int32(k) * B
        start = jnp.clip(c - row_base, 0, n_loc - B)
        mine = (c >= row_base) & (c + B <= row_base + n_loc)
        Lkk = lax.psum(
            jnp.where(
                mine,
                lax.dynamic_slice(L_loc, (start, c), (B, B)),
                jnp.zeros((B, B), dt),
            ),
            axis_name,
        )
        # residual: b[c:c+B] − Σ_{rows i > c+B} L[i, c:c+B]ᵀ a[i]
        panel = lax.dynamic_slice(L_loc, (jnp.int32(0), c), (n_loc, B))
        below = (local_rows >= c + B)[:, None]
        a_loc = lax.dynamic_slice(a, (row_base, jnp.int32(0)), (n_loc, k_rhs))
        contrib = lax.psum(
            _mm((panel * below).T, a_loc), axis_name
        )  # (B, k_rhs)
        r_blk = lax.dynamic_slice(b, (c, jnp.int32(0)), (B, k_rhs)) - contrib
        a_blk = _chol.solve_lower(Lkk, r_blk, trans=True)
        return lax.dynamic_update_slice(a, a_blk, (c, jnp.int32(0)))

    a0 = jnp.zeros((n_total, k_rhs), dt)
    a = lax.fori_loop(0, nb, body, a0)
    return a[:, 0] if vec else a


def distributed_solve_upper_T(mesh, L, b, block_size=128, axis_name="rows"):
    """Solve Lᵀ a = b with L row-sharded and b replicated ((N,) or (N, K));
    returns `a` replicated.  Together with `distributed_solve_lower` this
    gives the (L Lᵀ)⁻¹ application the posterior path needs."""
    n = L.shape[0]
    fn = shard_map(
        functools.partial(
            _bwd_solve_loop, block_size=block_size, axis_name=axis_name, n_total=n
        ),
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L, b)


def distributed_chol_solve(mesh, L, b, block_size=128, axis_name="rows"):
    """(L Lᵀ)⁻¹ b with L row-sharded; b row-sharded (its producer usually
    is); returns the solution replicated."""
    z = distributed_solve_lower(mesh, L, b, block_size=block_size, axis_name=axis_name)
    return distributed_solve_upper_T(
        mesh, L, z, block_size=block_size, axis_name=axis_name
    )


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


def distributed_lower_matvec(mesh, L, v, axis_name="rows"):
    """y = L v for a row-sharded L and replicated v ((N,) or (N, K));
    returns y row-sharded (the distributed `rand` building block)."""

    def body(L_loc, v_full):
        if v_full.ndim == 1:
            return _mm(L_loc, v_full[:, None])[:, 0]
        return _mm(L_loc, v_full)

    out_spec = P(axis_name) if v.ndim == 1 else P(axis_name, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(L, v)


# --------------------------------------------------------------------------
# Block-cyclic row layout (SURVEY.md §2.3 TP row: the cyclic distribution).
#
# The contiguous-slab factorisation above costs N³/(2P) MACs per device: as
# the factorisation proceeds, low-rank devices' rows are finished but the
# SPMD program still runs every device through the same full-slab GEMM.  A
# *cyclic* distribution of B-row blocks (global block g owned by device
# g mod P) keeps every device's active row count within one block of
# (N−c)/P at every panel, cutting the per-device program to ~N³/(3P) MACs —
# the floor for a row layout (a 2-D tile-cyclic layout would halve this
# again by skipping the upper-triangle halves of the trailing rectangles,
# but its rank-dependent tile sets cannot ride a single static-shape SPMD
# program without masking the saving away; the row-cyclic point is the
# TPU-idiomatic optimum).
#
# The panel loop stays statically unrolled: for panel k, the set of *local
# block slots* strictly below the panel is [t_start(k), nbl) with
# t_start(k) = ceil((k+2−P)/P) — static, identical on every device up to one
# masked boundary block.  The gathered panel is mapped back to natural row
# order by a static permutation (pure data movement, O(N·B) per panel).
# --------------------------------------------------------------------------


def _cyclic_perm(nb, p):
    """Global block order that makes the cyclic layout contiguous per device
    (device d's slots hold global blocks [d, d+P, d+2P, …]) — the reference
    permutation for the shard_map relayout below (used by its tests)."""
    import numpy as np

    return np.arange(nb).reshape(-1, p).T.reshape(-1)  # [0, p, 2p, …, 1, …]


def _relayout_body(x_loc, *, block_size, axis_name, p, to_cyc):
    """shard_map body for the contiguous ↔ cyclic row-block relayout.

    A padded `all_to_all`: each device owns m = n_loc/B row blocks and
    sends each to its new owner (≤ q = ⌈m/p⌉ blocks per destination pair),
    so per-device traffic is O(n_loc·N) words — one slab, never the full
    matrix.  (A global permutation outside shard_map is NOT equivalent:
    GSPMD materialises the gather replicated, i.e. full K per device —
    measured, and pinned by tests/test_parallel.py.)
    """
    rank = lax.axis_index(axis_name)
    n_loc = x_loc.shape[0]
    rest = x_loc.shape[1:]
    B = block_size
    m = n_loc // B
    q = -(-m // p)  # ceil

    blocks = x_loc.reshape((m, B) + rest)
    send = jnp.zeros((p, q, B) + rest, x_loc.dtype)
    zero = jnp.int32(0)
    for j in range(m):  # static unroll; m is small (n_loc/B)
        if to_cyc:
            g = rank * m + j  # global block id (contiguous source)
            r = g % p  # new owner under the cyclic layout
            i = jnp.int32(j // p)  # its slot among this pair's sends
        else:
            g = rank + j * p  # global block id (cyclic source, slot j)
            r = g // m  # owner under the contiguous layout
            i = (g - r * m) // p
        send = lax.dynamic_update_slice(
            send,
            blocks[j][None, None],
            (jnp.int32(r), jnp.int32(i)) + (zero,) * (blocks[j].ndim),
        )

    recv = lax.all_to_all(send, axis_name, 0, 0)  # recv[s] = s's send to me
    flat = recv.reshape((p * q, B) + rest)
    ts = jnp.arange(m)
    if to_cyc:
        g = rank + ts * p  # my cyclic slots' global block ids
        d = g // m  # contiguous source device
        i = (g % m) // p  # the slot it used
    else:
        g = rank * m + ts  # my contiguous blocks' global ids
        d = g % p  # cyclic source device
        i = ts // p
    out = jnp.take(flat, d * q + i, axis=0)
    return out.reshape((n_loc,) + rest)


def _relayout(mesh, K, block_size, axis_name, to_cyc):
    p = mesh.shape[axis_name]
    if p == 1:
        return K
    spec = P(axis_name, *([None] * (K.ndim - 1)))
    fn = shard_map(
        functools.partial(
            _relayout_body,
            block_size=block_size,
            axis_name=axis_name,
            p=p,
            to_cyc=to_cyc,
        ),
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
    )
    return fn(K)


def to_cyclic(mesh, K, block_size, axis_name="rows"):
    """Re-shard a (contiguously) row-sharded (N, …) array into the
    block-cyclic row layout (returned array is again row-sharded)."""
    return _relayout(mesh, K, block_size, axis_name, to_cyc=True)


def from_cyclic(mesh, K, block_size, axis_name="rows"):
    """Inverse of `to_cyclic`."""
    return _relayout(mesh, K, block_size, axis_name, to_cyc=False)


def _chol_cyclic_loop(K_loc, block_size, axis_name, n_total, p):
    """shard_map body: panel factorisation of the cyclic-layout local slab.

    Local slot t on rank r holds global row block g = r + t·P."""
    import numpy as np

    rank = _axis_rank(axis_name)
    n_loc = K_loc.shape[0]
    dt = K_loc.dtype
    B = block_size
    nb = n_total // B
    nbl = nb // p

    # global row id of each local row (traced: depends on rank)
    slots = jnp.arange(n_loc) // B
    within = jnp.arange(n_loc) % B
    g_rows = (rank + slots * p) * B + within  # (n_loc,)

    for k in range(nb):
        c = k * B
        owner, s = k % p, k // p  # static

        # -- diagonal block: owner's static slot, psum-broadcast ----------
        contrib = K_loc[s * B : (s + 1) * B, c : c + B]
        diag = lax.psum(
            jnp.where(rank == owner, contrib, jnp.zeros((B, B), dt)),
            axis_name,
        )
        L_kk = _chol.cholesky_psd(diag)

        # owner writes L_kk into its diagonal rows
        new_diag = jnp.where(rank == owner, L_kk, contrib)
        K_loc = K_loc.at[s * B : (s + 1) * B, c : c + B].set(new_diag)

        # -- active (strictly-below) local slots: static range ------------
        t_start = max(0, -((-(k + 2 - p)) // p))  # ceil((k+2-p)/p), ≥ 0
        if t_start >= nbl:
            continue
        rs = t_start * B
        m_loc = n_loc - rs
        below = (g_rows[rs:] >= c + B)[:, None]  # ≤ one masked boundary block

        A_act = K_loc[rs:, c : c + B]  # (m_loc, B)
        P_act = _chol.solve_lower(L_kk, A_act.T).T
        new_act = jnp.where(below, P_act, jnp.zeros_like(P_act))
        K_loc = K_loc.at[rs:, c : c + B].set(
            jnp.where(below, new_act, A_act)
        )

        if c + B >= n_total:
            continue

        # -- gather the panel and restore natural row order ---------------
        gathered = lax.all_gather(new_act, axis_name)  # (p, m_loc, B)
        flat = gathered.reshape(p * m_loc, B)
        # static permutation: trailing global row gr → gathered flat index
        gr = np.arange(c + B, n_total)
        g = gr // B
        idx = (g % p) * m_loc + (g // p - t_start) * B + gr % B
        trail = flat[jnp.asarray(idx)]  # (n_total - c - B, B)

        # -- trailing update on active rows only --------------------------
        update = _mm(new_act, trail.T)  # (m_loc, n_total - c - B)
        K_loc = K_loc.at[rs:, c + B :].add(-update)

    # zero the strict upper triangle (global coordinates)
    cols = jnp.arange(n_total)
    return jnp.where(cols[None, :] <= g_rows[:, None], K_loc, 0.0)


def distributed_cholesky_cyclic(mesh, K, block_size=128, axis_name="rows"):
    """Lower Cholesky factor of a PSD matrix whose rows are sharded over
    `axis_name`, computed in a block-cyclic row layout for load balance
    (~N³/(3P) MACs per device vs N³/(2P) for `distributed_cholesky`).

    Takes and returns the standard contiguous row sharding; the cyclic
    re-layout happens internally (two all-to-all-class reshards, O(N²/P)
    words each — negligible next to the N² total panel-gather traffic).
    """
    n = K.shape[0]
    p = mesh.shape[axis_name]
    n_loc = _local_slab(n, p)
    nb = n // block_size
    if n % block_size != 0 or nb % p != 0:
        raise ValueError(
            f"N={n} needs block_size | N and P | (N/block_size) "
            f"(got block_size={block_size}, P={p})"
        )
    del n_loc

    Kc = to_cyclic(mesh, K, block_size, axis_name=axis_name)
    fn = shard_map(
        functools.partial(
            _chol_cyclic_loop,
            block_size=block_size,
            axis_name=axis_name,
            n_total=n,
            p=p,
        ),
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
    )
    Lc = fn(Kc)
    return from_cyclic(mesh, Lc, block_size, axis_name=axis_name)


def cyclic_compatible(n, p, block_size):
    """True iff the block-cyclic layout's divisibility constraints hold:
    block_size | N and P | (N/block_size)."""
    return n % block_size == 0 and (n // block_size) % p == 0


def _pick_cyclic_block(n, p, block_size):
    """Shrink the panel width toward m = n/(p·B) ≥ p row blocks per device,
    so the relayout's padded all_to_all stays at ~one slab of temp per
    direction (the padding factor is p·⌈m/p⌉/m) — but never past 32-wide
    panels and never beyond 48 total panels: the panel loop is statically
    unrolled, so nb = n/B directly scales compile time (the padding left
    over is memory-only, bounded by ~p·B·n words per direction)."""
    B = block_size
    while B > 32:
        half = B // 2
        if (n // p) // B >= p:
            break
        if not cyclic_compatible(n, p, half) or n // half > 48:
            break
        B = half
    return B


def distributed_cholesky_auto(mesh, K, block_size=128, axis_name="rows"):
    """Default distributed factorisation: routes to the load-balanced
    block-cyclic variant (~N³/(3P) MACs/device) whenever divisibility
    allows, falling back to the contiguous-slab variant (~N³/(2P))
    otherwise.  Same contiguous row sharding in and out either way."""
    n = K.shape[0]
    p = mesh.shape[axis_name]
    if cyclic_compatible(n, p, block_size):
        return distributed_cholesky_cyclic(
            mesh,
            K,
            block_size=_pick_cyclic_block(n, p, block_size),
            axis_name=axis_name,
        )
    return distributed_cholesky(
        mesh, K, block_size=block_size, axis_name=axis_name
    )


def distributed_mvn_logpdf(mesh, K, mean, y, block_size=128, axis_name="rows"):
    """log N(y; mean, K) with K rows sharded over `axis_name`.

    One distributed Cholesky (cyclic layout when divisibility allows) + one
    distributed forward solve + psum'd logdet/quadratic — the sharded
    analogue of ops.chol.mvn_logpdf_chol.
    """
    n = K.shape[0]
    L = distributed_cholesky_auto(
        mesh, K, block_size=block_size, axis_name=axis_name
    )
    alpha = distributed_solve_lower(
        mesh, L, y - mean, block_size=block_size, axis_name=axis_name
    )
    logdet = distributed_logdet_chol(mesh, L, axis_name=axis_name)
    quad = jnp.sum(alpha * alpha)
    dt = K.dtype
    return -0.5 * (n * jnp.log(jnp.asarray(2.0 * jnp.pi, dt)) + logdet + quad)
