"""Blocked left-looking Cholesky + blocked triangular solves with MXU-sized
panels — a JAX/XLA-structured replacement for `lax.linalg.cholesky` tuned for
TPU at large N.

Why: XLA's built-in TPU Cholesky uses a fixed small internal block, leaving
the MXU underfed at N ≳ 10⁴ (measured ~10× off roofline on the N=16k
logpdf+grad pipeline, BASELINE.md).  This implementation restructures the
factorisation so ~all FLOPs land in large static-shape GEMMs:

- panels of `block` columns (default 1024); the per-step update
  `A[c:, c:c+B] -= L[c:, :c] @ L[c:c+B, :c]ᵀ` is one big MXU matmul per step;
- the diagonal B×B factorisation recurses on this same routine down to a base
  case handled by `lax.linalg.cholesky` (small enough to be cheap);
- the TRSM `L21 = A21 L11⁻ᵀ` is computed as a *matmul with the explicit
  triangular inverse* (`triangular_solve` against I at B×B is cheap; applying
  it as a GEMM keeps the N-tall panel on the MXU rather than in XLA's
  sequential TRSM);
- the Python loop over panels is statically unrolled (N/B ≤ ~32 steps), so
  every slice has static shape — no masking waste, exact N³/3 FLOPs.

Everything is differentiable (pure jnp/lax ops) — `jax.grad` through the
unrolled factorisation has the same GEMM structure.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# TPU MXU matmuls on f32 inputs default to a single bf16 pass (~2^-8 relative
# error) — fatal inside the left-looking accumulation: the late diagonal
# blocks go indefinite and the factorisation NaNs (observed at N=16k).
# HIGH (3-pass bf16_3x, ~2^-21 relative error) is the default: measured
# correct at N=16k (factor trace invariant to 8e-6 relative) and 1.33× faster
# than HIGHEST (6-pass, full f32) — 78.8 vs 104.5 ms forward.  For workloads
# with jitter < ~1e-6 or N ≫ 10⁵, pin HIGHEST via `set_gemm_precision`.
_PREC = lax.Precision.HIGH


def set_gemm_precision(p):
    """Set the process-wide default MXU precision for all blocked-Cholesky/
    TRSM GEMMs.

    `p`: a `lax.Precision` or one of 'highest' | 'high'.  Returns the
    previous value.  Callers re-jit after changing this (it is trace-time
    state, like config flags).

    DEPRECATED in favour of the scoped, thread-local
    ``with stheno_tpu.config.gemm_precision(p): ...`` which cannot leak.
    """
    global _PREC
    if p is None:
        raise ValueError(
            "set_gemm_precision(None) is invalid (a forward precision is"
            " always required); use set_bwd_precision(None) to make the"
            " backward follow the forward"
        )
    prev = _PREC
    _PREC = lax.Precision[p.upper()] if isinstance(p, str) else p
    return prev


def _active_prec():
    from stheno_tpu import config as _cfg

    return _cfg.active_override("gemm_precision", _PREC)


def _mm(a, b):
    return jnp.matmul(a, b, precision=_active_prec())


def _lax_chol_lower(A):
    """lax cholesky reading ONLY the lower triangle (its default
    symmetrize_input=True would average each diagonal block — the blocked
    factorisation has pure tril(K) semantics, matching the reference's
    `cholesky(Symmetric(K))` one-triangle read; round 5)."""
    return lax.linalg.cholesky(A, symmetrize_input=False)


# Base-case factoriser for blocks ≤ `base`.  Default: XLA's built-in.  The
# Pallas in-VMEM kernel (`experimental/pallas/chol_block.py`) can be swapped in via
# `set_base_cholesky` — the N/base serially-dependent base factorisations sit
# on the critical path, so base-case latency matters at large N.
_BASE_CHOL = _lax_chol_lower


def set_base_cholesky(fn):
    """Swap the base-case factoriser (trace-time state; re-jit after).
    Returns the previous one.  DEPRECATED: prefer the scoped
    ``with stheno_tpu.config.scoped(base_cholesky=fn): ...``."""
    global _BASE_CHOL
    prev = _BASE_CHOL
    _BASE_CHOL = fn
    return prev


def _active_base_chol():
    from stheno_tpu import config as _cfg

    return _cfg.active_override("base_cholesky", _BASE_CHOL)


def _tri_inv_lower_xla(L):
    """Explicit inverse of a small lower-triangular matrix via TRSM vs I."""
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    return lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)


# Base-case triangular inverse — same latency argument as _BASE_CHOL: XLA's
# TRSM round-trips HBM per internal step; the Pallas in-VMEM row sweep
# (`experimental/pallas/chol_block.py:tri_inv_block`) can be swapped in.
_BASE_TRI_INV = _tri_inv_lower_xla


def set_base_tri_inv(fn):
    """Swap the base-case triangular inverse (trace-time state; re-jit
    after).  Returns the previous one.  DEPRECATED: prefer the scoped
    ``with stheno_tpu.config.scoped(base_tri_inv=fn): ...``."""
    global _BASE_TRI_INV
    prev = _BASE_TRI_INV
    _BASE_TRI_INV = fn
    return prev


def _tri_inv_lower(L):
    from stheno_tpu import config as _cfg

    return _cfg.active_override("base_tri_inv", _BASE_TRI_INV)(L)


import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def blocked_cholesky(A, block=1024, base=256, sym=False):
    """Lower Cholesky factor of PSD `A` (N×N, N a multiple of `base` ideally;
    any N works — falls back to lax for the ragged tail).

    `sym=True` factors 0.5·(A + Aᵀ) with the symmetrisation folded into the
    per-panel reads (each panel reads its mirror slab instead of a
    pre-materialised symmetric matrix) — saves the ~3·N² words of HBM
    traffic an explicit `symmetrize` pass costs at large N, and the
    backward is unchanged (the reverse rule already returns a symmetric
    gradient, which IS the correct pullback through 0.5·(A + Aᵀ)).

    Carries a custom VJP (the closed-form Cholesky reverse rule, Murray 2016)
    expressed with the *blocked* triangular solves below: the backward pass is
    two N-wide TRSMs on the MXU instead of autodiff through every unrolled
    panel — ~order-of-magnitude smaller graph and backward FLOPs that match
    lax's rule while keeping the fast forward.
    """
    return _blocked_cholesky_impl(A, block, base, sym)


def _blocked_cholesky_impl(A, block=1024, base=256, sym=False,
                           collect_invs=False):
    """When `collect_invs` (top level only), additionally returns the
    per-panel diagonal-block triangular inverses the forward computes for
    its TRSMs (plus the last panel's, computed for this purpose) —
    residuals the custom VJP hands to the backward so its via-inverse
    solves can reuse instead of recompute them (~16 serial tri-inv
    constructions saved at N=16k)."""
    n = A.shape[-1]
    if n <= base:
        if sym:
            A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        L = _active_base_chol()(A)
        return (L, None) if collect_invs else L
    # panel width: ≤ n/2 (so recursion strictly shrinks), multiple of 64 for
    # clean MXU tiling
    B = (min(block, n // 2) // 64) * 64
    if B == 0 or n % B != 0:
        # ragged: fall back (callers pad to MXU-friendly sizes for speed)
        if sym:
            A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        L = _lax_chol_lower(A)
        return (L, None) if collect_invs else L

    nb = n // B
    L = jnp.zeros_like(A)
    invs = []
    for kb in range(nb):
        c = kb * B
        # left-looking update of the current panel using finished columns
        A_panel = lax.dynamic_slice(A, (c, c), (n - c, B))
        if sym:
            mirror = lax.dynamic_slice(A, (c, c), (B, n - c))
            A_panel = 0.5 * (A_panel + mirror.T)
        if kb > 0:
            rows = lax.dynamic_slice(L, (c, 0), (n - c, c))
            top = lax.dynamic_slice(L, (c, 0), (B, c))
            A_panel = A_panel - _mm(rows, top.T)
        # factor the diagonal block (recursive, ends in lax at ≤ base;
        # already symmetrised above when sym)
        A11 = A_panel[:B]
        L11 = _blocked_cholesky_impl(A11, block=max(base, B // 4), base=base)
        out_panel = L11
        if n - c > B:
            A21 = A_panel[B:]
            # panel TRSM as a GEMM against the *blocked* triangular inverse:
            # the recursive 2-way-split inverse keeps all off-diagonal work on
            # the MXU (measured 7% faster end-to-end than XLA's TRSM-vs-I at
            # B=2048, N=16k)
            L11inv = blocked_tri_inv_lower(L11, base=base)
            L21 = _mm(A21, L11inv.T)
            out_panel = jnp.concatenate([L11, L21], axis=0)
        elif collect_invs:
            # last panel: no TRSM needs it, but the backward's solves do
            L11inv = blocked_tri_inv_lower(L11, base=base)
        if collect_invs:
            invs.append(L11inv)
        L = lax.dynamic_update_slice(L, out_panel, (c, c))
    if collect_invs:
        return L, jnp.stack(invs)  # (nb, B, B)
    return L


def _invs_reusable_by_bwd():
    """Whether the ACTIVE backward configuration can consume the forward's
    saved panel inverses at all.  'iter'/'rec' reuse them only inside their
    via-inverse solves (`_reuse_ok`); 'fused' slices them directly.  A
    backward-precision override differing from the forward GEMM precision
    also rules reuse out (the inverses were built at the forward precision
    — reusing them would silently cap the backward's diagonal-block solves;
    ADVICE r4).  Trace-time state, like every other tuning knob."""
    _, via_inv, mode, _ = _active_bwd_params()
    bp = _active_bwd_prec()
    if bp is not None and bp != _active_prec():
        return False
    return via_inv or mode == "fused"


def _blocked_cholesky_fwd(A, block, base, sym):
    # Skip the inverse stack (≈ nb·B² residual memory, ~64 MB at N=16k f32,
    # plus an extra last-panel tri-inv) when the active backward params make
    # reuse impossible (ADVICE r4).  Config-dependent tracing is the
    # documented contract of every knob here (see `config.snapshot`).
    if _invs_reusable_by_bwd():
        L, invs = _blocked_cholesky_impl(A, block, base, sym,
                                         collect_invs=True)
    else:
        L = _blocked_cholesky_impl(A, block, base, sym)
        invs = None
    return L, (L, invs)


def _phi(M):
    """Lower triangle with halved diagonal (the Cholesky-pullback projector)."""
    n = M.shape[-1]
    tril = jnp.tril(M)
    return tril - 0.5 * jnp.diagonal(M)[..., None] * jnp.eye(n, dtype=M.dtype)


def _tri_inv_lower_batched(L, bs):
    """Bottom-up batched construction of L⁻¹ for uniform power-of-2 layouts
    (n = 2^k · bs): ONE batched TRSM inverts every diagonal base block at
    once, then log2(n/bs) rounds of batched GEMMs assemble the pairwise
    combines

        inv([[A, 0], [B, C]]) = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]].

    The recursive 2-way split issues the same FLOPs as ~2·(n/bs) SERIAL
    small ops; on TPU (single compute stream, per-dispatch latency) the
    batched form collapses the critical path to 1 + 2·log2(n/bs)
    dispatches — this sits inside the forward's per-panel serial chain
    (measured ~7 ms of the N=16k forward, `perf_probe fwd_floor`)."""
    n = L.shape[-1]
    nb = n // bs
    idx = jnp.arange(nb)
    diag = L.reshape(nb, bs, nb, bs)[idx, :, idx, :]  # (nb, bs, bs)
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=L.dtype), (nb, bs, bs))
    invs = lax.linalg.triangular_solve(
        diag, eye, left_side=True, lower=True
    )
    s = bs
    while s < n:
        m = n // (2 * s)
        ar = jnp.arange(m)
        Z = L.reshape(m, 2 * s, m, 2 * s)[ar, :, ar, :]  # (m, 2s, 2s)
        Bs = Z[:, s:, :s]
        A = invs[0::2]
        C = invs[1::2]
        BL = -_mm(C, _mm(Bs, A))
        top = jnp.concatenate(
            [A, jnp.zeros((m, s, s), L.dtype)], axis=-1)
        bot = jnp.concatenate([BL, C], axis=-1)
        invs = jnp.concatenate([top, bot], axis=-2)  # (m, 2s, 2s)
        s *= 2
    return invs[0]


def blocked_tri_inv_lower(L, base=512):
    """Explicit inverse of a lower-triangular matrix by recursive 2-way
    splitting — all off-diagonal work is GEMMs:

        inv([[A, 0], [B, C]]) = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]]

    Uniform power-of-2 layouts take the batched bottom-up construction
    (`_tri_inv_lower_batched`) unless a custom base inverse is scoped in.
    """
    from stheno_tpu import config as _cfg

    n = L.shape[-1]
    if n <= base:
        return _tri_inv_lower(L)
    nb = n // base
    if (
        n % base == 0
        and nb & (nb - 1) == 0
        and _cfg.active_override("base_tri_inv", _BASE_TRI_INV)
        is _tri_inv_lower_xla
    ):
        return _tri_inv_lower_batched(L, base)
    h = ((n // 2) // 64) * 64
    if h == 0 or n - h <= 0:
        return _tri_inv_lower(L)
    A = L[:h, :h]
    B = L[h:, :h]
    C = L[h:, h:]
    Ai = blocked_tri_inv_lower(A, base=base)
    Ci = blocked_tri_inv_lower(C, base=base)
    BL = -_mm(Ci, _mm(B, Ai))
    top = jnp.concatenate([Ai, jnp.zeros((h, n - h), L.dtype)], axis=1)
    bot = jnp.concatenate([BL, Ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _chol_bwd_base(L, L_bar):
    """Closed-form small-block reverse rule: raw (lower-convention) gradient
    L⁻ᵀ Φ(Lᵀ L̄) L⁻¹ via two small TRSMs.

    Masks `tril(L̄)` HERE (a ≤base² pass) instead of the caller tril-ing the
    full N×N cotangent: Φ(Lᵀ L̄) only ever consumes tril(L̄) — (Lᵀ L̄)[i,j]
    with j ≤ i sums L[k,i]·L̄[k,j] over k ≥ i ≥ j, all lower entries — and
    every other read of the cotangent in the blocked reverse rules is a
    strictly-lower block.  The upfront `jnp.tril(L_bar)` was a full-matrix
    materialisation (~2 GB of HBM traffic at N=16k, ~2.4 ms device)."""
    P = _phi(_mm(L.T, jnp.tril(L_bar)))
    W = lax.linalg.triangular_solve(
        L, P, left_side=True, lower=True, transpose_a=True
    )  # L⁻ᵀ P
    # W L⁻¹ = (L⁻ᵀ Wᵀ)ᵀ
    K_raw = lax.linalg.triangular_solve(
        L, W.T, left_side=True, lower=True, transpose_a=True
    ).T
    return K_raw


#: Backward-pass tuning knobs (trace-time state, like _PREC): recursion
#: cutoff for the blocked reverse rule, whether the diagonal blocks of
#: its backward TRSM are applied via explicit triangular inverses (GEMMs)
#: or XLA's sequential TRSM, and which reverse algorithm runs ('iter' =
#: panel sweep with symmetric trailing gradient, 'rec' = recursive 2-way
#: split).  `set_bwd_params` for perf probes / tuning.
_BWD_BASE = 256
_BWD_VIA_INV = True
_BWD_MODE = "iter"
# fwd+bwd probe at N=16k f32, healthy-relay windows (round 3):
# bwd block 1024 → 258.9 ms, 2048 → 153.5, 4096 → 138.5 — the round-2
# "panel width insensitive" reading did not hold up on re-measurement
_BWD_BLOCK = 4096


def set_bwd_params(base=None, via_inv=None, mode=None, block=None):
    """Tune the process-wide default custom-VJP backward (returns previous
    (base, via_inv, mode, block)).  DEPRECATED: prefer the scoped
    ``with stheno_tpu.config.bwd_params(...): ...``."""
    global _BWD_BASE, _BWD_VIA_INV, _BWD_MODE, _BWD_BLOCK
    prev = (_BWD_BASE, _BWD_VIA_INV, _BWD_MODE, _BWD_BLOCK)
    if base is not None:
        _BWD_BASE = base
    if via_inv is not None:
        _BWD_VIA_INV = via_inv
    if mode is not None:
        _BWD_MODE = mode
    if block is not None:
        _BWD_BLOCK = block
    return prev


def _active_bwd_params():
    """(base, via_inv, mode, block) with scoped overrides applied."""
    from stheno_tpu import config as _cfg

    return (
        _cfg.active_override("bwd_base", _BWD_BASE),
        _cfg.active_override("bwd_via_inv", _BWD_VIA_INV),
        _cfg.active_override("bwd_mode", _BWD_MODE),
        _cfg.active_override("bwd_block", _BWD_BLOCK),
    )


def _chol_bwd_rec(L, L_bar, base, invs=None, g0=0):
    """Recursive blocked reverse rule for L = chol(K) (lower-triangular
    gradient convention; symmetrised by the caller).

    Reverse of the 2×2 factorisation
        L11 = chol(K11);  L21 = K21 L11⁻ᵀ;  L22 = chol(K22 − L21 L21ᵀ)
    — every level is a handful of GEMMs + half-size recursions, so the total
    backward cost is ~2× the forward factorisation, all on the MXU (no
    full-size triangular inverse, no N-wide sequential TRSM).

    `invs`/`g0`: the forward's saved panel inverses and this sub-matrix's
    global diagonal offset — aligned solve granularities slice their
    diagonal-block inverses out of `invs` (see `_inv_block`) instead of
    rebuilding them.
    """
    n = L.shape[-1]
    if n <= base:
        return _chol_bwd_base(L, L_bar)
    h = ((n // 2) // 64) * 64
    if h == 0:
        return _chol_bwd_base(L, L_bar)

    L11, L21, L22 = L[:h, :h], L[h:, :h], L[h:, h:]
    Lb11, Lb21, Lb22 = L_bar[:h, :h], L_bar[h:, :h], L_bar[h:, h:]

    # reverse of L22 = chol(Schur): S22 is the raw gradient wrt the Schur
    # complement, which feeds both K̄22 and the L21 cotangent.
    S22 = _chol_bwd_rec(L22, Lb22, base, invs=invs, g0=g0 + h)
    Lb21_eff = Lb21 - _mm(S22 + S22.T, L21)

    # reverse of L21 = K21 L11⁻ᵀ:
    #   K̄21 = L̄21 L11⁻¹   (right-solve, blocked: GEMMs + small TRSMs)
    #   L̄11 += −K̄21ᵀ L21
    bs = max(base, h // 4)
    if _reuse_ok(invs, bs, g0) and h % bs == 0:
        K21_bar = _solve_upper_T_reuse(L11, Lb21_eff.T, bs, invs, g0).T
    else:
        K21_bar = blocked_solve_upper_T(
            L11, Lb21_eff.T, block=bs,
            via_inv=_active_bwd_params()[1],
        ).T
    Lb11_eff = Lb11 - _mm(K21_bar.T, L21)

    S11 = _chol_bwd_rec(L11, Lb11_eff, base, invs=invs, g0=g0)

    top = jnp.concatenate([S11, jnp.zeros((h, n - h), L.dtype)], axis=1)
    bot = jnp.concatenate([K21_bar, S22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _inv_block(invs, g, s):
    """The saved inverse of the diagonal block [g:g+s) of the globally
    factored matrix.  For lower-triangular L, the aligned diagonal
    sub-blocks of L⁻¹ ARE the inverses of L's corresponding diagonal
    sub-blocks, so any s ≤ Bf with s | Bf and s | g slices straight out
    of the forward's (nb_f, Bf, Bf) panel-inverse stack."""
    Bf = invs.shape[-1]
    r = g % Bf
    return invs[g // Bf][r : r + s, r : r + s]


def _reuse_ok(invs, bs, g0):
    return (
        invs is not None
        and _active_bwd_params()[1]  # via_inv=False: keep the TRSM path
        and bs <= invs.shape[-1]
        and invs.shape[-1] % bs == 0
        and g0 % bs == 0
    )


def _solve_upper_T_reuse(L11, b, bs, invs, c_global):
    """Blocked backward substitution Lᵀx = b with every diagonal-block
    application a GEMM against the FORWARD's saved triangular inverses
    (via `_inv_block`; L11 sits at global offset `c_global`).  Only
    called when `_reuse_ok` holds and bs | L11 size; runs inside the
    custom-VJP backward, so no AD passes through it."""
    n = L11.shape[-1]
    nb = n // bs
    x = jnp.zeros_like(b)
    for kb in reversed(range(nb)):
        cc = kb * bs
        rhs = b[cc : cc + bs]
        if kb < nb - 1:
            col = L11[cc + bs :, cc : cc + bs]
            rhs = rhs - _mm(col.T, x[cc + bs :])
        xk = _mm(_inv_block(invs, c_global + cc, bs).T, rhs)
        x = lax.dynamic_update_slice(x, xk, (cc, 0))
    return x


def _chol_bwd_iter(L, L_bar, block, base, invs=None):
    """Iterative panel-sweep reverse rule; returns the SYMMETRIC gradient.

    Reverses the right-looking factorisation panel by panel, last to first,

        L11 = chol(K11);   L21 = K21 L11⁻ᵀ;   K22 ← K22 − L21 L21ᵀ

    maintaining `S` = symmetric gradient w.r.t. the current trailing Schur
    complement.  Per panel the dominant op is ONE square×panel GEMM

        L̄21 ← L̄21 − 2·S22 @ L21            (m×m @ m×B)

    so the total multiply-add count is Σₖ mₖ²·B ≈ n³/3 — half the recursive
    2-way split rule's ~2n³/3, with MXU-friendlier (square × B-panel) shapes.
    The per-panel solve and the B×B base reverses are lower-order terms.
    """
    n = L.shape[-1]
    B = (min(block, n) // 64) * 64
    if B == 0 or n % B != 0 or n <= B:
        K_raw = _chol_bwd_rec(L, L_bar, base, invs=invs, g0=0)
        return 0.5 * (K_raw + K_raw.T)
    nb = n // B
    # The trailing gradient is carried *functionally* as a growing dense
    # block (assembled by concatenation), NOT written into a full-size
    # buffer with dynamic_update_slice: in large fused graphs the XLA TPU
    # compiler fails to alias those updates in place and copies the whole
    # n×n buffer per write (~50 GB of HBM traffic at n=16k — measured 505 ms
    # vs 291 ms end-to-end).  Concatenation copies only Σₖ mₖ² ≈ n³/3B
    # elements total (~6 GB at n=16k, B=1024).
    S_trail = None  # (m, m) symmetric gradient of the trailing Schur block
    for kb in reversed(range(nb)):
        c = kb * B
        m = n - c - B  # trailing size below this panel
        L11 = L[c : c + B, c : c + B]
        Lb11 = L_bar[c : c + B, c : c + B]
        if m > 0:
            L21 = L[c + B :, c : c + B]
            Lb21 = L_bar[c + B :, c : c + B]
            # reverse of the Schur update K22 ← K22 − L21 L21ᵀ
            Lb21_eff = Lb21 - 2.0 * _mm(S_trail, L21)
            # reverse of L21 = K21 L11⁻ᵀ:  K̄21 = L̄21 L11⁻¹ (raw convention)
            bs = max(base, B // 4)
            if _reuse_ok(invs, bs, c) and B % bs == 0:
                # reuse the forward's saved diagonal-block inverses (same
                # blocks, same values — skips nb_f serial tri-inv builds)
                A21_bar = _solve_upper_T_reuse(
                    L11, Lb21_eff.T, bs, invs, c
                ).T
            else:
                A21_bar = blocked_solve_upper_T(
                    L11, Lb21_eff.T, block=bs,
                    via_inv=_active_bwd_params()[1],
                ).T
            Lb11_eff = Lb11 - _mm(A21_bar.T, L21)
        else:
            Lb11_eff = Lb11
        S11_raw = _chol_bwd_rec(L11, Lb11_eff, base, invs=invs, g0=c)
        S11 = 0.5 * (S11_raw + S11_raw.T)
        if m > 0:
            # symmetric convention halves the off-diagonal raw gradient
            top = jnp.concatenate([S11, 0.5 * A21_bar.T], axis=1)
            bot = jnp.concatenate([0.5 * A21_bar, S_trail], axis=1)
            S_trail = jnp.concatenate([top, bot], axis=0)
        else:
            S_trail = S11
    return S_trail


def _chol_bwd_fused(L, L_bar, block, base, invs=None):
    """Fused panel-sweep reverse rule; returns the SYMMETRIC gradient.

    Same sweep as `_chol_bwd_iter` but with the per-panel sequential blocked
    solve eliminated (round-3 closing analysis, BASELINE.md: the iter mode's
    `blocked_solve_upper_T` + `K̄21ᵀL21` terms ran the backward at ~55-70%
    of MXU peak vs the forward's ~94%).  Two algebraic fusions:

    1. The `K̄21ᵀ L21` correction to L̄11 collapses *inside* the Φ argument:
       with K̄21 = L̄21_eff L11⁻¹,

           L11ᵀ (K̄21ᵀ L21) = L11ᵀ L11⁻ᵀ L̄21_effᵀ L21 = L̄21_effᵀ L21,

       so Φ(L11ᵀ L̄11_eff) = Φ(L11ᵀ L̄11 − L̄21_effᵀ L21) — one B×m@m×B
       GEMM instead of forming K̄21ᵀL21 after the solve.
    2. The panel reverse's closed form S11_raw = L11⁻ᵀ Φ(·) L11⁻¹ and the
       cotangent solve K̄21 = L̄21_eff L11⁻¹ share the right-factor L11⁻¹:
       stacking [L11⁻ᵀΦ(·); L̄21_eff] gives ONE (B+m)-tall GEMM against the
       precomputed blocked triangular inverse — a dense MXU matmul in place
       of the sequential substitution.

    Per-panel multiply-adds: m²B (trailing GEMM, unchanged) + mB² (fusion 1)
    + (m+B)B² (fusion 2) + ~2.3B³ (B×B GEMMs + inverse); totals ≈1.65e12 at
    n=16k/B=1024 vs iter@4096's ≈1.9e12 — and every op is a large
    static-shape GEMM.
    """
    n = L.shape[-1]
    B = (min(block, n) // 64) * 64
    if B == 0 or n % B != 0 or n <= B:
        K_raw = _chol_bwd_rec(L, L_bar, base, invs=invs, g0=0)
        return 0.5 * (K_raw + K_raw.T)
    nb = n // B
    # trailing gradient assembled by concatenation, not dynamic_update_slice
    # (same HBM-aliasing argument as _chol_bwd_iter)
    S_trail = None
    for kb in reversed(range(nb)):
        c = kb * B
        m = n - c - B
        L11 = L[c : c + B, c : c + B]
        Lb11 = L_bar[c : c + B, c : c + B]
        if invs is not None and invs.shape[-1] == B:
            L11inv = invs[kb]  # the forward's saved panel inverse
        else:
            L11inv = blocked_tri_inv_lower(L11, base=base)
        # tril fold (see _chol_bwd_base): the diagonal block is the only
        # place the cotangent's upper triangle could leak in at this level
        G = _mm(L11.T, jnp.tril(Lb11))
        if m > 0:
            L21 = L[c + B :, c : c + B]
            Lb21 = L_bar[c + B :, c : c + B]
            # reverse of the Schur update K22 ← K22 − L21 L21ᵀ
            Lb21_eff = Lb21 - 2.0 * _mm(S_trail, L21)
            G = G - _mm(Lb21_eff.T, L21)  # fusion 1
        W = _mm(L11inv.T, _phi(G))
        if m > 0:
            ZG = _mm(jnp.concatenate([W, Lb21_eff], axis=0), L11inv)  # fusion 2
            S11_raw, A21_bar = ZG[:B], ZG[B:]
        else:
            S11_raw = _mm(W, L11inv)
        S11 = 0.5 * (S11_raw + S11_raw.T)
        if m > 0:
            # symmetric convention halves the off-diagonal raw gradient
            top = jnp.concatenate([S11, 0.5 * A21_bar.T], axis=1)
            bot = jnp.concatenate([0.5 * A21_bar, S_trail], axis=1)
            S_trail = jnp.concatenate([top, bot], axis=0)
        else:
            S_trail = S11
    return S_trail


#: Optional MXU precision override for the Cholesky BACKWARD pass only
#: (None → follow the forward `_PREC`).  WARNING — measured at N=16k f32:
#: 'default' (bf16 1-pass) saves ~37 ms but the 2^-8 GEMM error is
#: amplified unboundedly by the α αᵀ − K⁻¹ cancellation structure of K̄
#: (hyperparameter gradients came out 56× wrong; BASELINE.md negative
#: result #3).  Keep None/HIGH unless the consumer is provably
#: cancellation-free.
_BWD_PREC = None


def set_bwd_precision(p):
    """Set the process-wide default backward-pass GEMM precision
    ('default'|'high'|'highest'| a lax.Precision|None to follow the
    forward).  Trace-time state; returns the previous value.
    DEPRECATED: prefer the scoped
    ``with stheno_tpu.config.bwd_precision(p): ...``."""
    global _BWD_PREC
    prev = _BWD_PREC
    if isinstance(p, str):
        p = lax.Precision[p.upper()]
    _BWD_PREC = p
    return prev


def _active_bwd_prec():
    from stheno_tpu import config as _cfg

    return _cfg.active_override("bwd_precision", _BWD_PREC)


def _blocked_cholesky_bwd(block, base, sym, res, L_bar):
    """Blocked reverse rule; returns the symmetrised gradient.  For
    sym=False this matches the historical contract (upstream K is
    symmetric, so only sym(K̄) matters); for sym=True it IS the exact
    pullback: d/dA of chol(0.5·(A+Aᵀ)) applied to the symmetric S is
    0.5·(S + Sᵀ) = S.

    Residuals carry the forward's diagonal-block triangular inverses;
    when the backward's solve granularity aligns with them they are
    reused (identical blocks, identical values) instead of rebuilt."""
    from stheno_tpu import config as _cfg

    L, invs = res
    # the output's strict upper triangle is structurally zero: ignore any
    # cotangent that lands there
    bwd_base, _, mode, bwd_block = _active_bwd_params()
    # the backward recursion cutoff is its own knob, independent of the
    # forward's base (bwd base=256 optimal; round-3 ladder)
    eff_base = bwd_base
    # scope the backward-precision override over this trace (the whole
    # reverse rule, including its internal blocked solves, traces inside
    # this Python call, so a thread-local scoped override is exact scoping)
    bp = _active_bwd_prec()
    if bp is not None and bp != _active_prec():
        # the saved inverses were built at the FORWARD GEMM precision;
        # reusing them under a different backward precision would silently
        # cap the backward's diagonal-block solves (ADVICE r4) — rebuild
        # them under the backward scope instead
        invs = None
    # NOTE: no full-matrix jnp.tril(L_bar) here — the reverse rules only
    # read strictly-lower blocks of the cotangent, and the diagonal blocks
    # are tril-masked at the point of use (_chol_bwd_base / fused G build),
    # saving an N²-class materialisation pass (round 5).
    with _cfg.scoped(**({"gemm_precision": bp} if bp is not None else {})):
        if mode == "fused":
            out = _chol_bwd_fused(L, L_bar, bwd_block, eff_base,
                                  invs=invs)
        elif mode == "iter":
            out = _chol_bwd_iter(L, L_bar, bwd_block, eff_base,
                                 invs=invs)
        else:
            K_raw = _chol_bwd_rec(L, L_bar, base=eff_base,
                                  invs=invs, g0=0)
            out = 0.5 * (K_raw + K_raw.T)
    return (out,)


blocked_cholesky.defvjp(_blocked_cholesky_fwd, _blocked_cholesky_bwd)


def blocked_lauum(M, block=1024):
    """S = Mᵀ M for *lower-triangular* M, blocked so only ~n³/6 multiply-adds
    run (LAPACK LAUUM's job, restructured as one GEMM per panel):

        per panel J (c = J·B):  colJ = M[c:, :c+B]ᵀ @ M[c:, c:c+B]

    gives the upper-triangle block column (c+B, B); the strict-upper parts
    are mirrored, diagonal blocks written once.  Used to form K⁻¹ = L⁻ᵀ L⁻¹
    from the triangular inverse in the fused logpdf backward.
    """
    n = M.shape[-1]
    B = min(block, n)
    if n % B != 0:
        return _mm(M.T, M)
    nb = n // B
    SU = jnp.zeros_like(M)  # strict-upper block columns
    D = jnp.zeros_like(M)  # block diagonal
    for J in range(nb):
        c = J * B
        rows = lax.dynamic_slice(M, (c, 0), (n - c, c + B))
        panel = lax.dynamic_slice(M, (c, c), (n - c, B))
        col = _mm(rows.T, panel)  # (c+B, B)
        if c > 0:
            SU = lax.dynamic_update_slice(SU, col[:c], (0, c))
        D = lax.dynamic_update_slice(D, col[c:], (c, c))
    return SU + SU.T + D


def _blocked_solve_lower_impl(L, b, block=1024):
    """Solve L x = b (b: (N,) or (N, K)) by blocked forward substitution;
    the off-diagonal applications are GEMMs."""
    n = L.shape[-1]
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    B = min(block, n)
    if n % B != 0:
        x = lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
        return x[:, 0] if vec else x
    nb = n // B
    x = jnp.zeros_like(b)
    for kb in range(nb):
        c = kb * B
        rhs = lax.dynamic_slice(b, (c, 0), (B, b.shape[1]))
        if kb > 0:
            row = lax.dynamic_slice(L, (c, 0), (B, c))
            xdone = x[:c]
            rhs = rhs - _mm(row, xdone)
        Lkk = lax.dynamic_slice(L, (c, c), (B, B))
        xk = lax.linalg.triangular_solve(Lkk, rhs, left_side=True, lower=True)
        x = lax.dynamic_update_slice(x, xk, (c, 0))
    return x[:, 0] if vec else x


def _blocked_solve_upper_T_impl(L, b, block=1024, via_inv=False):
    """Solve Lᵀ x = b by blocked backward substitution (L lower).

    `via_inv=True` applies each B×B diagonal block as a GEMM against its
    explicit blocked triangular inverse instead of XLA's sequential TRSM —
    worthwhile when the RHS is wide (the Cholesky backward), where the
    O(B³/3) inverse is amortised over an O(B²·K) MXU matmul.
    """
    n = L.shape[-1]
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    B = min(block, n)
    if n % B != 0:
        x = lax.linalg.triangular_solve(
            L, b, left_side=True, lower=True, transpose_a=True
        )
        return x[:, 0] if vec else x
    nb = n // B
    x = jnp.zeros_like(b)
    for kb in reversed(range(nb)):
        c = kb * B
        rhs = lax.dynamic_slice(b, (c, 0), (B, b.shape[1]))
        if kb < nb - 1:
            col = lax.dynamic_slice(L, (c + B, c), (n - c - B, B))
            xdone = x[c + B :]
            rhs = rhs - _mm(col.T, xdone)
        Lkk = lax.dynamic_slice(L, (c, c), (B, B))
        if via_inv:
            xk = _mm(blocked_tri_inv_lower(Lkk, base=256).T, rhs)
        else:
            xk = lax.linalg.triangular_solve(
                Lkk, rhs, left_side=True, lower=True, transpose_a=True
            )
        x = lax.dynamic_update_slice(x, xk, (c, 0))
    return x[:, 0] if vec else x


# ---------------------------------------------------------------------------
# Closed-form triangular-solve adjoints
# ---------------------------------------------------------------------------
# Autodiff through the blocked substitution loops is catastrophically
# memory-bound: every one of the N/B iterations accumulates cotangents into
# full N×N dynamic_update_slice buffers (~2 GB of HBM traffic each at
# N=16k).  The mathematical adjoint of a triangular solve is just one more
# (transposed) solve plus a rank-K outer product:
#
#   x = L⁻¹ b:    b̄ = L⁻ᵀ ḡ,  L̄ = −tril(b̄ xᵀ)
#   x = L⁻ᵀ b:    b̄ = L⁻¹ ḡ,  L̄ = −tril(x b̄ᵀ)
#
# so the backward costs the same O(N²·K) as the forward.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bsl_vjp(L, b, block):
    return _blocked_solve_lower_impl(L, b, block)


def _bsl_fwd(L, b, block):
    x = _blocked_solve_lower_impl(L, b, block)
    return x, (L, x)


def _bsl_bwd(block, res, g):
    L, x = res
    bbar = _blocked_solve_upper_T_impl(L, g, block)
    if x.ndim == 1:
        Lbar = -jnp.tril(jnp.outer(bbar, x))
    else:
        Lbar = -jnp.tril(_mm(bbar, x.T))
    return (Lbar, bbar)


_bsl_vjp.defvjp(_bsl_fwd, _bsl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _bsut_vjp(L, b, block, via_inv):
    return _blocked_solve_upper_T_impl(L, b, block, via_inv)


def _bsut_fwd(L, b, block, via_inv):
    x = _blocked_solve_upper_T_impl(L, b, block, via_inv)
    return x, (L, x)


def _bsut_bwd(block, via_inv, res, g):
    L, x = res
    bbar = _blocked_solve_lower_impl(L, g, block)
    if x.ndim == 1:
        Lbar = -jnp.tril(jnp.outer(x, bbar))
    else:
        Lbar = -jnp.tril(_mm(x, bbar.T))
    return (Lbar, bbar)


_bsut_vjp.defvjp(_bsut_fwd, _bsut_bwd)


# ---------------------------------------------------------------------------
# Ragged-N padding
# ---------------------------------------------------------------------------
# The blocked kernels require N divisible by the panel width; historically a
# ragged N silently fell back to the un-blocked lax path (~4× slower at
# N≈16k, plus its autodiff backward — VERDICT r3 weak-item 4).  Instead,
# identity-extend to the next panel multiple and slice the result back:
#
#     chol([[A, 0], [0, I]]) = [[chol(A), 0], [0, I]]
#     [[L, 0], [0, I]] [x; xp] = [b; 0]  ⇒  x = L⁻¹b, xp = 0
#
# The pad/slice wrappers live OUTSIDE the custom-VJP functions, so autodiff
# through them is the native (exact) concat/slice transpose and the custom
# reverse rules always see panel-divisible shapes.


def _padded_n(n, block):
    """Next multiple of `block` at or above n (only called when n > block)."""
    return -(-n // block) * block


def _pad_identity(A, np_):
    """[[A, 0], [0, I]] of size np_."""
    n = A.shape[-1]
    p = np_ - n
    z = jnp.zeros((n, p), A.dtype)
    eye = jnp.eye(p, dtype=A.dtype)
    top = jnp.concatenate([A, z], axis=1)
    bot = jnp.concatenate([z.T, eye], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _pad_rows(b, np_):
    n = b.shape[0]
    pad = [(0, np_ - n)] + [(0, 0)] * (b.ndim - 1)
    return jnp.pad(b, pad)


def cholesky_blocked_padded(A, block=1024, base=256, sym=False):
    """`blocked_cholesky` for ANY n: ragged sizes above `block` are
    identity-padded to the next panel multiple (never the silent lax
    fallback); sizes ≤ `block` go straight through (the base/lax small-case
    path is already cheap there)."""
    n = A.shape[-1]
    if n > block and n % block != 0:
        np_ = _padded_n(n, block)
        Lp = blocked_cholesky(_pad_identity(A, np_), block, base, sym)
        return Lp[:n, :n]
    return blocked_cholesky(A, block, base, sym)


def blocked_solve_lower(L, b, block=1024):
    """Solve L x = b (blocked forward substitution) with the closed-form
    O(N²) adjoint above.  Ragged n > block is identity-padded to the next
    block multiple (see module note), never the sequential lax fallback.

    Reverse-mode only: the ``jax.custom_vjp`` wrapper makes ``jvp``/
    ``jacfwd``/forward-over-reverse HVPs raise.  Use
    ``_blocked_solve_lower_impl`` directly if you need forward-mode and can
    accept the (memory-bound) autodiff-through-loop derivatives."""
    n = L.shape[-1]
    if n > block and n % block != 0:
        np_ = _padded_n(n, block)
        x = _bsl_vjp(_pad_identity(L, np_), _pad_rows(b, np_), block)
        return x[:n]
    return _bsl_vjp(L, b, block)


def blocked_solve_upper_T(L, b, block=1024, via_inv=False):
    """Solve Lᵀ x = b (blocked backward substitution, L lower) with the
    closed-form O(N²) adjoint above.  Ragged n > block is identity-padded
    (see `blocked_solve_lower`).

    Reverse-mode only (see `blocked_solve_lower`)."""
    n = L.shape[-1]
    if n > block and n % block != 0:
        np_ = _padded_n(n, block)
        x = _bsut_vjp(_pad_identity(L, np_), _pad_rows(b, np_), block, via_inv)
        return x[:n]
    return _bsut_vjp(L, b, block, via_inv)
