"""Cholesky / triangular-solve / MvNormal-logpdf ops — the O(N^3) hot path.

These wrap XLA's native TPU lowerings (blocked Cholesky + blocked TRSM) behind
a stable interface so the Pallas / distributed implementations can be swapped
in without touching the inference layer:

- `cholesky_psd(K, jitter)` — symmetrise + jitter + `lax.linalg.cholesky`.
- `solve_lower/upper`       — `lax.linalg.triangular_solve`.
- `mvn_logpdf_chol`         — the MvNormal logpdf given a precomputed factor.

Replicates the behavioral dependency on AbstractGPs.jl's dense inference path
(`logpdf(fx, y)` = MvNormal logpdf via `cholesky(cov(fx))`; see SURVEY.md §3.2
and reference README.md:73-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def symmetrize(K):
    return 0.5 * (K + jnp.swapaxes(K, -1, -2))


# ---------------------------------------------------------------------------
# Trace-time factorisation-size recording
# ---------------------------------------------------------------------------
# Lets policy code (e.g. the NUTS `precision='auto'` rule, inference/hmc.py)
# discover what a black-box log-density actually factorises: run
# `jax.eval_shape(logdensity, q)` inside `record_chol_sizes()` and every
# Cholesky the trace hits reports its (N, dtype).  Thread-local, nestable,
# zero cost when inactive.

import threading as _threading
from contextlib import contextmanager as _contextmanager

_rec_tls = _threading.local()


@_contextmanager
def record_chol_sizes():
    """Collect the (N, dtype) of every Cholesky traced in this block."""
    prev = getattr(_rec_tls, "sizes", None)
    _rec_tls.sizes = sizes = []
    try:
        yield sizes
    finally:
        _rec_tls.sizes = prev


def _record_n(n, dtype):
    sizes = getattr(_rec_tls, "sizes", None)
    if sizes is not None:
        sizes.append((int(n), jnp.dtype(dtype)))


def add_jitter(K, jitter):
    n = K.shape[-1]
    return K + jitter * jnp.eye(n, dtype=K.dtype)


#: Cholesky backend: 'auto' routes large single matrices on TPU to the
#: blocked MXU factorisation (ops.blocked_cholesky — ~19× faster than XLA's
#: built-in at N=16k f32), everything else to lax.  Set to 'lax' / 'blocked'
#: to force.
CHOL_BACKEND = "auto"

#: Minimum N for the blocked path under 'auto'.
_BLOCKED_MIN_N = 4096


def _use_blocked(K):
    from stheno_tpu import config as _cfg

    backend = _cfg.active_override("chol_backend", CHOL_BACKEND)
    if backend == "blocked":
        return K.ndim == 2
    if backend == "lax":
        return False
    return (
        K.ndim == 2
        and K.shape[-1] >= _BLOCKED_MIN_N
        and jax.default_backend() == "tpu"
    )


def cholesky_psd(K, jitter=None):
    """Lower Cholesky factor of a (batched) PSD matrix, symmetrised first.

    The reference symmetrises with `Symmetric(K)` before `cholesky`
    (AbstractGPs path, SURVEY.md §3.2); we do the same to wash out
    antisymmetric floating-point noise from block assembly.  `jitter` may be
    a traced scalar (jit-safe).
    """
    _record_n(K.shape[-1], K.dtype)
    if _use_blocked(K):
        from stheno_tpu.ops.blocked_cholesky import cholesky_blocked_padded

        # block=1024 measured fastest at N=16k on v5e (67.6 ms vs 73.7 @2048,
        # 90.5 @4096 — scripts/perf_probe.py): panels stay VMEM-resident
        # while the trailing GEMM still saturates the MXU.  base stays 256:
        # base=1024 (whole diagonal block via one lax call) is 3 ms faster
        # but a measured ACCURACY regression — XLA's TPU cholesky runs its
        # internal matmuls at low precision, and at 1024-blocks that made
        # the N=4096 f32 logpdf 6× less accurate (13.5 vs 2.0 abs err) and
        # wrecked NUTS adaptation (R̂ 2.2, 2.8% divergences; BASELINE.md
        # round-4 negative result #5).
        #
        # LOWER-TRIANGLE semantics, no symmetrisation (round 5): the
        # blocked factorisation reads only lower column slabs and its base
        # case ignores block-upper content, so the factor depends on
        # tril(K) alone — exactly the reference's `cholesky(Symmetric(K))`
        # (Julia's Symmetric wraps ONE triangle; it never averages).  Both
        # explicit 0.5·(K+Kᵀ) and the round-4 sym=True mirrored-panel fold
        # are measured losses (fold: +5 ms at N=16k, +211 ms at N=32k —
        # the per-panel mirror row-slab transpose defeats XLA's layout;
        # BASELINE.md round 5).  For symmetric-to-fp-noise inputs (every
        # covariance this library builds) the semantics agree to ~1e-7
        # relative; the custom VJP already returns the symmetric gradient
        # either way.  Ragged N is identity-padded to the next panel
        # multiple (no silent lax cliff).
        if jitter is not None:
            K = add_jitter(K, jnp.asarray(jitter, dtype=K.dtype))
        return cholesky_blocked_padded(K, block=1024, base=256)
    K = symmetrize(K)
    if jitter is not None:
        K = add_jitter(K, jnp.asarray(jitter, dtype=K.dtype))
    return lax.linalg.cholesky(K)


def solve_lower(L, b, trans=False):
    """Solve L x = b (or L^T x = b when trans) with L lower triangular.

    Large single-matrix solves on TPU route through the *blocked*
    substitution (ops.blocked_cholesky): XLA's built-in TRSM is a
    sequential narrow-RHS sweep that leaves the chip idle at N ≳ 10⁴,
    while the blocked version is N/B short TRSMs stitched by MXU GEMMs —
    and being pure jnp, its autodiff VJP inherits the same structure
    (the lax TRSM VJP re-issues sequential TRSMs)."""
    if _use_blocked(L):
        from stheno_tpu.ops.blocked_cholesky import (
            blocked_solve_lower,
            blocked_solve_upper_T,
        )

        if trans:
            return blocked_solve_upper_T(L, b, block=1024)
        return blocked_solve_lower(L, b, block=1024)
    b2 = b[..., None] if b.ndim == L.ndim - 1 else b
    out = lax.linalg.triangular_solve(
        L, b2, left_side=True, lower=True, transpose_a=trans
    )
    return out[..., 0] if b.ndim == L.ndim - 1 else out


def solve_upper(U, b, trans=False):
    b2 = b[..., None] if b.ndim == U.ndim - 1 else b
    out = lax.linalg.triangular_solve(
        U, b2, left_side=True, lower=False, transpose_a=trans
    )
    return out[..., 0] if b.ndim == U.ndim - 1 else out


def chol_solve(L, b):
    """(L L^T)^{-1} b given the lower factor L."""
    return solve_lower(L, solve_lower(L, b), trans=True)


def chol_logdet(L):
    """log det (L L^T) = 2 sum log diag L."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(d), axis=-1)


def mvn_logpdf_chol(y, mean, L):
    """log N(y; mean, L L^T).  `y` may be (N,) or (N, S) for S iid samples.

    -1/2 [ N log 2π + logdet + (y-m)^T (LL^T)^{-1} (y-m) ]
    """
    n = L.shape[-1]
    diff = y - (mean[..., None] if y.ndim == mean.ndim + 1 else mean)
    alpha = solve_lower(L, diff)
    quad = jnp.sum(alpha * alpha, axis=-2 if y.ndim > mean.ndim else -1)
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype=L.dtype)
    return -0.5 * (n * jnp.log(two_pi) + chol_logdet(L) + quad)


# ---------------------------------------------------------------------------
# Fused MvNormal logpdf with a closed-form K-gradient
# ---------------------------------------------------------------------------

#: 'auto' uses the fused custom-VJP logpdf wherever the blocked Cholesky
#: would be used (large single matrix on TPU); 'on'/'off' force.
#: Default 'off': measured at N=16k f32 on v5e, the fused path is *slower*
#: than blocked-Cholesky-VJP + triangular solves (301.5 ms vs 262.4 ms
#: steady, bench.py host-pull methodology) and its graph takes 11 min to
#: compile through the remote relay (vs minutes) — the explicit K⁻¹
#: (tri-inv + LAUUM) GEMMs don't reach the efficiency the FLOP count
#: promises.  Kept as an opt-in ('auto'/'on') research path; numerics are
#: covered by tests/test_ops.py::test_fused_logpdf_matches_unfused.
LOGPDF_FUSED = "off"


@jax.custom_vjp
def _mvn_logpdf_fused(K, diff):
    """log N(diff; 0, K) for symmetric PSD K, with the closed-form gradient

        ∂logpdf/∂K = ½ (α αᵀ − K⁻¹),   α = K⁻¹ diff

    instead of autodiff through the factorisation.  The backward builds K⁻¹
    as L⁻ᵀL⁻¹ via the blocked triangular inverse (n³/3 multiply-adds) plus a
    blocked LAUUM (n³/6) — ~half the FLOPs of the Cholesky-VJP chain
    (tri-solve-based reverse rule ≈ 2× forward), and all of it MXU GEMMs.

    Replaces the reference's Zygote pullback through AbstractGPs' logpdf
    (SURVEY.md §3.2 gradient path).
    """
    val, _, _ = _mvn_logpdf_fused_fwd_impl(K, diff)
    return val


def _chol_dispatch(K):
    _record_n(K.shape[-1], K.dtype)
    if _use_blocked(K):
        from stheno_tpu.ops.blocked_cholesky import cholesky_blocked_padded

        return cholesky_blocked_padded(K, 1024, 256)
    return lax.linalg.cholesky(K)


def _mvn_logpdf_fused_fwd_impl(K, diff):
    from stheno_tpu.ops.blocked_cholesky import blocked_solve_lower

    n = K.shape[-1]
    L = _chol_dispatch(K)
    z = blocked_solve_lower(L, diff)
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype=L.dtype)
    val = -0.5 * (n * jnp.log(two_pi) + chol_logdet(L) + jnp.vdot(z, z))
    return val, L, z


def _mvn_logpdf_fused_fwd(K, diff):
    val, L, z = _mvn_logpdf_fused_fwd_impl(K, diff)
    return val, (L, z)


def _mvn_logpdf_fused_bwd(res, g):
    from stheno_tpu.ops.blocked_cholesky import (
        blocked_lauum,
        blocked_solve_upper_T,
        blocked_tri_inv_lower,
    )

    L, z = res
    alpha = blocked_solve_upper_T(L, z)  # K⁻¹ diff
    M = blocked_tri_inv_lower(L, base=256)
    K_inv = blocked_lauum(M)  # L⁻ᵀ L⁻¹
    K_bar = (0.5 * g) * (jnp.outer(alpha, alpha) - K_inv)
    diff_bar = -g * alpha
    return (K_bar, diff_bar)


_mvn_logpdf_fused.defvjp(_mvn_logpdf_fused_fwd, _mvn_logpdf_fused_bwd)


def mvn_logpdf_psd(y, mean, K_sig):
    """log N(y; mean, K_sig) straight from the (possibly unsymmetrised)
    covariance.  Routes single-vector large-N cases to the fused custom-VJP
    path; everything else through `cholesky_psd` + `mvn_logpdf_chol`."""
    from stheno_tpu import config as _cfg

    fused_mode = _cfg.active_override("logpdf_fused", LOGPDF_FUSED)
    fused = fused_mode == "on" or (
        fused_mode == "auto" and _use_blocked(K_sig)
    )
    if fused and y.ndim == mean.ndim == 1:
        return _mvn_logpdf_fused(symmetrize(K_sig), y - mean)
    return mvn_logpdf_chol(y, mean, cholesky_psd(K_sig))


def mvn_sample_chol(key, mean, L, sample_shape=()):
    """Sample from N(mean, L L^T): mean + L @ eps."""
    n = L.shape[-1]
    eps = jax.random.normal(key, (*sample_shape, n), dtype=L.dtype)
    smp = mean + jnp.einsum("ij,...j->...i", L, eps)
    return smp
