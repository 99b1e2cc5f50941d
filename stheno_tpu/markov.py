"""State-space (Markov) GPs: exact O(N) inference by Kalman filtering,
with an O(log N)-depth parallel filter built on `lax.associative_scan`.

Beyond the reference's surface: Stheno.jl hard-errors on large dense
covariances and points large-N time series at TemporalGPs.jl
(`/root/reference/README.md:20`, `src/gp/sparse_finite_gp.jl:39-43`).
This module is the TPU-native answer for the same workload class — the
fourth big-N tier next to the sharded-exact / ring matrix-free / VFE
paths: 1-D Markov kernels (Matérn family and their scale/lengthscale/sum
algebra) admit an exact linear-time state-space form, and the temporal
parallelisation of Särkkä & García-Fernández (2021, "Temporal
Parallelization of Bayesian Smoothers", IEEE TAC) turns the sequential
filter recursion into an associative combine — `lax.associative_scan`
runs it in O(log N) depth, which is what a TPU wants (the sequential
scan is latency-bound at ~1 step/µs; the parallel filter is a handful of
batched small-matrix GEMM sweeps).

The SDE forms are the standard ones (Hartikainen & Särkkä 2010): a
Matérn-(p+1/2) kernel is a (p+1)-state LTI SDE `dz = F z dt + L dβ`
observed through `H z`; with the stationary initialisation the
discretised process needs only `A_k = expm(F Δt_k)` and
`Q_k = P∞ − A_k P∞ A_kᵀ`.  Kernel algebra maps structurally: variance
scaling scales `P∞`, `with_lengthscale` scales time (F/ℓ), kernel sums
are block-diagonal state stacks.

Everything is differentiable (hyperparameter gradients flow through the
batched `expm` and the scan) and jit-compatible; inputs must be sorted
ascending (documented precondition — enforced in the examples/tests,
not checkable under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stheno_tpu.kernels.base import (
    Kernel,
    ScaledKernel,
    SumKernel,
    TransformedKernel,
    _LengthscaleTransform,
)
from stheno_tpu.kernels.zoo import (
    Matern12Kernel,
    Matern32Kernel,
    Matern52Kernel,
)

__all__ = [
    "sde_representation",
    "markov_gp_logpdf",
    "markov_gp_posterior_marginals",
]


def sde_representation(kernel: Kernel, dtype=jnp.float64):
    """(F, H, Pinf) of the kernel's LTI-SDE state-space form.

    `F` (s, s) drift, `H` (s,) observation row, `Pinf` (s, s) stationary
    covariance; the discrete transition over a gap Δ is `expm(F Δ)` and the
    process noise `Pinf − A Pinf Aᵀ`.  Supported: Matérn-1/2, -3/2, -5/2
    (exact — Hartikainen & Särkkä 2010 Table 1), `ScaledKernel`
    (variance × Pinf), `with_lengthscale` (time scaling F/ℓ; scalar ℓ
    only — these are 1-D inputs), and `SumKernel` (block-diagonal stack).
    Raises TypeError for non-Markov kernels (SE, periodic, ...).
    """
    if isinstance(kernel, Matern12Kernel):
        F = jnp.asarray([[-1.0]], dtype)
        H = jnp.asarray([1.0], dtype)
        Pinf = jnp.asarray([[1.0]], dtype)
        return F, H, Pinf
    if isinstance(kernel, Matern32Kernel):
        lam = jnp.sqrt(jnp.asarray(3.0, dtype))
        F = jnp.asarray([[0.0, 1.0], [-3.0, 0.0]], dtype)
        F = F.at[1, 1].set(-2.0 * lam)
        H = jnp.asarray([1.0, 0.0], dtype)
        Pinf = jnp.diag(jnp.asarray([1.0, 3.0], dtype))
        return F, H, Pinf
    if isinstance(kernel, Matern52Kernel):
        lam = jnp.sqrt(jnp.asarray(5.0, dtype))
        F = jnp.zeros((3, 3), dtype)
        F = F.at[0, 1].set(1.0).at[1, 2].set(1.0)
        F = F.at[2, 0].set(-(lam**3)).at[2, 1].set(-3.0 * lam**2)
        F = F.at[2, 2].set(-3.0 * lam)
        H = jnp.asarray([1.0, 0.0, 0.0], dtype)
        k2 = lam**2 / 3.0  # Var of the first derivative
        Pinf = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype)
        Pinf = Pinf.at[1, 1].set(k2)
        Pinf = Pinf.at[0, 2].set(-k2).at[2, 0].set(-k2)
        Pinf = Pinf.at[2, 2].set(lam**4)
        return F, H, Pinf
    if isinstance(kernel, ScaledKernel):
        F, H, Pinf = sde_representation(kernel.kernel, dtype)
        v = jnp.asarray(kernel.variance, dtype)
        return F, H, v * Pinf
    if isinstance(kernel, TransformedKernel) and isinstance(
            kernel.transform, _LengthscaleTransform):
        ell = jnp.asarray(kernel.transform.lengthscale, dtype)
        if ell.ndim != 0:
            raise TypeError(
                "markov: with_lengthscale must be scalar for 1-D "
                "state-space inference")
        F, H, Pinf = sde_representation(kernel.kernel, dtype)
        # k(x/ℓ, y/ℓ): the state process runs on the time scale t/ℓ —
        # same stationary law, drift divided by ℓ.
        return F / ell, H, Pinf
    if isinstance(kernel, SumKernel):
        Fa, Ha, Pa = sde_representation(kernel.left, dtype)
        Fb, Hb, Pb = sde_representation(kernel.right, dtype)
        sa, sb = Fa.shape[0], Fb.shape[0]
        F = jnp.zeros((sa + sb, sa + sb), dtype)
        F = F.at[:sa, :sa].set(Fa).at[sa:, sa:].set(Fb)
        P = jnp.zeros_like(F)
        P = P.at[:sa, :sa].set(Pa).at[sa:, sa:].set(Pb)
        return F, jnp.concatenate([Ha, Hb]), P
    raise TypeError(
        f"{type(kernel).__name__} has no (supported) Markov state-space "
        f"form; supported: Matern12/32/52 and their scale / scalar-"
        f"lengthscale / sum algebra")


def _discretise(kernel, x, dtype):
    """Batched (A_k, Q_k) over the gaps of sorted `x`, plus (H, Pinf).

    A_0 = 0 and Q_0 = Pinf encode the stationary start (the k=0 "predict"
    lands exactly on the prior marginal).
    """
    F, H, Pinf = sde_representation(kernel, dtype)
    dt = jnp.diff(jnp.asarray(x, dtype))
    A_later = jax.vmap(jax.scipy.linalg.expm)(dt[:, None, None] * F)
    A0 = jnp.zeros_like(F)[None]
    A = jnp.concatenate([A0, A_later], axis=0)  # (N, s, s)
    Q = Pinf[None] - A @ Pinf[None] @ jnp.swapaxes(A, -1, -2)
    Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))
    return A, Q, H, Pinf


def _filter_elements(A, Q, H, y, r, obs_mask):
    """Per-step associative filtering elements (A', b', C', η, J).

    Särkkä & García-Fernández 2021, Lemma 8 (initialisation): one Kalman
    predict-update folded into an affine-Gaussian map.  Masked steps
    (prediction-only sites) carry the pure predict element
    (A, 0, Q, 0, 0).
    """
    s = A.shape[-1]
    S = jnp.einsum("i,nij,j->n", H, Q, H) + r  # (N,)
    K = (Q @ H) / S[:, None]  # (N, s)
    ImKH = jnp.eye(s, dtype=A.dtype)[None] - K[:, :, None] * H[None, None, :]
    AtH = jnp.einsum("nji,j->ni", A, H)  # Aᵀ Hᵀ  (N, s)

    m = obs_mask[:, None]
    m2 = obs_mask[:, None, None]
    A_e = jnp.where(m2, ImKH @ A, A)
    b_e = jnp.where(m, K * y[:, None], 0.0)
    C_e = jnp.where(m2, ImKH @ Q, Q)
    eta = jnp.where(m, AtH * (y / S)[:, None], 0.0)
    J = jnp.where(m2, AtH[:, :, None] * AtH[:, None, :] / S[:, None, None],
                  0.0)
    return A_e, b_e, C_e, eta, J


def _combine(e1, e2):
    """The associative filtering combine (Särkkä & G-F 2021, Lemma 7)."""
    A1, b1, C1, n1, J1 = e1
    A2, b2, C2, n2, J2 = e2
    s = A1.shape[-1]
    eye = jnp.eye(s, dtype=A1.dtype)
    # (I + C1 J2)⁻¹ applied from the right of A2 / into b,C — one solve,
    # shared; (I + J2 C1)⁻¹ is its transpose-dual for the information pair.
    M = jnp.linalg.solve(eye[None] + C1 @ J2, eye[None])  # (N, s, s)
    A2M = A2 @ M
    A3 = A2M @ A1
    b3 = jnp.einsum("nij,nj->ni", A2M, b1 + jnp.einsum("nij,nj->ni", C1, n2)
                    ) + b2
    C3 = A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    Mt = jnp.swapaxes(M, -1, -2)  # (I + J2 C1)⁻¹
    A1tMt = jnp.swapaxes(A1, -1, -2) @ Mt
    n3 = jnp.einsum("nij,nj->ni", A1tMt,
                    n2 - jnp.einsum("nij,nj->ni", J2, b1)) + n1
    J3 = A1tMt @ J2 @ A1 + J1
    return A3, b3, C3, n3, J3


def _parallel_filter(A, Q, H, y, r, obs_mask):
    """All filtered moments (m_k, P_k) in O(log N) depth."""
    elems = _filter_elements(A, Q, H, y, r, obs_mask)
    _, b, C, _, _ = lax.associative_scan(_combine, elems)
    return b, C  # filtered means (N, s), covariances (N, s, s)


def _sequential_filter(A, Q, H, y, r, obs_mask):
    """Reference sequential scan (same outputs; latency-bound on TPU)."""
    s = A.shape[-1]

    def step(carry, inp):
        m, P = carry
        Ak, Qk, yk, rk, ok = inp
        m = Ak @ m
        P = Ak @ P @ Ak.T + Qk
        S = H @ P @ H + rk
        K = (P @ H) / S
        m_u = m + K * (yk - H @ m)
        P_u = P - jnp.outer(K, K) * S
        m = jnp.where(ok, m_u, m)
        P = jnp.where(ok, 0.5 * (P_u + P_u.T), P)
        return (m, P), (m, P)

    init = (jnp.zeros((s,), A.dtype), jnp.zeros((s, s), A.dtype))
    _, (ms, Ps) = lax.scan(step, init, (A, Q, y, r, obs_mask))
    return ms, Ps


def _predictive_loglik(A, Q, H, y, r, obs_mask, m_f, P_f):
    """Σ_k log N(y_k; H m_{k|k−1}, H P_{k|k−1} Hᵀ + r_k) from the filtered
    moments — elementwise given the scan output (shift by one step)."""
    m_prev = jnp.concatenate([jnp.zeros_like(m_f[:1]), m_f[:-1]], axis=0)
    P_prev = jnp.concatenate([jnp.zeros_like(P_f[:1]), P_f[:-1]], axis=0)
    m_pred = jnp.einsum("nij,nj->ni", A, m_prev)
    P_pred = A @ P_prev @ jnp.swapaxes(A, -1, -2) + Q
    mu = m_pred @ H
    S = jnp.einsum("i,nij,j->n", H, P_pred, H) + r
    ll = -0.5 * (jnp.log(2.0 * jnp.pi * S) + (y - mu) ** 2 / S)
    return jnp.sum(jnp.where(obs_mask, ll, 0.0))


def _prep(kernel, x, y, noise, dtype):
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise TypeError("markov: inputs must be a sorted 1-D vector")
    dtype = dtype or jnp.result_type(x.dtype, jnp.asarray(y).dtype)
    A, Q, H, Pinf = _discretise(kernel, x, dtype)
    y = jnp.asarray(y, dtype)
    r = jnp.broadcast_to(jnp.asarray(noise, dtype), y.shape)
    return A, Q, H, y, r, dtype


def markov_gp_logpdf(kernel, x, y, noise, parallel=True, dtype=None):
    """Exact GP log marginal likelihood in O(N) work / O(log N) depth.

    Equals `logpdf(GP(kernel)(x, noise), y)` for Markov kernels (tested
    against the dense path); `noise` is the observation VARIANCE (scalar
    or per-point), matching `FiniteGP` conventions.  `x` must be sorted
    ascending.  `parallel=False` uses the sequential scan (debug /
    oracle path).
    """
    A, Q, H, y, r, _ = _prep(kernel, x, y, noise, dtype)
    mask = jnp.ones(y.shape, bool)
    flt = _parallel_filter if parallel else _sequential_filter
    m_f, P_f = flt(A, Q, H, y, r, mask)
    return _predictive_loglik(A, Q, H, y, r, mask, m_f, P_f)


def _rts_smoother(A, Q, m_f, P_f):
    """Sequential Rauch–Tung–Striebel backward pass over filtered moments."""

    def step(carry, inp):
        ms_next, Ps_next = carry
        m, P, A_next, Q_next = inp
        P_pred = A_next @ P @ A_next.T + Q_next
        G = jnp.linalg.solve(P_pred.T, (P @ A_next.T).T).T
        ms = m + G @ (ms_next - A_next @ m)
        Ps = P + G @ (Ps_next - P_pred) @ G.T
        return (ms, 0.5 * (Ps + Ps.T)), (ms, Ps)

    inps = (m_f[:-1], P_f[:-1], A[1:], Q[1:])
    init = (m_f[-1], P_f[-1])
    _, (ms, Ps) = lax.scan(step, init, inps, reverse=True)
    ms = jnp.concatenate([ms, m_f[-1:]], axis=0)
    Ps = jnp.concatenate([Ps, P_f[-1:]], axis=0)
    return ms, Ps


def _smoother_combine(e1, e2):
    """Associative smoothing combine (Särkkä & G-F 2021, Lemma 9): the
    smoothing pass is an affine-Gaussian map composition — elementwise
    matrix algebra, no solves."""
    E1, g1, L1 = e1
    E2, g2, L2 = e2
    return (
        E1 @ E2,
        jnp.einsum("nij,nj->ni", E1, g2) + g1,
        E1 @ L2 @ jnp.swapaxes(E1, -1, -2) + L1,
    )


def _parallel_smoother(A, Q, m_f, P_f):
    """All smoothed moments in O(log N) depth via a reverse
    `associative_scan` over per-step smoothing elements (E, g, L):
    E_k = P_k A_{k+1}ᵀ P⁻¹_{k+1|k} (the RTS gain), g_k = m_k − E_k A m_k,
    L_k = P_k − E_k A P_k; the terminal element is (0, m_N, P_N)."""
    s = A.shape[-1]
    A_n, Q_n = A[1:], Q[1:]  # transition k -> k+1
    P_pred = A_n @ P_f[:-1] @ jnp.swapaxes(A_n, -1, -2) + Q_n
    PAt = P_f[:-1] @ jnp.swapaxes(A_n, -1, -2)
    # E = PAt P_pred⁻¹  ⇔  E P_pred = PAt  ⇔  P_predᵀ Eᵀ = PAtᵀ
    E = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(P_pred, -1, -2),
                         jnp.swapaxes(PAt, -1, -2)), -1, -2)
    g = m_f[:-1] - jnp.einsum("nij,nj->ni", E @ A_n, m_f[:-1])
    L = P_f[:-1] - E @ A_n @ P_f[:-1]
    L = 0.5 * (L + jnp.swapaxes(L, -1, -2))
    elems = (
        jnp.concatenate([E, jnp.zeros((1, s, s), A.dtype)], axis=0),
        jnp.concatenate([g, m_f[-1:]], axis=0),
        jnp.concatenate([L, P_f[-1:]], axis=0),
    )
    # reverse=True delivers fn(later_composite, current): the current step
    # is the OUTER map of the composition, so swap into the (outer, inner)
    # roles _smoother_combine expects (op'(a,b)=op(b,a) stays associative).
    _, ms, Ps = lax.associative_scan(
        lambda a, b: _smoother_combine(b, a), elems, reverse=True)
    return ms, Ps


def markov_gp_posterior_marginals(kernel, x, y, noise, x_star=None,
                                  parallel=True, dtype=None):
    """Posterior marginal (mean, var) — at `x_star` if given, else at `x`.

    One filter + one smoother over the sorted union of `x` and `x_star`
    (prediction sites are mask-skipped in the update), so prediction costs
    the same O(N + N*) as training.  Matches the dense
    `posterior(...)` marginals for Markov kernels (tested).  Both inputs
    must be sorted ascending.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x_star is None:
        xa, ya = x, y
        mask = jnp.ones(xa.shape, bool)
        take = None
    else:
        x_star = jnp.asarray(x_star)
        order = jnp.argsort(jnp.concatenate([x, x_star]), stable=True)
        xa = jnp.concatenate([x, x_star])[order]
        ya = jnp.concatenate([y, jnp.zeros(x_star.shape, y.dtype)])[order]
        mask = jnp.concatenate(
            [jnp.ones(x.shape, bool), jnp.zeros(x_star.shape, bool)])[order]
        # sorted-union position of each x_star entry: invert the sort
        take = jnp.argsort(order, stable=True)[x.shape[0]:]
    A, Q, H, ya, r, _ = _prep(kernel, xa, ya, noise, dtype)
    flt = _parallel_filter if parallel else _sequential_filter
    m_f, P_f = flt(A, Q, H, ya, r, mask)
    smo = _parallel_smoother if parallel else _rts_smoother
    ms, Ps = smo(A, Q, m_f, P_f)
    mean = ms @ H
    var = jnp.einsum("i,nij,j->n", H, Ps, H)
    if take is not None:
        mean, var = mean[take], var[take]
    return mean, var
