"""FiniteGP + inference verbs — behavioral parity with the AbstractGPs.jl
surface the reference reexports (SURVEY.md layer 1): `rand`, `logpdf`,
`posterior`, `marginals`, `mean_and_cov`, `mean_and_var`, `elbo`, `VFE`,
plus Stheno's own `SparseFiniteGP` (src/gp/sparse_finite_gp.jl) and
cross-FiniteGP covariance (src/gp/util.jl:12-14).

TPU-first: every verb is a pure function of pytrees — jit/grad/vmap'able end
to end.  The dense O(N³) path routes through stheno_tpu.ops.chol (XLA blocked
Cholesky; Pallas/distributed implementations swap in underneath).  The VFE
path is O(N M²) with no N×N materialisation, and its gradient is reverse-mode
through the same factored expressions (the reference had an O(N³) ELBO-grad
regression, NEWS.md:63-65 — structurally impossible here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field
from stheno_tpu.config import default_jitter
from stheno_tpu.inputs import BlockData, GPPPInput, input_length
from stheno_tpu.ops import chol as _chol


# ---------------------------------------------------------------------------
# Observation noise
# ---------------------------------------------------------------------------


@pytree_dataclass
class DiagNoise:
    """Diagonal observation noise; `d` broadcasts against (N,)."""

    d: jnp.ndarray

    def add_to(self, K):
        n = K.shape[-1]
        return K + jnp.broadcast_to(self.d, (n,)) * jnp.eye(n, dtype=K.dtype)

    def diag(self, n):
        return jnp.broadcast_to(self.d, (n,))


@pytree_dataclass
class FullNoise:
    """Dense noise covariance (correlated observation noise)."""

    S: jnp.ndarray

    def add_to(self, K):
        return K + self.S

    def diag(self, n):
        return jnp.diagonal(self.S)


def as_noise(noise, dtype):
    """Coerce user noise spec: None → dtype-scaled jitter; scalar/vector →
    diagonal; (N, N) matrix → full."""
    if isinstance(noise, (DiagNoise, FullNoise)):
        return noise
    if noise is None:
        return DiagNoise(jnp.asarray(default_jitter(dtype), dtype=dtype))
    noise = jnp.asarray(noise)
    if noise.ndim == 2:
        return FullNoise(noise)
    return DiagNoise(noise)


# ---------------------------------------------------------------------------
# FiniteGP
# ---------------------------------------------------------------------------


@pytree_dataclass
class FiniteGP:
    """A process `f` indexed at finite inputs `x` with observation noise —
    i.e. a multivariate normal (the reference's `FiniteGP` = `f(x, Σ)`)."""

    f: object  # AbstractProcess | GPPP | PosteriorGP | ApproxPosteriorGP
    x: object  # array | GPPPInput | BlockData
    noise: object = None

    def __post_init__(self):
        if not isinstance(self.noise, (DiagNoise, FullNoise)):
            from stheno_tpu.inputs import input_dtype

            dtype = input_dtype(self.x)
            object.__setattr__(self, "noise", as_noise(self.noise, dtype))

    def __len__(self):
        return input_length(self.x)

    # statistics of the *latent* process at x (noise excluded, as in
    # AbstractGPs: mean/cov of a FiniteGP include noise only in cov)
    def mean(self):
        return self.f.mean(self.x)

    def cov(self):
        return self.noise.add_to(self.f.cov(self.x))

    def var(self):
        return self.f.var(self.x) + self.noise.diag(len(self))

    def mean_and_cov(self):
        return self.mean(), self.cov()

    def mean_and_var(self):
        return self.mean(), self.var()


class Marginals(NamedTuple):
    """Per-point posterior marginals (the reference's vector-of-Normals)."""

    mean: jnp.ndarray
    var: jnp.ndarray

    @property
    def std(self):
        return jnp.sqrt(self.var)


# ---------------------------------------------------------------------------
# Inference verbs
# ---------------------------------------------------------------------------


def mean(fx_or_f, x=None):
    if x is None:
        return fx_or_f.mean()
    return fx_or_f.mean(x)


def cov(a, b=None, x=None, x2=None):
    """`cov(fx)`, `cov(f, x)`, `cov(fx, gx)` (cross-FiniteGP,
    src/gp/util.jl:12-14), or `cov(f, g, x, x2)`."""
    from stheno_tpu.graph import cross_cov

    if b is None and x is None:
        return a.cov()
    if isinstance(b, FiniteGP):
        return _cross_finite_cov(a, b)
    if x is None:
        return a.cov(b)  # cov(f, x)
    if x2 is None:
        return cross_cov(a, b, x, x)
    return cross_cov(a, b, x, x2)


def _cross_finite_cov(fx: FiniteGP, gx: FiniteGP):
    from stheno_tpu.graph import AbstractProcess, cross_cov

    if fx.f is gx.f:
        return fx.f.cov2(fx.x, gx.x)
    if isinstance(fx.f, AbstractProcess) and isinstance(gx.f, AbstractProcess):
        return cross_cov(fx.f, gx.f, fx.x, gx.x)
    raise TypeError("cov(fx, gx) requires processes from the same programme")


def var(fx_or_f, x=None):
    if x is None:
        return fx_or_f.var()
    return fx_or_f.var(x)


def mean_and_cov(fx):
    return fx.mean_and_cov()


def mean_and_var(fx):
    return fx.mean_and_var()


def marginals(fx: FiniteGP) -> Marginals:
    """Per-point marginal mean/variance including observation noise — the
    O(N) path (reference `marginals`; docs/src/internals.md:12-24)."""
    m, v = fx.mean_and_var()
    return Marginals(m, v)


def _chol_of(fx: FiniteGP):
    return _chol.cholesky_psd(fx.cov())


def rand(key, fx, num_samples=None):
    """Sample `y ~ N(mean, K + Σ)`.  Returns (N,) or (N, S) — matching the
    reference's `rand(rng, fx[, S])` column convention (README.md:96).
    `SparseFiniteGP` samples its observation FiniteGP (sparse_finite_gp.jl:46-49)."""
    if isinstance(fx, SparseFiniteGP):
        fx = fx.fobs
    L = _chol_of(fx)
    n = L.shape[-1]
    S = 1 if num_samples is None else num_samples
    eps = jax.random.normal(key, (n, S), dtype=L.dtype)
    y = fx.mean()[:, None] + L @ eps
    return y[:, 0] if num_samples is None else y


def logpdf(fx, y):
    """log N(y; m, K + Σ).  `y` may be (N,) or (N, S) for per-column logpdfs
    (matching AbstractGPs).  `SparseFiniteGP` routes to `elbo` (logpdf ≡ elbo,
    src/gp/sparse_finite_gp.jl:52-54)."""
    if isinstance(fx, SparseFiniteGP):
        return _sparse_logpdf(fx, y)
    return _chol.mvn_logpdf_psd(jnp.asarray(y), fx.mean(), fx.cov())


# ---------------------------------------------------------------------------
# Exact posterior
# ---------------------------------------------------------------------------


@pytree_dataclass
class PosteriorGP:
    """Posterior process after exact conditioning on `y` at `x_obs`.

    Implements the same statistics interface as a prior process, so it can be
    (a) queried at *any* tagged inputs — cross-process prediction "observe
    :f3, read off :f1" (reference README.md:81-99) falls out because all
    covariance queries route through the prior programme — and (b) conditioned
    again (`posterior(post(x2), y2)`), matching `PosteriorGP` composability.
    """

    prior: object  # process-like
    x_obs: object
    L: jnp.ndarray  # chol(K_obs + Σ)
    alpha: jnp.ndarray  # (K_obs + Σ)^{-1} (y - m_obs)

    def _a(self, x):
        """L^{-1} K(x_obs, x) — the shared O(N_obs² · N) solve."""
        k_ox = self.prior.cov2(self.x_obs, x)
        return _chol.solve_lower(self.L, k_ox)

    def mean(self, x):
        k_xo = self.prior.cov2(x, self.x_obs)
        return self.prior.mean(x) + k_xo @ self.alpha

    def cov(self, x):
        A = self._a(x)
        return self.prior.cov(x) - A.T @ A

    def cov2(self, x, x2):
        return self.prior.cov2(x, x2) - self._a(x).T @ self._a(x2)

    def var(self, x):
        A = self._a(x)
        return self.prior.var(x) - jnp.sum(A * A, axis=0)

    def var2(self, x, x2):
        return self.prior.var2(x, x2) - jnp.sum(self._a(x) * self._a(x2), axis=0)

    def mean_and_cov(self, x):
        return self.mean(x), self.cov(x)

    def mean_and_var(self, x):
        return self.mean(x), self.var(x)

    def __call__(self, x, noise=None):
        return FiniteGP(self, x, noise)


def posterior(fx, y, y2=None):
    """Condition: `posterior(f(x, Σ), y)` → posterior process.

    One O(N³) factorisation, reused by every downstream prediction
    (SURVEY.md §3.3).  `SparseFiniteGP` routes to the VFE approximate
    posterior (src/gp/sparse_finite_gp.jl:60-62), and the reference's
    `posterior(VFE(u), fx, y)` signature is accepted too.
    """
    if isinstance(fx, VFE):
        return posterior_vfe(fx, y, y2)
    if isinstance(fx, SparseFiniteGP):
        return posterior_vfe(VFE(fx.finducing), fx.fobs, y)
    L = _chol_of(fx)
    alpha = _chol.chol_solve(L, jnp.asarray(y) - fx.mean())
    return PosteriorGP(fx.f, fx.x, L, alpha)


# ---------------------------------------------------------------------------
# VFE / Titsias ELBO (behavioral parity with AbstractGPs `elbo`, `VFE`;
# SURVEY.md §3.5)
# ---------------------------------------------------------------------------


@pytree_dataclass
class VFE:
    """Titsias variational pseudo-point approximation, specified by the
    inducing-point FiniteGP `fz` (which may tag *any* process of a GPPP,
    including latent ones — interdomain pseudo-points,
    examples/gppp_and_pseudo_points/script.jl:74-76)."""

    fz: FiniteGP


def _vfe_factors(approx: VFE, fx: FiniteGP):
    """Shared O(N M²) factor computation.

    Returns (Luu, A, LB, sqrt_s, m_x) with
      Luu = chol(Kuu + jitter),  A = Luu⁻¹ Kuf / √s,  B = I + A Aᵀ = LB LBᵀ.
    """
    fz, u = approx.fz, approx.fz.f
    if not isinstance(fx.noise, DiagNoise):
        raise TypeError("elbo/VFE requires diagonal observation noise")
    n = len(fx)
    s = fx.noise.diag(n)
    Kuu = fz.cov()  # includes fz's own jitter/noise
    Luu = _chol.cholesky_psd(Kuu)
    Kuf = _cross_cov_any(u, fz.x, fx.f, fx.x)
    sqrt_s = jnp.sqrt(s)
    A = _chol.solve_lower(Luu, Kuf) / sqrt_s[None, :]
    m = A.shape[0]
    B = jnp.eye(m, dtype=A.dtype) + A @ A.T
    LB = _chol.cholesky_psd(B)
    return Luu, A, LB, sqrt_s


def _cross_cov_any(f, x_f, g, x_g):
    """Covariance between two (process, inputs) pairs that may live on graph
    nodes or on a shared GPPP with tagged inputs."""
    from stheno_tpu.graph import AbstractProcess, cross_cov

    if f is g:
        return f.cov2(x_f, x_g)
    if isinstance(f, AbstractProcess) and isinstance(g, AbstractProcess):
        return cross_cov(f, g, x_f, x_g)
    raise TypeError(
        "pseudo-points and observations must come from the same programme "
        "(same GPPP or same GPC)"
    )


def elbo_fx(fx: FiniteGP, y, u: FiniteGP):
    """AbstractGPs-style convenience `elbo(fx, y, u)` (reference
    README.md:78): equivalent to `elbo(VFE(u), fx, y)`."""
    return elbo(VFE(u), fx, y)


def elbo(approx: VFE, fx: FiniteGP, y):
    """Titsias collapsed ELBO — a lower bound on `logpdf(fx, y)`.

    elbo = log N(y; m, Qff + Σ) − ½ Σᵢ (Kffᵢᵢ − Qffᵢᵢ)/σᵢ²,
    computed in O(N M²) via the Woodbury/Matrix-determinant identities —
    no N×N matrix is ever formed (cf. NEWS.md:63-65 regression note).
    """
    Luu, A, LB, sqrt_s = _vfe_factors(approx, fx)
    n = len(fx)
    y = jnp.asarray(y)
    b = (y - fx.mean()) / sqrt_s
    c = _chol.solve_lower(LB, A @ b)
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype=A.dtype)
    log_marginal = -0.5 * (
        n * jnp.log(two_pi)
        + 2.0 * jnp.sum(jnp.log(sqrt_s))
        + _chol.chol_logdet(LB)
        + b @ b
        - c @ c
    )
    # trace correction: −½ Σᵢ (kff_ii − qff_ii)/sᵢ ; qff_ii/sᵢ = Σ_m A²[m,i]
    kff_diag = fx.f.var(fx.x)
    trace_term = -0.5 * (jnp.sum(kff_diag / sqrt_s**2) - jnp.sum(A * A))
    return log_marginal + trace_term


@pytree_dataclass
class ApproxPosteriorGP:
    """VFE approximate posterior process (Titsias q(u) marginalised).

    mean(x*) = m(x*) + V*ᵀ (Luu⁻¹ (m_u − m_z))       with V* = Luu⁻¹ K(z, x*)
    cov(x*, x*') = K** − V*ᵀV*' + W*ᵀW*'             with W* = LB⁻¹ V*
    """

    prior: object
    z: object  # inducing inputs (possibly tagged)
    Luu: jnp.ndarray
    LB: jnp.ndarray
    c: jnp.ndarray  # B⁻¹ A b  (so that α_u = Luu⁻ᵀ c-ish); see posterior_vfe

    def _v(self, x):
        return _chol.solve_lower(self.Luu, self.prior.cov2(self.z, x))

    def mean(self, x):
        V = self._v(x)
        return self.prior.mean(x) + V.T @ self.c

    def cov(self, x):
        V = self._v(x)
        W = _chol.solve_lower(self.LB, V)
        return self.prior.cov(x) - V.T @ V + W.T @ W

    def cov2(self, x, x2):
        V, V2 = self._v(x), self._v(x2)
        W = _chol.solve_lower(self.LB, V)
        W2 = _chol.solve_lower(self.LB, V2)
        return self.prior.cov2(x, x2) - V.T @ V2 + W.T @ W2

    def var(self, x):
        V = self._v(x)
        W = _chol.solve_lower(self.LB, V)
        return self.prior.var(x) - jnp.sum(V * V, axis=0) + jnp.sum(W * W, axis=0)

    def var2(self, x, x2):
        V, V2 = self._v(x), self._v(x2)
        W = _chol.solve_lower(self.LB, V)
        W2 = _chol.solve_lower(self.LB, V2)
        return (
            self.prior.var2(x, x2)
            - jnp.sum(V * V2, axis=0)
            + jnp.sum(W * W2, axis=0)
        )

    def mean_and_cov(self, x):
        return self.mean(x), self.cov(x)

    def mean_and_var(self, x):
        return self.mean(x), self.var(x)

    def __call__(self, x, noise=None):
        return FiniteGP(self, x, noise)


def posterior_vfe(approx: VFE, fx: FiniteGP, y):
    """Approximate posterior under the Titsias approximation.

    With A, B = I + AAᵀ = LB LBᵀ as in `_vfe_factors` and b = (y − m)/√s:
      posterior mean correction at x* is V*ᵀ LB⁻ᵀ LB⁻¹ A b.
    We store c = LB⁻ᵀ LB⁻¹ (A b) so mean(x*) = m* + V*ᵀ c.
    """
    Luu, A, LB, sqrt_s = _vfe_factors(approx, fx)
    b = (jnp.asarray(y) - fx.mean()) / sqrt_s
    c = _chol.solve_lower(LB, A @ b)
    c = _chol.solve_lower(LB, c, trans=True)
    prior, z = approx.fz.f, approx.fz.x
    return ApproxPosteriorGP(prior, z, Luu, LB, c)


# ---------------------------------------------------------------------------
# SparseFiniteGP sugar (src/gp/sparse_finite_gp.jl)
# ---------------------------------------------------------------------------


@pytree_dataclass
class SparseFiniteGP:
    """Pairs an observation FiniteGP with an inducing-point FiniteGP.

    `logpdf` on it computes the `elbo` (:52-54); `posterior` gives the VFE
    approximate posterior (:60-62); `cov` deliberately raises to avoid
    densifying (dense-memory guard, :39-43)."""

    fobs: FiniteGP
    finducing: FiniteGP

    def __len__(self):
        return len(self.fobs)

    def mean(self):
        return self.fobs.mean()

    def cov(self):
        raise RuntimeError(
            "The covariance matrix of a sparse GP can often be dense and can "
            "cause the computer to run out of memory. If you are sure you "
            "have enough memory, use `cov(f.fobs)`."
        )

    def mean_and_var(self):
        return self.fobs.mean_and_var()

    def var(self):
        return self.fobs.var()


def _sparse_logpdf(fxu: SparseFiniteGP, y):
    y = jnp.asarray(y)
    if y.ndim == 2:
        return jax.vmap(lambda col: elbo(VFE(fxu.finducing), fxu.fobs, col), in_axes=1)(y)
    return elbo(VFE(fxu.finducing), fxu.fobs, y)


def rand_sparse(key, fxu: SparseFiniteGP, num_samples=None):
    return rand(key, fxu.fobs, num_samples)
