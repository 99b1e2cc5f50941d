"""SVGP — uncollapsed stochastic variational inference with inducing points
(Hensman et al. 2013), the minibatch-scalable complement to the collapsed
Titsias VFE in `finite_gp.py`.

Where `elbo(VFE(u), fx, y)` marginalises q(u) in closed form (optimal but
requires the full dataset per evaluation, O(N M²)), SVGP keeps an explicit
variational distribution and pays O(|B| M²) per minibatch — hyperparameters
AND variational parameters train jointly by Adam on unbiased minibatch
estimates.  This extends the reference's pseudo-point surface
(`src/gp/sparse_finite_gp.jl`, examples/gppp_and_pseudo_points) to the
data-scale regime it cannot reach; at the optimum over q the bound equals
the collapsed Titsias ELBO (tested).

TPU-first choices:

- **Whitened parametrisation** q(u) = N(m_z + Luu·q_mu, Luu·S·Luuᵀ) with
  S = q_sqrt·q_sqrtᵀ: the KL becomes the identity-prior form (well
  conditioned, no Kuu solves in the KL), and every per-point quantity is an
  M×M-GEMM pipeline that vmaps/shards trivially over the batch.
- Interdomain inducing points: `fz` may tag ANY process of a GPPP
  (including latent ones), exactly like VFE.

API:
  svgp_init(fz)                      → SVGP (q_mu = 0, q_sqrt = I)
  svgp_elbo(svgp, fx, y, scale=1.0)  → scalar bound; `scale` = N_total/|B|
                                        for minibatches
  svgp_posterior(svgp)               → process with mean/var/cov/cov2/var2
                                        at any tagged inputs
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass
from stheno_tpu.ops import chol as _chol
from stheno_tpu.finite_gp import FiniteGP, DiagNoise, _cross_cov_any


@pytree_dataclass
class SVGP:
    """Inducing FiniteGP + whitened variational parameters."""

    fz: FiniteGP
    q_mu: jnp.ndarray  # (M,)
    q_sqrt: jnp.ndarray  # (M, M); lower triangle is used


def svgp_init(fz: FiniteGP) -> SVGP:
    """Variational distribution initialised at the whitened prior q(ε)=N(0,I)
    (so the initial approximate posterior equals the prior)."""
    m = len(fz)
    dt = jnp.result_type(*jax.tree_util.tree_leaves(fz.x), jnp.float32)
    return SVGP(fz, jnp.zeros((m,), dt), jnp.eye(m, dtype=dt))


def _svgp_factors(svgp: SVGP):
    fz = svgp.fz
    Kuu = fz.cov()  # includes fz's jitter/noise
    Luu = _chol.cholesky_psd(Kuu)
    return Luu, jnp.tril(svgp.q_sqrt)


def _q_marginals(svgp: SVGP, Luu, q_sqrt, f, x):
    """Marginals of q(f(x)) for a (process, inputs) pair of the programme."""
    Kuf = _cross_cov_any(svgp.fz.f, svgp.fz.x, f, x)
    V = _chol.solve_lower(Luu, Kuf)  # (M, N)
    mu = f.mean(x) + V.T @ svgp.q_mu
    W = q_sqrt.T @ V
    var = f.var(x) - jnp.sum(V * V, axis=0) + jnp.sum(W * W, axis=0)
    return mu, var


def svgp_elbo(svgp: SVGP, fx: FiniteGP, y, scale=1.0, likelihood=None):
    """Minibatch ELBO: scale·Σᵢ E_q[log p(yᵢ | fᵢ)] − KL(q(ε) ‖ N(0,I)).

    `fx`/`y` are the minibatch; `scale` = N_total / |batch| makes the
    data term an unbiased estimate of the full sum.

    With `likelihood=None` the observation model is Gaussian with `fx`'s
    (diagonal) noise, matching the reference's VFE scope.  Passing any
    `inference.likelihoods.Likelihood` (Bernoulli, Poisson, Student-t, …)
    makes this the non-conjugate SVGP of Hensman et al. 2015 — `fx` should
    then carry only jitter, and the data term is the likelihood's
    (quadrature or closed-form) variational expectation."""
    Luu, q_sqrt = _svgp_factors(svgp)
    mu, var = _q_marginals(svgp, Luu, q_sqrt, fx.f, fx.x)
    y = jnp.asarray(y)
    if likelihood is not None:
        ell = likelihood.variational_expectation(mu, var, y)
    else:
        if not isinstance(fx.noise, DiagNoise):
            raise TypeError(
                "svgp_elbo requires diagonal observation noise "
                "(or pass an explicit likelihood=)"
            )
        s = fx.noise.diag(len(fx))
        two_pi = jnp.asarray(2.0 * jnp.pi, dtype=mu.dtype)
        ell = jnp.sum(
            -0.5 * (jnp.log(two_pi * s) + (y - mu) ** 2 / s + var / s)
        )
    m = svgp.q_mu.shape[0]
    dq = jnp.diagonal(q_sqrt)
    kl = 0.5 * (
        jnp.vdot(svgp.q_mu, svgp.q_mu)
        + jnp.vdot(q_sqrt, q_sqrt)
        - m
        - 2.0 * jnp.sum(jnp.log(jnp.abs(dq)))
    )
    return scale * ell - kl


@pytree_dataclass
class SVGPPosteriorGP:
    """The q-posterior process: supports cross-process prediction at any
    tagged inputs of the programme (same contract as ApproxPosteriorGP).

    mean(x)      = m(x) + V(x)ᵀ q_mu,            V(x) = Luu⁻¹ K(z, x)
    cov(x, x')   = K(x,x') − V(x)ᵀV(x') + W(x)ᵀW(x'),  W = q_sqrtᵀ V
    """

    prior: object
    z: object
    Luu: jnp.ndarray
    q_mu: jnp.ndarray
    q_sqrt: jnp.ndarray

    def _v(self, x):
        return _chol.solve_lower(self.Luu, self.prior.cov2(self.z, x))

    def mean(self, x):
        return self.prior.mean(x) + self._v(x).T @ self.q_mu

    def cov(self, x):
        V = self._v(x)
        W = self.q_sqrt.T @ V
        return self.prior.cov(x) - V.T @ V + W.T @ W

    def cov2(self, x, x2):
        V, V2 = self._v(x), self._v(x2)
        W, W2 = self.q_sqrt.T @ V, self.q_sqrt.T @ V2
        return self.prior.cov2(x, x2) - V.T @ V2 + W.T @ W2

    def var(self, x):
        V = self._v(x)
        W = self.q_sqrt.T @ V
        return self.prior.var(x) - jnp.sum(V * V, axis=0) + jnp.sum(W * W, axis=0)

    def var2(self, x, x2):
        V, V2 = self._v(x), self._v(x2)
        W, W2 = self.q_sqrt.T @ V, self.q_sqrt.T @ V2
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


def svgp_posterior(svgp: SVGP) -> SVGPPosteriorGP:
    Luu, q_sqrt = _svgp_factors(svgp)
    return SVGPPosteriorGP(svgp.fz.f, svgp.fz.x, Luu, svgp.q_mu, q_sqrt)


def svgp_optimal_gaussian(svgp: SVGP, fx: FiniteGP, y) -> SVGP:
    """Closed-form optimal q for Gaussian noise (full batch) — the q at
    which `svgp_elbo` equals the collapsed Titsias `elbo` (used by tests;
    also a strong warm start before minibatch training):

        S* = B⁻¹,  m* = B⁻¹ A b,   B = I + A Aᵀ,  A = Luu⁻¹ Kuf / √s.
    """
    if not isinstance(fx.noise, DiagNoise):
        raise TypeError("requires diagonal observation noise")
    Luu, _ = _svgp_factors(svgp)
    Kuf = _cross_cov_any(svgp.fz.f, svgp.fz.x, fx.f, fx.x)
    s = fx.noise.diag(len(fx))
    sqrt_s = jnp.sqrt(s)
    A = _chol.solve_lower(Luu, Kuf) / sqrt_s[None, :]
    m = A.shape[0]
    B = jnp.eye(m, dtype=A.dtype) + A @ A.T
    LB = _chol.cholesky_psd(B)
    b = (jnp.asarray(y) - fx.mean()) / sqrt_s
    # m* = B⁻¹ A b ; S* = B⁻¹ ⇒ q_sqrt = LB⁻ᵀ (since B⁻¹ = LB⁻ᵀ LB⁻¹)
    mw = _chol.solve_lower(LB, A @ b)
    mw = _chol.solve_lower(LB, mw, trans=True)
    eye = jnp.eye(m, dtype=A.dtype)
    q_sqrt = _chol.solve_lower(LB, eye, trans=True)  # LB⁻ᵀ (upper!)
    # re-lower-triangularise via Cholesky of S* to respect the tril contract
    S = q_sqrt @ q_sqrt.T
    q_sqrt = _chol.cholesky_psd(S)
    return SVGP(svgp.fz, mw, q_sqrt)
