"""Laplace approximation for exact GPs with non-Gaussian likelihoods.

The reference scopes non-Gaussian observation models out entirely
(`/root/reference/README.md:243-258`); here they are first-class
(SURVEY.md §0).  This module gives the classic exact-GP route (GPML
Rasmussen & Williams, Algorithms 3.1/3.2): find the posterior mode f̂ of
p(f | y) by Newton iteration, approximate the posterior by a Gaussian with
the mode's curvature, and report the Laplace log marginal likelihood for
hyperparameter learning.

TPU-first choices:

- **Fixed-iteration damped Newton under `lax.scan`** — no data-dependent
  control flow, one compiled graph; each iteration is a Cholesky of
  B = I + √W K √W plus triangular solves (MXU-bound, same blocked kernels
  as `logpdf`).  Instead of a data-dependent line search, each step
  evaluates the objective Ψ on a STATIC grid of step sizes and takes the
  argmax — an O(N)-per-candidate operation because the natural parameter
  a = K⁻¹(f − m) is carried alongside f (so Ψ needs no extra solves).
  This keeps non-log-concave likelihoods (Student-t) from oscillating.
  Hyperparameter gradients flow through the unrolled iterations (exact at
  convergence).
- The returned `LaplacePosteriorGP` speaks the full process protocol
  (mean/cov/cov2/var/var2 at any tagged inputs), so **cross-process
  prediction through a GPPP works** exactly as with the exact/VFE/SVGP
  posteriors: observe counts on one process, read the latent intensity on
  another.
- Non-log-concave likelihoods (e.g. Student-t): the curvature W is clipped
  at 0, the standard PSD-safe fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass
from stheno_tpu.ops import chol as _chol
from stheno_tpu.finite_gp import FiniteGP, _cross_cov_any


def _d_log_prob(likelihood, f, y):
    """Elementwise (∂/∂f) log p(y|f) and clipped curvature W = −∂²/∂f²."""
    d1 = jax.grad(lambda fi, yi: likelihood.log_prob(fi, yi))
    d2 = jax.grad(lambda fi, yi: d1(fi, yi))
    dll = jax.vmap(d1)(f, y)
    w = -jax.vmap(d2)(f, y)
    return dll, jnp.maximum(w, 0.0)


@pytree_dataclass
class LaplacePosteriorGP:
    """Gaussian approximation q(f·) from the Laplace fit — same prediction
    contract as `ApproxPosteriorGP`/`SVGPPosteriorGP`:

    mean(x)    = m(x) + K(x, X) α,     α = K⁻¹(f̂ − m) (= ∇ log p(y|f̂) at
                                       the mode)
    cov(x, x') = K(x, x') − V(x)ᵀ V(x'),        V(x) = L⁻¹ √W K(X, x)
    with L = chol(I + √W K √W)  (GPML eqs. 3.27/3.29).
    """

    prior: object  # the observed process (any node of a GPPP)
    x: object  # training inputs (tagged ok)
    alpha: jnp.ndarray  # (N,)
    w_sqrt: jnp.ndarray  # (N,)
    L: jnp.ndarray  # (N, N) lower

    def _v(self, x):
        Kxs = _cross_cov_any(self.prior, self.x, self.prior, x)
        return _chol.solve_lower(self.L, self.w_sqrt[:, None] * Kxs)

    def _kxs(self, f, x):
        return _cross_cov_any(self.prior, self.x, f, x)

    def mean(self, x):
        return self.prior.mean(x) + self._kxs(self.prior, x).T @ self.alpha

    def cov(self, x):
        V = self._v(x)
        return self.prior.cov(x) - V.T @ V

    def cov2(self, x, x2):
        return self.prior.cov2(x, x2) - self._v(x).T @ self._v(x2)

    def var(self, x):
        V = self._v(x)
        return self.prior.var(x) - jnp.sum(V * V, axis=0)

    def var2(self, x, x2):
        return self.prior.var2(x, x2) - jnp.sum(self._v(x) * self._v(x2), axis=0)

    def mean_and_cov(self, x):
        return self.mean(x), self.cov(x)

    def mean_and_var(self, x):
        return self.mean(x), self.var(x)

    def __call__(self, x, noise=None):
        return FiniteGP(self, x, noise)


@pytree_dataclass
class LaplaceResult:
    posterior: LaplacePosteriorGP
    log_evidence: jnp.ndarray  # Laplace approx of log p(y | θ)
    f_hat: jnp.ndarray  # posterior mode over f(X)
    newton_decrement: jnp.ndarray  # final |Ψ step|, convergence indicator


def laplace(fx: FiniteGP, y, likelihood, num_iters: int = 30) -> LaplaceResult:
    """Newton mode-finding (GPML Alg. 3.1, generalised to nonzero prior
    mean): maximise Ψ(f) = log p(y|f) − ½ (f−m)ᵀ K⁻¹ (f−m).

    `fx` should carry only jitter-scale noise — the observation model is
    `likelihood`, not a Gaussian noise term.  Returns the fitted posterior
    process, the Laplace log evidence (eq. 3.32) and the mode.
    """
    y = jnp.asarray(y)
    K = fx.cov()  # includes fx's jitter — keeps B well conditioned
    m = fx.mean()
    n = K.shape[0]
    # static step-size grid for the damped-Newton argmax (see module doc)
    etas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03], dtype=K.dtype)

    def psi_at(f, a):
        """Ψ(f) = log p(y|f) − ½ (f−m)ᵀK⁻¹(f−m), with K⁻¹(f−m) = a carried."""
        return jnp.sum(likelihood.log_prob(f, y)) - 0.5 * jnp.vdot(a, f - m)

    def newton_step(carry, _):
        f, a = carry
        dll, w = _d_log_prob(likelihood, f, y)
        w_sqrt = jnp.sqrt(w)
        B = jnp.eye(n, dtype=K.dtype) + (w_sqrt[:, None] * K) * w_sqrt[None, :]
        L = _chol.cholesky_psd(B)
        b = w * (f - m) + dll
        c = _chol.solve_lower(L, w_sqrt * (K @ b))
        a1 = b - w_sqrt * _chol.solve_lower(L, c, trans=True)
        f1 = m + K @ a1
        # candidates f(η) = f + η(f1−f); a(η) = a + η(a1−a) stays = K⁻¹(f(η)−m)
        fs = f[None, :] + etas[:, None] * (f1 - f)[None, :]
        as_ = a[None, :] + etas[:, None] * (a1 - a)[None, :]
        psis = jax.vmap(psi_at)(fs, as_)
        i = jnp.argmax(psis)
        f_new = jnp.take(fs, i, axis=0)
        a_new = jnp.take(as_, i, axis=0)
        return (f_new, a_new), jnp.max(jnp.abs(f_new - f))

    (f_hat, a_hat), steps = jax.lax.scan(
        newton_step, (m, jnp.zeros_like(m)), None, length=num_iters
    )

    dll, w = _d_log_prob(likelihood, f_hat, y)
    w_sqrt = jnp.sqrt(w)
    B = jnp.eye(n, dtype=K.dtype) + (w_sqrt[:, None] * K) * w_sqrt[None, :]
    L = _chol.cholesky_psd(B)
    # α = K⁻¹(f̂ − m), carried exactly; equals ∇ log p(y|f̂) at the mode
    alpha = a_hat
    log_z = (
        -0.5 * jnp.vdot(alpha, f_hat - m)
        + jnp.sum(likelihood.log_prob(f_hat, y))
        - jnp.sum(jnp.log(jnp.diagonal(L)))
    )
    post = LaplacePosteriorGP(fx.f, fx.x, alpha, w_sqrt, L)
    return LaplaceResult(post, log_z, f_hat, steps[-1])


__all__ = ["laplace", "LaplaceResult", "LaplacePosteriorGP"]
