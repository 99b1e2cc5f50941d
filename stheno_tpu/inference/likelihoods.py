"""Non-Gaussian observation likelihoods (Bernoulli, Poisson, Student-t, …).

The reference deliberately scopes these out and delegates to Turing
(`/root/reference/README.md:243-258` — "non-Gaussian likelihoods … are
deliberately out of scope"); on TPU there is no ecosystem to delegate to, so
they are first-class here (SURVEY.md §0), usable with

- the SVGP variational bound (`svgp_elbo(..., likelihood=...)`) — classification
  / counts at minibatch scale, and
- the Laplace approximation for exact GPs (`inference/laplace.py`).

TPU-first design: every expectation that lacks a closed form is a fixed-size
Gauss–Hermite quadrature — a static (N, Q) broadcast + reduction that fuses
into the surrounding ELBO graph (no data-dependent control flow, MXU/VPU
friendly).  Closed forms are used where they exist (Gaussian; Poisson with
exp link; probit predictive).

All numeric parameters are pytree leaves, so hyperparameters of the
likelihood (noise variance, Student-t scale, …) are trainable by any of the
engines in this package.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field


def _gh_nodes(n, dtype):
    """Static Gauss–Hermite nodes/weights for E_{N(mu,var)}[g(f)]:
    E ≈ Σ_i (w_i/√π) g(mu + √(2 var)·t_i)."""
    t, w = np.polynomial.hermite.hermgauss(n)
    return (
        jnp.asarray(t, dtype=dtype),
        jnp.asarray(w / np.sqrt(np.pi), dtype=dtype),
    )


class Likelihood:
    """Factorised observation model p(y | f) = Π_i p(y_i | f_i).

    Concrete likelihoods implement elementwise `log_prob(f, y)` and the
    conditional moments `conditional_mean(f)` / `conditional_variance(f)`;
    quadrature defaults below turn those into the variational expectation
    E_{N(mu,var)}[log p(y|f)] (the SVGP data term) and the predictive
    moments of y.  Closed-form overrides beat quadrature where available.
    """

    # quadrature order; concrete subclasses re-declare it as a static field
    # (deliberately NOT annotated here — must not become a leading dataclass
    # field inherited ahead of the subclasses' numeric parameters)
    n_gh = 20

    # -- required elementwise pieces ------------------------------------
    def log_prob(self, f, y):  # pragma: no cover - interface
        raise NotImplementedError

    def conditional_mean(self, f):  # pragma: no cover - interface
        raise NotImplementedError

    def conditional_variance(self, f):  # pragma: no cover - interface
        raise NotImplementedError

    # -- quadrature defaults --------------------------------------------
    def _quad(self, g, mu, var):
        """E_{N(mu, var)}[g(f)] elementwise via Gauss–Hermite (static Q)."""
        mu = jnp.asarray(mu)
        t, w = _gh_nodes(self.n_gh, mu.dtype)
        # SVGP marginal variances are computed by subtraction and can go
        # slightly negative from f32 cancellation — clamp, or one entry
        # NaNs the whole quadrature sum.
        f = mu[..., None] + jnp.sqrt(
            2.0 * jnp.maximum(var, 0.0)
        )[..., None] * t  # (..., Q)
        return jnp.sum(g(f) * w, axis=-1)

    def variational_expectation(self, mu, var, y):
        """Σ_i E_{N(mu_i, var_i)}[log p(y_i | f_i)]."""
        y = jnp.asarray(y)
        return jnp.sum(self._quad(lambda f: self.log_prob(f, y[..., None]), mu, var))

    def predictive_mean_var(self, mu, var):
        """Moments of y under f ~ N(mu, var):  E[y] = E[m(f)],
        Var[y] = E[v(f)] + Var[m(f)]  (law of total variance)."""
        ey = self._quad(self.conditional_mean, mu, var)
        ey2 = self._quad(
            lambda f: self.conditional_variance(f) + self.conditional_mean(f) ** 2,
            mu,
            var,
        )
        return ey, ey2 - ey**2


@pytree_dataclass
class GaussianLikelihood(Likelihood):
    """y | f ~ N(f, variance).  Closed forms throughout; with this
    likelihood `svgp_elbo(..., likelihood=GaussianLikelihood(s))` equals the
    built-in Gaussian path (tested)."""

    variance: jnp.ndarray = 1.0
    n_gh: int = static_field(default=20)

    def log_prob(self, f, y):
        s = self.variance
        return -0.5 * (jnp.log(2.0 * jnp.pi * s) + (y - f) ** 2 / s)

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(jnp.asarray(self.variance, dtype=f.dtype), f.shape)

    def variational_expectation(self, mu, var, y):
        s = self.variance
        y = jnp.asarray(y)
        return jnp.sum(
            -0.5 * (jnp.log(2.0 * jnp.pi * s) + ((y - mu) ** 2 + var) / s)
        )

    def predictive_mean_var(self, mu, var):
        return mu, var + self.variance


@pytree_dataclass
class BernoulliLikelihood(Likelihood):
    """y ∈ {0, 1} with P(y=1|f) = link(f).

    link='probit' (default): Φ(f) — log-concave, and the *predictive*
    probability under N(mu, var) is exact: Φ(mu / √(1 + var)).
    link='logit': σ(f); expectations by quadrature.
    """

    link: str = static_field(default="probit")
    n_gh: int = static_field(default=20)

    def _log_p1(self, f):
        if self.link == "probit":
            return jax.scipy.special.log_ndtr(f)
        return jax.nn.log_sigmoid(f)  # logit

    def log_prob(self, f, y):
        # y·log p1(f) + (1-y)·log p1(-f); symmetric links: P(y=0|f)=P(y=1|-f)
        return jnp.where(y > 0.5, self._log_p1(f), self._log_p1(-f))

    def conditional_mean(self, f):
        return jnp.exp(self._log_p1(f))

    def conditional_variance(self, f):
        p = self.conditional_mean(f)
        return p * (1.0 - p)

    def predictive_mean_var(self, mu, var):
        if self.link == "probit":
            p = jax.scipy.stats.norm.cdf(mu / jnp.sqrt(1.0 + var))
        else:
            p = self._quad(self.conditional_mean, mu, var)
        return p, p * (1.0 - p)


@pytree_dataclass
class PoissonLikelihood(Likelihood):
    """y ∈ ℕ with rate link(f).  link='exp' (default) has a closed-form
    variational expectation:  E[y f − e^f − log y!] = y·mu − e^{mu+var/2}
    − lgamma(y+1).  link='softplus' uses quadrature (avoids rate blow-up)."""

    link: str = static_field(default="exp")
    n_gh: int = static_field(default=20)

    def _rate(self, f):
        return jnp.exp(f) if self.link == "exp" else jax.nn.softplus(f)

    def log_prob(self, f, y):
        if self.link == "exp":
            # y·log(λ) = y·f stays finite where exp(f) overflows (f ≳ 88
            # in f32 would inf/NaN Laplace Newton iterates and quadrature)
            return y * f - jnp.exp(f) - jax.scipy.special.gammaln(y + 1.0)
        lam = self._rate(f)
        return y * jnp.log(lam) - lam - jax.scipy.special.gammaln(y + 1.0)

    def conditional_mean(self, f):
        return self._rate(f)

    def conditional_variance(self, f):
        return self._rate(f)

    def variational_expectation(self, mu, var, y):
        if self.link != "exp":
            return super().variational_expectation(mu, var, y)
        y = jnp.asarray(y)
        return jnp.sum(
            y * mu
            - jnp.exp(mu + 0.5 * var)
            - jax.scipy.special.gammaln(y + 1.0)
        )

    def predictive_mean_var(self, mu, var):
        if self.link != "exp":
            return super().predictive_mean_var(mu, var)
        ey = jnp.exp(mu + 0.5 * var)  # lognormal mean
        vy = ey + (jnp.exp(var) - 1.0) * ey**2  # E[lam] + Var[lam]
        return ey, vy


@pytree_dataclass
class StudentTLikelihood(Likelihood):
    """y | f ~ StudentT(df, loc=f, scale).  Heavy-tailed robust regression;
    expectations by quadrature.  Note: not log-concave — with Laplace, the
    curvature is clipped at zero (documented in `laplace.py`)."""

    df: jnp.ndarray = 4.0
    scale: jnp.ndarray = 1.0
    n_gh: int = static_field(default=20)

    def log_prob(self, f, y):
        v, s = self.df, self.scale
        z = (y - f) / s
        return (
            jax.scipy.special.gammaln((v + 1.0) / 2.0)
            - jax.scipy.special.gammaln(v / 2.0)
            - 0.5 * jnp.log(v * jnp.pi)
            - jnp.log(s)
            - (v + 1.0) / 2.0 * jnp.log1p(z**2 / v)
        )

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        # finite for df > 2
        v, s = self.df, self.scale
        return jnp.broadcast_to(
            jnp.asarray(s**2 * v / (v - 2.0), dtype=f.dtype), f.shape
        )

    def predictive_mean_var(self, mu, var):
        return mu, var + self.scale**2 * self.df / (self.df - 2.0)


__all__ = [
    "Likelihood",
    "GaussianLikelihood",
    "BernoulliLikelihood",
    "PoissonLikelihood",
    "StudentTLikelihood",
]
