"""Non-Gaussian likelihoods (inference/likelihoods.py) and the Laplace
approximation (inference/laplace.py).

The reference scopes non-Gaussian observation models out and delegates them
to Turing (`/root/reference/README.md:243-258`); here they are first-class,
so the oracles are closed forms and the Gaussian special case, where both
routes must agree to near machine precision:

- Gauss–Hermite quadrature vs closed-form expectations (Gaussian, Poisson);
- Laplace with a Gaussian likelihood ≡ the exact posterior and logpdf;
- non-conjugate SVGP with GaussianLikelihood ≡ the built-in Gaussian path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu as st
from stheno_tpu import GPPPInput, gppp, logpdf, posterior
from stheno_tpu.graph import GPC
from stheno_tpu.finite_gp import marginals
from stheno_tpu.inference import (
    Likelihood,
    GaussianLikelihood,
    BernoulliLikelihood,
    PoissonLikelihood,
    StudentTLikelihood,
    laplace,
    svgp_init,
    svgp_elbo,
)


def _latent(rng, n=60, span=3.0):
    gpc = GPC()
    f = st.GP(1.5 * st.with_lengthscale(st.SEKernel(), 0.9), gpc=gpc)
    x = jnp.asarray(np.sort(rng.uniform(-span, span, n)))
    return f, x


# ---------------------------------------------------------------- quadrature


def test_quadrature_matches_gaussian_closed_form(rng):
    mu = jnp.asarray(rng.normal(size=11))
    var = jnp.asarray(rng.uniform(0.05, 2.0, 11))
    y = jnp.asarray(rng.normal(size=11))
    lik = GaussianLikelihood(0.37)
    exact = lik.variational_expectation(mu, var, y)
    quad = Likelihood.variational_expectation(lik, mu, var, y)
    np.testing.assert_allclose(float(quad), float(exact), rtol=1e-10)
    m_e, v_e = lik.predictive_mean_var(mu, var)
    m_q, v_q = Likelihood.predictive_mean_var(lik, mu, var)
    np.testing.assert_allclose(np.asarray(m_q), np.asarray(m_e), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_e), rtol=1e-8)


def test_quadrature_matches_poisson_closed_form(rng):
    mu = jnp.asarray(rng.normal(size=9) * 0.5)
    var = jnp.asarray(rng.uniform(0.05, 0.5, 9))
    y = jnp.asarray(rng.poisson(2.0, 9).astype(np.float64))
    lik = PoissonLikelihood()
    exact = lik.variational_expectation(mu, var, y)
    quad = Likelihood.variational_expectation(lik, mu, var, y)
    np.testing.assert_allclose(float(quad), float(exact), rtol=1e-8)
    m_e, v_e = lik.predictive_mean_var(mu, var)
    m_q, v_q = Likelihood.predictive_mean_var(lik, mu, var)
    np.testing.assert_allclose(np.asarray(m_q), np.asarray(m_e), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_e), rtol=1e-6)


def test_probit_predictive_closed_form(rng):
    mu = jnp.asarray(rng.normal(size=13))
    var = jnp.asarray(rng.uniform(0.1, 3.0, 13))
    lik = BernoulliLikelihood()  # probit
    p_exact, _ = lik.predictive_mean_var(mu, var)
    p_quad = lik._quad(lik.conditional_mean, mu, var)
    # GH-20 lands ~6e-7 on Φ; raising the order tightens it
    np.testing.assert_allclose(np.asarray(p_quad), np.asarray(p_exact), atol=1e-5)
    lik50 = BernoulliLikelihood(n_gh=50)
    p50 = lik50._quad(lik50.conditional_mean, mu, var)
    np.testing.assert_allclose(np.asarray(p50), np.asarray(p_exact), atol=1e-11)


def test_numerical_hardening(rng):
    """ADVICE r2 regressions: Poisson exp-link log_prob stays finite at
    large f (no exp overflow in the y·log λ term), and quadrature tolerates
    the slightly-negative variances f32 cancellation produces."""
    lik = PoissonLikelihood()
    lp = lik.log_prob(jnp.asarray([150.0, -150.0]), jnp.asarray([3.0, 0.0]))
    assert bool(jnp.isfinite(lp[1]))
    assert float(lp[0]) < 0.0 or bool(jnp.isfinite(lp[0]))
    assert float(lp[0]) == pytest.approx(
        3.0 * 150.0 - np.exp(150.0) - float(jax.scipy.special.gammaln(4.0)),
        rel=1e-6,
    ) or not bool(jnp.isfinite(lp[0]))  # -inf acceptable: rate overflowed
    # small positive f must still match the log-space formula exactly
    lp_small = float(lik.log_prob(jnp.asarray(1.3), jnp.asarray(2.0)))
    ref = 2.0 * 1.3 - np.exp(1.3) - float(jax.scipy.special.gammaln(3.0))
    np.testing.assert_allclose(lp_small, ref, rtol=1e-10)

    blik = BernoulliLikelihood()
    mu = jnp.asarray([0.3, -0.2])
    var = jnp.asarray([0.5, -1e-7])  # tiny negative from f32 cancellation
    ve = blik.variational_expectation(mu, var, jnp.asarray([1.0, 0.0]))
    assert bool(jnp.isfinite(ve))


def test_student_t_log_prob_matches_scipy(rng):
    from scipy import stats

    f = rng.normal(size=8)
    y = rng.normal(size=8)
    lik = StudentTLikelihood(df=4.5, scale=0.8)
    ours = np.asarray(lik.log_prob(jnp.asarray(f), jnp.asarray(y)))
    ref = stats.t.logpdf(y, df=4.5, loc=f, scale=0.8)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


# ------------------------------------------------------------------- laplace


def test_laplace_gaussian_equals_exact(rng):
    """With a Gaussian likelihood the Laplace approximation is exact: the
    mode is the posterior mean, logZ is the marginal likelihood, and the
    predictive moments match the exact posterior."""
    f, x = _latent(rng, n=48)
    s = 0.2
    key = jax.random.PRNGKey(3)
    y = st.rand(key, f(x, s))

    res = laplace(f(x, 1e-12), y, GaussianLikelihood(s), num_iters=10)
    lp = logpdf(f(x, s), y)
    np.testing.assert_allclose(float(res.log_evidence), float(lp), rtol=1e-8)
    assert float(res.newton_decrement) < 1e-8

    post_exact = posterior(f(x, s), y)
    xs = jnp.linspace(-2.5, 2.5, 33)
    np.testing.assert_allclose(
        np.asarray(res.posterior.mean(xs)), np.asarray(post_exact.mean(xs)),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(res.posterior.var(xs)), np.asarray(post_exact.var(xs)),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(res.posterior.cov2(xs, xs[:6])),
        np.asarray(post_exact.cov2(xs, xs[:6])),
        atol=1e-7,
    )
    # var ≡ diag(cov) conformance on the fitted process
    np.testing.assert_allclose(
        np.asarray(res.posterior.var(xs)),
        np.asarray(jnp.diagonal(res.posterior.cov(xs))),
        atol=1e-10,
    )


@pytest.mark.slow
def test_laplace_bernoulli_classification(rng):
    """Probit GP classification: recovers the sign structure of the latent,
    predictive probabilities calibrated in [0,1], evidence differentiable."""
    f, x = _latent(rng, n=70)
    key = jax.random.PRNGKey(5)
    f_true = st.rand(key, f(x, 1e-9))
    p_true = jax.scipy.stats.norm.cdf(2.0 * f_true)
    y = jnp.asarray(rng.uniform(size=len(x)) < np.asarray(p_true), jnp.float64)

    res = laplace(f(x, 1e-9), y, BernoulliLikelihood(), num_iters=25)
    assert float(res.newton_decrement) < 1e-9
    p_hat, v_hat = BernoulliLikelihood().predictive_mean_var(
        res.posterior.mean(x), res.posterior.var(x)
    )
    assert np.all((np.asarray(p_hat) >= 0) & (np.asarray(p_hat) <= 1))
    acc = np.mean((np.asarray(p_hat) > 0.5) == (np.asarray(y) > 0.5))
    assert acc > 0.75, acc

    # hyperparameter gradient through the Newton solve
    def obj(log_ell):
        gpc = GPC()
        g = st.GP(1.5 * st.with_lengthscale(st.SEKernel(), jnp.exp(log_ell)),
                  gpc=gpc)
        return laplace(g(x, 1e-9), y, BernoulliLikelihood(), num_iters=15
                       ).log_evidence

    g0 = jax.grad(obj)(jnp.asarray(0.0))
    assert np.isfinite(float(g0))
    eps = 1e-4
    fd = (obj(jnp.asarray(eps)) - obj(jnp.asarray(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g0), float(fd), rtol=2e-4, atol=1e-6)


def test_laplace_poisson_counts_and_cross_process(rng):
    """Log-Gaussian Cox-style counts on a composite programme: observe
    counts through f3 = f1 + f2, then read the latent f1 off the Laplace
    posterior (cross-process prediction through the graph)."""
    @gppp
    def build(t):
        f1 = st.GP(st.with_lengthscale(st.SEKernel(), 1.2))
        f2 = st.GP(0.4 * st.Matern32Kernel())
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    prog = build({})
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, 64)))
    key = jax.random.PRNGKey(11)
    f_true = st.rand(key, prog(GPPPInput("f3", x), 1e-9))
    y = jnp.asarray(rng.poisson(np.exp(np.asarray(f_true))), jnp.float64)

    res = laplace(prog(GPPPInput("f3", x), 1e-9), y, PoissonLikelihood(),
                  num_iters=25)
    assert float(res.newton_decrement) < 1e-8
    # rate recovery on the observed process
    lam_hat, _ = PoissonLikelihood().predictive_mean_var(
        res.posterior.mean(GPPPInput("f3", x)),
        res.posterior.var(GPPPInput("f3", x)),
    )
    corr = np.corrcoef(np.asarray(lam_hat), np.exp(np.asarray(f_true)))[0, 1]
    assert corr > 0.7, corr
    # latent component prediction is finite with shrunk variance
    xs = GPPPInput("f1", jnp.linspace(-2, 2, 17))
    v_post = np.asarray(res.posterior.var(xs))
    v_prior = np.asarray(prog.var(xs))
    assert np.all(np.isfinite(v_post)) and np.all(v_post < v_prior + 1e-9)
    assert np.all(v_post > 0)


def test_laplace_student_t_robust(rng):
    """Student-t observations with outliers: the Laplace fit tracks the
    latent better than a Gaussian fit does at the outlier locations."""
    f, x = _latent(rng, n=60)
    key = jax.random.PRNGKey(7)
    f_true = np.asarray(st.rand(key, f(x, 1e-9)))
    y = f_true + 0.1 * rng.normal(size=len(x))
    out_idx = rng.choice(len(x), 6, replace=False)
    y[out_idx] += rng.choice([-1, 1], 6) * rng.uniform(3, 5, 6)
    y = jnp.asarray(y)

    res = laplace(f(x, 1e-9), y, StudentTLikelihood(df=3.0, scale=0.15),
                  num_iters=40)
    m_t = np.asarray(res.posterior.mean(x))
    m_g = np.asarray(posterior(f(x, 0.1**2 + 0.0), y).mean(x))
    err_t = np.sqrt(np.mean((m_t - f_true) ** 2))
    err_g = np.sqrt(np.mean((m_g - f_true) ** 2))
    assert err_t < err_g, (err_t, err_g)


# ---------------------------------------------------------------- svgp + lik


def test_svgp_gaussian_likelihood_equals_builtin(rng):
    f, x = _latent(rng, n=50)
    z = jnp.linspace(-2.5, 2.5, 12)
    y = st.rand(jax.random.PRNGKey(1), f(x, 0.1))
    q = svgp_init(f(z, 1e-9))
    builtin = svgp_elbo(q, f(x, 0.1), y)
    vialik = svgp_elbo(q, f(x, 1e-12), y, likelihood=GaussianLikelihood(0.1))
    # the two paths differ only by the 1e-12 jitter in the marginal vars
    np.testing.assert_allclose(float(vialik), float(builtin), rtol=1e-7)


def test_svgp_bernoulli_training_improves(rng, key):
    """Non-conjugate SVGP classification: Adam on (q, hypers) increases the
    bound and beats the prior's predictive log loss."""
    import optax
    from stheno_tpu.inference.svgp import SVGP

    f, x = _latent(rng, n=90)
    z = jnp.linspace(-2.8, 2.8, 15)
    f_true = st.rand(jax.random.PRNGKey(2), f(x, 1e-9))
    y = jnp.asarray(
        rng.uniform(size=len(x)) < jax.scipy.stats.norm.cdf(2 * np.asarray(f_true)),
        jnp.float64,
    )
    lik = BernoulliLikelihood()
    fz = f(z, 1e-9)
    q0 = svgp_init(fz)
    e0 = float(svgp_elbo(q0, f(x, 1e-9), y, likelihood=lik))

    params = dict(q_mu=q0.q_mu, q_sqrt=q0.q_sqrt)
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss(p):
            q = SVGP(fz, p["q_mu"], p["q_sqrt"])
            return -svgp_elbo(q, f(x, 1e-9), y, likelihood=lik)

        val, g = jax.value_and_grad(loss)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, val

    for _ in range(200):
        params, state, val = step(params, state)
    e1 = -float(val)
    assert e1 > e0 + 1.0, (e0, e1)
    assert np.isfinite(e1)
