"""FiniteGP inference verbs: logpdf/rand/posterior/marginals vs scipy-style
numpy oracles, MC statistical tests, dtype stability, and the end-to-end
process_decomposition workload (BASELINE.json config #1 — the README example:
f3 = f1 + f2, observe f3, recover posteriors over f1/f2/f3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu import (
    GPPPInput,
    BlockData,
    gppp,
    split,
    logpdf,
    rand,
    posterior,
    marginals,
    cov,
)
from stheno_tpu.graph import GPC
from stheno_tpu.utils.testing import check_finite_gp


def _np_mvn_logpdf(y, m, K):
    n = len(y)
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(L, y - m)
    return -0.5 * (n * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + a @ a)


@gppp
def simple_model():
    f1 = st.GP(st.SEKernel())
    f2 = st.GP(st.Matern52Kernel())
    f3 = f1 + f2
    return dict(f1=f1, f2=f2, f3=f3)


def test_logpdf_vs_numpy_oracle(rng, key):
    x = jnp.asarray(rng.normal(size=8))
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    fx = f(x, 0.3)
    y = rand(key, fx)
    lp = logpdf(fx, y)
    K = np.asarray(st.kernelmatrix(st.SEKernel(), x)) + 0.3 * np.eye(8)
    np.testing.assert_allclose(lp, _np_mvn_logpdf(np.asarray(y), np.zeros(8), K), rtol=1e-9)


def test_finite_gp_interface(rng, key):
    x = jnp.asarray(rng.normal(size=6))
    f = simple_model()
    fx = f(GPPPInput("f3", x), 0.1)
    check_finite_gp(key, fx)


def test_rand_moments(rng, key):
    """MC convergence of rand (reference test/gp/util.jl:36-47, S=100k,
    tolerance 1e-2-ish)."""
    x = jnp.asarray(rng.normal(size=4))
    gpc = GPC()
    f = st.GP(st.Matern32Kernel(), gpc=gpc)
    fx = f(x, 0.1)
    S = 200_000
    ys = rand(key, fx, S)
    m_emp = np.mean(np.asarray(ys), axis=1)
    K_emp = np.cov(np.asarray(ys))
    np.testing.assert_allclose(m_emp, fx.mean(), atol=2e-2)
    np.testing.assert_allclose(K_emp, fx.cov(), atol=3e-2)


def test_rand_deterministic(key, rng):
    x = jnp.asarray(rng.normal(size=5))
    f = simple_model()
    fx = f(GPPPInput("f1", x), 0.1)
    y1 = rand(key, fx)
    y2 = rand(key, fx)
    np.testing.assert_array_equal(y1, y2)


def test_posterior_closed_form(rng, key):
    """Posterior mean/cov vs the standard GP-regression formulas."""
    x = jnp.asarray(rng.normal(size=7))
    xp = jnp.asarray(rng.normal(size=5))
    noise = 0.25
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    y = rand(key, f(x, noise))
    post = posterior(f(x, noise), y)

    K = np.asarray(st.kernelmatrix(st.SEKernel(), x)) + noise * np.eye(7)
    Ks = np.asarray(st.kernelmatrix(st.SEKernel(), xp, x))
    Kss = np.asarray(st.kernelmatrix(st.SEKernel(), xp))
    m_exp = Ks @ np.linalg.solve(K, np.asarray(y))
    C_exp = Kss - Ks @ np.linalg.solve(K, Ks.T)

    np.testing.assert_allclose(post.mean(xp), m_exp, atol=1e-9)
    np.testing.assert_allclose(post.cov(xp), C_exp, atol=1e-9)
    np.testing.assert_allclose(post.var(xp), np.diagonal(C_exp), atol=1e-9)
    # posterior at the observations reproduces the data as noise→0
    post0 = posterior(f(x, 1e-12), y)
    np.testing.assert_allclose(post0.mean(x), y, atol=1e-4)


def test_process_decomposition_end_to_end(rng, key):
    """BASELINE.json workload #1 (reference README example / the
    process_decomposition example): observe f3 = f1 + f2, predict all three
    processes, verify joint-consistency and that posterior samples satisfy
    y1 + y2 ≈ y3."""
    f = simple_model()
    x = jnp.asarray(np.sort(rng.uniform(-5, 5, size=21)))
    xp = jnp.asarray(np.linspace(-6, 6, 30))

    # sample a joint prior draw over (f1, f2, f3) at x: check additivity
    x_all = BlockData(
        GPPPInput("f1", x), GPPPInput("f2", x), GPPPInput("f3", x)
    )
    y_all = rand(key, f(x_all, 1e-12))
    y1, y2, y3 = split(x_all, y_all)
    np.testing.assert_allclose(y1 + y2, y3, atol=1e-4)

    # observe f3, posterior over everything
    noise = 0.05
    fx = f(GPPPInput("f3", x), noise)
    y_obs = rand(jax.random.PRNGKey(7), fx)
    lp = logpdf(fx, y_obs)
    assert np.isfinite(lp)

    post = posterior(fx, y_obs)
    xp_all = BlockData(
        GPPPInput("f1", xp), GPPPInput("f2", xp), GPPPInput("f3", xp)
    )
    ms = marginals(post(xp_all, 1e-12))
    m1, m2, m3 = split(xp_all, ms.mean)
    v1, v2, v3 = split(xp_all, ms.var)
    # posterior means of components sum to the posterior mean of f3
    np.testing.assert_allclose(m1 + m2, m3, atol=1e-8)
    # posterior variance of f3 at the observations is ≈ tiny
    post_at_obs = post(GPPPInput("f3", x), 1e-12)
    assert np.all(np.asarray(post_at_obs.var()) < noise * 1.2)
    # but component variances stay strictly positive (can't de-mix fully)
    assert np.all(np.asarray(v1) > 1e-3)
    assert np.all(np.asarray(v2) > 1e-3)

    # posterior samples also satisfy additivity
    ys = rand(key, post(xp_all, 1e-12), 11)
    s1, s2, s3 = split(xp_all, ys)
    np.testing.assert_allclose(s1 + s2, s3, atol=1e-4)

    # oracle check of the full posterior mean via numpy on the joint system
    K_obs = np.asarray(f.cov(GPPPInput("f3", x))) + noise * np.eye(21)
    K_cross = np.asarray(f.cov2(xp_all, GPPPInput("f3", x)))
    m_exp = K_cross @ np.linalg.solve(K_obs, np.asarray(y_obs))
    np.testing.assert_allclose(ms.mean, m_exp, atol=1e-8)


def test_posterior_of_posterior(rng, key):
    """Sequential conditioning == joint conditioning."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x1 = jnp.asarray(rng.normal(size=5))
    x2 = jnp.asarray(rng.normal(size=4))
    xp = jnp.asarray(rng.normal(size=3))
    y12 = rand(key, f(jnp.concatenate([x1, x2]), 0.1))
    y1, y2 = y12[:5], y12[5:]

    post_joint = posterior(f(jnp.concatenate([x1, x2]), 0.1), y12)
    post_seq = posterior(posterior(f(x1, 0.1), y1)(x2, 0.1), y2)

    np.testing.assert_allclose(post_seq.mean(xp), post_joint.mean(xp), atol=1e-8)
    np.testing.assert_allclose(post_seq.cov(xp), post_joint.cov(xp), atol=1e-8)


def test_cross_finite_gp_cov(rng):
    """cov(fx, gx) between FiniteGPs of different processes
    (src/gp/util.jl:12-14)."""
    f = simple_model()
    x = jnp.asarray(rng.normal(size=4))
    x2 = jnp.asarray(rng.normal(size=3))
    fx = f(GPPPInput("f3", x), 0.1)
    gx = f(GPPPInput("f1", x2), 0.1)
    C = cov(fx, gx)
    np.testing.assert_allclose(
        C, f.cov2(GPPPInput("f3", x), GPPPInput("f1", x2)), atol=1e-12
    )


def test_logpdf_grad_and_jit(rng, key):
    """The build_model(θ) pattern: logpdf differentiable w.r.t.
    hyperparameters through model construction, under jit."""
    x = jnp.asarray(rng.normal(size=10))
    y = jnp.asarray(rng.normal(size=10))

    @gppp
    def build(theta):
        f1 = st.GP(theta["v1"] * st.SEKernel())
        f2 = st.GP(st.with_lengthscale(st.Matern32Kernel(), theta["l2"]))
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    def nlml(theta):
        f = build(theta)
        return -logpdf(f(GPPPInput("f3", x), theta["noise"]), y)

    theta = dict(
        v1=jnp.asarray(1.2), l2=jnp.asarray(0.8), noise=jnp.asarray(0.3)
    )
    val, grad = jax.jit(jax.value_and_grad(nlml))(theta)
    assert np.isfinite(val)
    for k, g in grad.items():
        assert np.isfinite(g), k
    # finite-difference check (reference adjoint_test pattern,
    # test/test_util.jl:78-96)
    eps = 1e-6
    for k in theta:
        tp = dict(theta)
        tp[k] = theta[k] + eps
        tm = dict(theta)
        tm[k] = theta[k] - eps
        fd = (nlml(tp) - nlml(tm)) / (2 * eps)
        np.testing.assert_allclose(grad[k], fd, rtol=1e-4, atol=1e-6)


def test_float32_dtype_stability(rng, key):
    """Float32 in → Float32 out (reference test/gp/util.jl:76-89)."""
    x = jnp.asarray(rng.normal(size=5), dtype=jnp.float32)
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    fx = f(x, jnp.asarray(0.1, dtype=jnp.float32))
    y = rand(key, fx)
    assert y.dtype == jnp.float32
    assert logpdf(fx, y).dtype == jnp.float32
    assert marginals(fx).mean.dtype == jnp.float32
