"""VFE / Titsias ELBO + approximate posterior + SparseFiniteGP
(reference src/gp/sparse_finite_gp.jl tests + SURVEY.md §3.5)."""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu import (
    GPPPInput,
    BlockData,
    gppp,
    logpdf,
    rand,
    posterior,
    elbo,
    VFE,
    posterior_vfe,
    SparseFiniteGP,
    marginals,
)
from stheno_tpu.graph import GPC


@gppp
def simple_model():
    f1 = st.GP(st.SEKernel())
    f2 = st.GP(st.Matern52Kernel())
    f3 = f1 + f2
    return dict(f1=f1, f2=f2, f3=f3)


def test_elbo_lower_bounds_logpdf(rng, key):
    """ELBO < exact logpdf always (reference test/gp/sparse_finite_gp.jl:40-41)."""
    gpc = GPC()
    f = st.GP(st.Matern32Kernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(0, 1, size=40))
    z = jnp.linspace(0.0, 1.0, 11)
    fx = f(x, 0.2)
    y = rand(key, fx)
    el = elbo(VFE(f(z, 1e-9)), fx, y)
    lp = logpdf(fx, y)
    assert el < lp
    assert np.isfinite(el)


def test_elbo_tight_when_z_equals_x(rng, key):
    """elbo → logpdf as Z → X (reference README.md:78 claim)."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(0, 1, size=15))
    fx = f(x, 0.3)
    y = rand(key, fx)
    el = elbo(VFE(f(x, 1e-9)), fx, y)
    lp = logpdf(fx, y)
    np.testing.assert_allclose(el, lp, rtol=1e-6)


def test_vfe_posterior_matches_titsias_oracle(rng, key):
    """Approximate posterior mean/cov vs direct numpy Titsias formulas."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(-2, 2, size=25))
    z = jnp.asarray(np.linspace(-2, 2, 7))
    xp = jnp.asarray(rng.uniform(-2, 2, size=6))
    s = 0.2
    fx = f(x, s)
    y = np.asarray(rand(key, fx))

    jitter = 1e-9
    ap = posterior_vfe(VFE(f(z, jitter)), fx, y)

    Kuu = np.asarray(st.kernelmatrix(st.SEKernel(), z)) + jitter * np.eye(7)
    Kuf = np.asarray(st.kernelmatrix(st.SEKernel(), z, x))
    Kus = np.asarray(st.kernelmatrix(st.SEKernel(), z, xp))
    Kss = np.asarray(st.kernelmatrix(st.SEKernel(), xp))

    C = Kuu + Kuf @ Kuf.T / s
    m_exp = Kus.T @ np.linalg.solve(C, Kuf @ y / s)
    C_exp = (
        Kss
        - Kus.T @ np.linalg.solve(Kuu, Kus)
        + Kus.T @ np.linalg.solve(C, Kus)
    )

    np.testing.assert_allclose(ap.mean(xp), m_exp, atol=1e-7)
    np.testing.assert_allclose(ap.cov(xp), C_exp, atol=1e-7)
    np.testing.assert_allclose(ap.var(xp), np.diagonal(C_exp), atol=1e-7)


def test_vfe_posterior_approaches_exact(rng, key):
    """With Z = X the VFE posterior equals the exact posterior."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(-2, 2, size=12))
    xp = jnp.asarray(rng.uniform(-2, 2, size=5))
    fx = f(x, 0.3)
    y = rand(key, fx)
    exact = posterior(fx, y)
    approx = posterior_vfe(VFE(f(x, 1e-10)), fx, y)
    np.testing.assert_allclose(approx.mean(xp), exact.mean(xp), atol=1e-5)
    np.testing.assert_allclose(approx.cov(xp), exact.cov(xp), atol=1e-5)


def test_interdomain_pseudo_points_gppp(rng, key):
    """Pseudo-points in a LATENT process of a GPPP (the gppp_and_pseudo_points
    workload, BASELINE.json config #2): observe :f3, inducing points in :f1."""
    f = simple_model()
    x = jnp.asarray(rng.uniform(-3, 3, size=30))
    z = jnp.asarray(np.linspace(-3, 3, 10))
    fx = f(GPPPInput("f3", x), 0.2)
    y = rand(key, fx)

    u_latent = f(GPPPInput("f1", z), 1e-9)
    el = elbo(VFE(u_latent), fx, y)
    lp = logpdf(fx, y)
    assert np.isfinite(el)
    assert el < lp

    # pseudo-points in BOTH f1 and f2 capture everything as z grows dense
    z_dense = jnp.asarray(np.linspace(-3.2, 3.2, 40))
    u_both = f(
        BlockData(GPPPInput("f1", z_dense), GPPPInput("f2", z_dense)), 1e-9
    )
    el_both = elbo(VFE(u_both), fx, y)
    assert el_both < lp
    assert el_both > el  # richer inducing family → tighter bound
    np.testing.assert_allclose(el_both, lp, atol=0.2)

    # approximate posterior supports cross-process prediction
    ap = posterior_vfe(VFE(u_both), fx, y)
    xp = jnp.asarray(np.linspace(-3, 3, 8))
    m1 = ap.mean(GPPPInput("f1", xp))
    m3 = ap.mean(GPPPInput("f3", xp))
    assert np.all(np.isfinite(m1)) and np.all(np.isfinite(m3))


def test_sparse_finite_gp_sugar(rng, key):
    """SparseFiniteGP: logpdf ≡ elbo; posterior ≡ VFE posterior; cov raises
    (src/gp/sparse_finite_gp.jl:39-62)."""
    gpc = GPC()
    f = st.GP(st.Matern32Kernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(0, 1, size=20))
    z = jnp.linspace(0.0, 1.0, 6)
    fobs = f(x, 0.1)
    fz = f(z, 1e-9)
    fxu = SparseFiniteGP(fobs, fz)
    y = rand(key, fxu)

    np.testing.assert_allclose(logpdf(fxu, y), elbo(VFE(fz), fobs, y))
    assert logpdf(fxu, y) < logpdf(fobs, y)

    with pytest.raises(RuntimeError):
        fxu.cov()

    ap = posterior(fxu, y)
    ap2 = posterior_vfe(VFE(fz), fobs, y)
    xp = jnp.asarray(rng.uniform(0, 1, size=4))
    np.testing.assert_allclose(ap.mean(xp), ap2.mean(xp))

    # column-wise logpdf for matrices (:56-58)
    Y = rand(key, fxu, 3)
    lps = logpdf(fxu, Y)
    assert lps.shape == (3,)


def test_elbo_grad_is_finite_and_jits(rng, key):
    """ELBO hyperparameter gradients — the VI optimisation hot loop."""
    x = jnp.asarray(rng.uniform(-2, 2, size=25))
    y = jnp.asarray(rng.normal(size=25))

    @gppp
    def build(theta):
        f1 = st.GP(theta["v"] * st.SEKernel())
        f2 = st.GP(st.with_lengthscale(st.Matern52Kernel(), theta["l"]))
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    def neg_elbo(theta):
        f = build(theta)
        fx = f(GPPPInput("f3", x), theta["noise"])
        u = f(GPPPInput("f1", theta["z"]), 1e-9)
        return -elbo(VFE(u), fx, y)

    theta = dict(
        v=jnp.asarray(1.0),
        l=jnp.asarray(0.7),
        noise=jnp.asarray(0.2),
        z=jnp.linspace(-2, 2, 8),
    )
    val, grad = jax.jit(jax.value_and_grad(neg_elbo))(theta)
    assert np.isfinite(val)
    flat, _ = jax.flatten_util.ravel_pytree(grad)
    assert np.all(np.isfinite(flat))
    # FD spot-check on the scalar params
    eps = 1e-6
    for k in ["v", "l", "noise"]:
        tp = dict(theta); tp[k] = theta[k] + eps
        tm = dict(theta); tm[k] = theta[k] - eps
        fd = (neg_elbo(tp) - neg_elbo(tm)) / (2 * eps)
        np.testing.assert_allclose(grad[k], fd, rtol=1e-4, atol=1e-6)


def test_posterior_vfe_reference_signature(rng, key):
    """posterior(VFE(u), fx, y) — the reference's call signature."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(0, 1, 15))
    z = jnp.linspace(0, 1, 5)
    fx = f(x, 0.2)
    y = rand(key, fx)
    ap1 = posterior(VFE(f(z, 1e-9)), fx, y)
    ap2 = posterior_vfe(VFE(f(z, 1e-9)), fx, y)
    xp = jnp.asarray(rng.uniform(0, 1, 4))
    np.testing.assert_allclose(ap1.mean(xp), ap2.mean(xp))
    np.testing.assert_allclose(ap1.var(xp), ap2.var(xp))
