"""SVGP (uncollapsed minibatch ELBO, inference/svgp.py) against the
collapsed Titsias bound and the exact posterior.

Key identity tested: at the closed-form optimal Gaussian q, the SVGP bound
EQUALS the collapsed `elbo` (Titsias 2009 is the maximum of Hensman 2013's
bound over q) — a machine-precision check, not a statistical one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu as st
from stheno_tpu import GPPPInput, gppp, logpdf
from stheno_tpu.finite_gp import VFE, elbo, posterior_vfe
from stheno_tpu.graph import GPC
from stheno_tpu.inference import (
    svgp_init,
    svgp_elbo,
    svgp_posterior,
    svgp_optimal_gaussian,
)


def _setup(rng, n=80, m=15, noise=0.1):
    gpc = GPC()
    f = st.GP(1.4 * st.with_lengthscale(st.SEKernel(), 0.8), gpc=gpc)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, n)))
    z = jnp.linspace(-3.0, 3.0, m)
    y = jnp.asarray(
        np.sin(2 * np.asarray(x)) + 0.1 * rng.normal(size=n)
    )
    return f, x, y, z, noise


def test_svgp_elbo_bounds_and_optimum(rng):
    f, x, y, z, noise = _setup(rng)
    fx, fz = f(x, noise), f(z, 1e-9)
    lp = logpdf(fx, y)
    titsias = elbo(VFE(fz), fx, y)

    q0 = svgp_init(fz)
    e0 = svgp_elbo(q0, fx, y)
    assert float(e0) <= float(titsias) <= float(lp)

    q_opt = svgp_optimal_gaussian(q0, fx, y)
    e_opt = svgp_elbo(q_opt, fx, y)
    np.testing.assert_allclose(float(e_opt), float(titsias), rtol=1e-10)


def test_svgp_posterior_at_optimum_equals_vfe_posterior(rng):
    f, x, y, z, noise = _setup(rng)
    fx, fz = f(x, noise), f(z, 1e-9)
    q_opt = svgp_optimal_gaussian(svgp_init(fz), fx, y)
    post_svgp = svgp_posterior(q_opt)
    post_vfe = posterior_vfe(VFE(fz), fx, y)
    xs = jnp.linspace(-2.5, 2.5, 41)
    np.testing.assert_allclose(
        np.asarray(post_svgp.mean(xs)), np.asarray(post_vfe.mean(xs)),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(post_svgp.var(xs)), np.asarray(post_vfe.var(xs)),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(post_svgp.cov2(xs, xs[:5])),
        np.asarray(post_vfe.cov2(xs, xs[:5])),
        atol=1e-9,
    )


def test_svgp_minibatch_unbiasedness(rng):
    """scale·batch data terms sum to the full data term; KL charged once."""
    f, x, y, z, noise = _setup(rng, n=64)
    fz = f(z, 1e-9)
    q = svgp_optimal_gaussian(svgp_init(fz), f(x, noise), y)
    full = svgp_elbo(q, f(x, noise), y, scale=1.0)
    h = 32
    e1 = svgp_elbo(q, f(x[:h], noise), y[:h], scale=1.0)
    e2 = svgp_elbo(q, f(x[h:], noise), y[h:], scale=1.0)
    kl_only = svgp_elbo(q, f(x[:0], noise), y[:0], scale=1.0)  # −KL
    np.testing.assert_allclose(
        float(full), float(e1) + float(e2) - float(kl_only), rtol=1e-10
    )
    # two half-batches at scale=2 average to the full bound
    est = 0.5 * (
        svgp_elbo(q, f(x[:h], noise), y[:h], scale=2.0)
        + svgp_elbo(q, f(x[h:], noise), y[h:], scale=2.0)
    )
    np.testing.assert_allclose(float(est), float(full), rtol=1e-10)


def test_svgp_adam_training_approaches_titsias(rng, key):
    """Joint minibatch training of q recovers most of the collapsed bound."""
    import optax

    f, x, y, z, noise = _setup(rng, n=120, m=12)
    fx, fz = f(x, noise), f(z, 1e-9)
    titsias = float(elbo(VFE(fz), fx, y))

    q = svgp_init(fz)
    params = dict(q_mu=q.q_mu, q_sqrt=q.q_sqrt)
    opt = optax.adam(0.05)
    state = opt.init(params)

    from stheno_tpu.inference.svgp import SVGP

    @jax.jit
    def step(params, state, k):
        idx = jax.random.choice(k, x.shape[0], (40,), replace=False)

        def loss(p):
            qq = SVGP(fz, p["q_mu"], p["q_sqrt"])
            return -svgp_elbo(
                qq, f(x[idx], noise), y[idx], scale=x.shape[0] / 40.0
            )

        val, g = jax.value_and_grad(loss)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, val

    for i in range(300):
        params, state, val = step(params, state, jax.random.fold_in(key, i))
    q_fit = SVGP(fz, params["q_mu"], params["q_sqrt"])
    e_fit = float(svgp_elbo(q_fit, fx, y))
    assert e_fit > titsias - 0.05 * abs(titsias) - 2.0, (e_fit, titsias)


def test_svgp_interdomain_gppp(rng):
    """Inducing points on a latent process of a composite programme."""
    @gppp
    def build(t):
        f1 = st.GP(st.with_lengthscale(st.SEKernel(), 1.0))
        f2 = st.GP(0.3 * st.Matern32Kernel())
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    prog = build({})
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, 50)))
    z = jnp.linspace(-3.0, 3.0, 10)
    y = jnp.asarray(np.sin(np.asarray(x)))
    fx = prog(GPPPInput("f3", x), 0.1)
    fz = prog(GPPPInput("f1", z), 1e-9)  # latent-process pseudo-points
    q = svgp_optimal_gaussian(svgp_init(fz), fx, y)
    e = svgp_elbo(q, fx, y)
    t = elbo(VFE(fz), fx, y)
    np.testing.assert_allclose(float(e), float(t), rtol=1e-9)
    # cross-process prediction from the q-posterior
    post = svgp_posterior(q)
    m2 = post.mean(GPPPInput("f2", jnp.linspace(-1, 1, 7)))
    assert m2.shape == (7,) and bool(jnp.all(jnp.isfinite(m2)))
