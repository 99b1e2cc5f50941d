"""State-space (Markov) GP inference (stheno_tpu/markov.py).

Oracles (the dense GP path is exact, so every check is deterministic):
- `markov_gp_logpdf` ≡ dense `logpdf(GP(k)(x, noise), y)` for every
  supported kernel-algebra form, sequential AND parallel
  (associative-scan) filters;
- posterior marginals at off-grid prediction sites ≡ dense
  `marginals(posterior(...)(x_star))`;
- hyperparameter gradient through the parallel filter ≡ finite
  differences;
- non-Markov kernels raise TypeError.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu as st
from stheno_tpu.graph import GPC
from stheno_tpu.markov import (
    markov_gp_logpdf,
    markov_gp_posterior_marginals,
    sde_representation,
)

MARKOV_KERNELS = [
    st.Matern12Kernel(),
    st.Matern32Kernel(),
    st.Matern52Kernel(),
    2.3 * st.with_lengthscale(st.Matern32Kernel(), 0.7),
    1.5 * st.with_lengthscale(st.Matern52Kernel(), 1.2)
    + 0.4 * st.Matern12Kernel(),
]


def _data(seed, n, noise):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, n)))
    return x, noise


@pytest.mark.parametrize("k", MARKOV_KERNELS,
                         ids=["m12", "m32", "m52", "scaled", "sum"])
@pytest.mark.parametrize("parallel", [False, True], ids=["seq", "par"])
def test_logpdf_matches_dense(k, parallel):
    x, noise = _data(0, 201, 0.1)
    f = st.GP(k, gpc=GPC())
    y = st.rand(jax.random.PRNGKey(1), f(x, noise))
    lp_dense = float(st.logpdf(f(x, noise), y))
    lp = float(jax.jit(
        lambda yy: markov_gp_logpdf(k, x, yy, noise, parallel=parallel)
    )(y))
    assert abs(lp - lp_dense) < 1e-8 * max(1.0, abs(lp_dense))


def test_posterior_marginals_match_dense():
    k = 1.5 * st.with_lengthscale(st.Matern32Kernel(), 0.8)
    x, noise = _data(2, 180, 0.05)
    f = st.GP(k, gpc=GPC())
    y = st.rand(jax.random.PRNGKey(2), f(x, noise))
    xs = jnp.linspace(-3.5, 3.5, 97)  # off-grid, straddles the data range
    post = st.posterior(f(x, noise), y)
    md, vd = st.marginals(post(xs, 0.0))
    mm, vm = markov_gp_posterior_marginals(k, x, y, noise, x_star=xs)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(md), atol=1e-10)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vd), atol=1e-10)


def test_posterior_marginals_default_sites():
    k = st.Matern52Kernel()
    x, noise = _data(3, 120, 0.2)
    f = st.GP(k, gpc=GPC())
    y = st.rand(jax.random.PRNGKey(3), f(x, noise))
    post = st.posterior(f(x, noise), y)
    md, vd = st.marginals(post(x, 0.0))
    mm, vm = markov_gp_posterior_marginals(k, x, y, noise)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(md), atol=1e-10)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vd), atol=1e-10)


def test_per_point_noise():
    k = st.Matern32Kernel()
    x, _ = _data(4, 90, None)
    rng = np.random.default_rng(4)
    noise = jnp.asarray(rng.uniform(0.05, 0.4, 90))
    f = st.GP(k, gpc=GPC())
    y = st.rand(jax.random.PRNGKey(4), f(x, st.DiagNoise(noise)))
    lp_dense = float(st.logpdf(f(x, st.DiagNoise(noise)), y))
    lp = float(markov_gp_logpdf(k, x, y, noise))
    assert abs(lp - lp_dense) < 1e-8 * abs(lp_dense)


def test_hyperparameter_gradient_fd():
    x, noise = _data(5, 150, 0.05)
    f = st.GP(st.with_lengthscale(st.Matern32Kernel(), 0.8), gpc=GPC())
    y = st.rand(jax.random.PRNGKey(5), f(x, noise))

    def lp(log_l, log_v):
        k = jnp.exp(log_v) * st.with_lengthscale(
            st.Matern32Kernel(), jnp.exp(log_l))
        return markov_gp_logpdf(k, x, y, noise)

    g = jax.grad(lp, argnums=(0, 1))(jnp.asarray(-0.2), jnp.asarray(0.3))
    eps = 1e-6
    for i, gi in enumerate(g):
        args = [-0.2, 0.3]
        up, dn = list(args), list(args)
        up[i] += eps
        dn[i] -= eps
        fd = (lp(*map(jnp.asarray, up)) - lp(*map(jnp.asarray, dn))) / (
            2 * eps)
        np.testing.assert_allclose(float(gi), float(fd), rtol=1e-5)


def test_parallel_smoother_matches_sequential():
    from stheno_tpu.markov import (
        _parallel_filter,
        _parallel_smoother,
        _prep,
        _rts_smoother,
    )

    k = 1.5 * st.with_lengthscale(st.Matern52Kernel(), 0.8)
    x, noise = _data(7, 257, 0.1)
    f = st.GP(k, gpc=GPC())
    y = st.rand(jax.random.PRNGKey(7), f(x, noise))
    A, Q, H, ya, r, _ = _prep(k, x, y, noise, None)
    mask = jnp.ones(ya.shape, bool)
    m_f, P_f = _parallel_filter(A, Q, H, ya, r, mask)
    ms1, Ps1 = _rts_smoother(A, Q, m_f, P_f)
    ms2, Ps2 = _parallel_smoother(A, Q, m_f, P_f)
    np.testing.assert_allclose(np.asarray(ms2), np.asarray(ms1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ps2), np.asarray(Ps1), atol=1e-12)


def test_non_markov_kernels_raise():
    for k in [st.SEKernel(), st.PeriodicKernel(r=jnp.asarray(1.0)),
              st.Matern32Kernel() * st.Matern12Kernel()]:
        with pytest.raises(TypeError):
            sde_representation(k)


def test_f32_runs_and_is_close():
    k = 1.5 * st.with_lengthscale(st.Matern52Kernel(), 1.0)
    x, noise = _data(6, 400, 0.1)
    f = st.GP(k, gpc=GPC())
    y = st.rand(jax.random.PRNGKey(6), f(x, noise))
    lp64 = float(markov_gp_logpdf(k, x, y, noise))
    lp32 = float(markov_gp_logpdf(
        k, x.astype(jnp.float32), y.astype(jnp.float32),
        np.float32(noise), dtype=jnp.float32))
    assert np.isfinite(lp32)
    assert abs(lp32 - lp64) < 5e-3 * abs(lp64)


def test_stationary_prior_marginal():
    """The k=0 filter step must land exactly on the prior marginal: a
    single observation's logpdf is log N(y; 0, k(0,0) + noise)."""
    for k in MARKOV_KERNELS:
        var = float(k.diag_same(jnp.asarray([0.0]))[0])
        y0, noise = 0.37, 0.2
        lp = float(markov_gp_logpdf(k, jnp.asarray([1.3]),
                                    jnp.asarray([y0]), noise))
        s = var + noise
        ref = -0.5 * (np.log(2 * np.pi * s) + y0**2 / s)
        np.testing.assert_allclose(lp, ref, rtol=1e-12)
