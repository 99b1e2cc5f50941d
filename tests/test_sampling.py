"""Pathwise sampling (stheno_tpu/sampling.py): RFF spectral bases and the
Matheron pathwise-conditioning update.

Oracles:
- E[φ(x)ᵀφ(y)] must converge to kernelmatrix for every supported kernel
  (statistical, O(1/√F));
- joint functional prior draws of a composite programme must reproduce the
  programme's cross-process covariance (the graph recursion is the oracle);
- pathwise-conditioned draws must match the exact posterior's marginals —
  including evaluated on a process OTHER than the observed one;
- derivative sample paths: d/dx of the RFF path is an exact derivative, so
  empirical cov of sampled f′ must match DerivativeGP's cov.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu as st
from stheno_tpu import GPPPInput, BlockData, gppp, posterior
from stheno_tpu.graph import GPC, derivative
from stheno_tpu.kernels.base import TransformedKernel, kernelmatrix
from stheno_tpu.sampling import (
    spectral_features,
    prior_samples,
    pathwise_conditioned_samples,
)


KERNELS = [
    st.SEKernel(),
    st.Matern12Kernel(),
    st.Matern32Kernel(),
    st.Matern52Kernel(),
    st.RationalQuadraticKernel(alpha=1.7),
    2.3 * st.with_lengthscale(st.SEKernel(), 0.7),
    st.with_lengthscale(st.Matern32Kernel(), 1.4),
    st.SEKernel() + 0.5 * st.Matern52Kernel(),
    st.SEKernel() * st.Matern12Kernel(),
    # regression (ADVICE r2): lengthscale OVER a non-linear input transform
    # must divide the transform's input, not fold into ω
    st.with_lengthscale(TransformedKernel(st.SEKernel(), jnp.sin), 0.6),
]


@pytest.mark.parametrize("ki", range(len(KERNELS)))
def test_rff_basis_approximates_kernel(ki, key):
    """Monte-Carlo over bases: mean of φφᵀ over R independent bases → K."""
    k = KERNELS[ki]
    x = jnp.linspace(-2.0, 2.0, 25)
    K = kernelmatrix(k, x)
    F, R = 4096, 8
    acc = 0.0
    for r in range(R):
        basis = spectral_features(k, jax.random.fold_in(key, r), F)
        phi = basis(x)  # (n, F)
        acc = acc + phi @ phi.T
    err = float(jnp.max(jnp.abs(acc / R - K)))
    assert err < 0.05, (type(k).__name__, err)


def test_spectral_unsupported_raises(key):
    with pytest.raises(NotImplementedError):
        spectral_features(st.LinearKernel(), key, 64)


@pytest.mark.slow
def test_prior_samples_match_joint_cov(key):
    """Empirical covariance of functional draws of f3 = f1 + stretch(f2)
    matches the graph's joint covariance, including the f3↔f1 cross block."""

    @gppp
    def build(t):
        f1 = st.GP(st.with_lengthscale(st.SEKernel(), 1.2))
        f2 = st.GP(0.5 * st.Matern32Kernel())
        return dict(f1=f1, f2=f2, f3=f1 + st.stretch(f2, 2.0))

    prog = build({})
    x = jnp.linspace(-2.0, 2.0, 20)
    S, F = 60000, 2048
    draws = prior_samples(prog, key, S, num_features=F)
    xs = BlockData(GPPPInput("f3", x), GPPPInput("f1", x))
    Y = draws(xs)  # (S, 2n)
    emp = np.cov(np.asarray(Y).T)
    K = np.asarray(prog.cov(xs))
    assert np.max(np.abs(emp - K)) < 0.08, np.max(np.abs(emp - K))
    # means too
    assert np.max(np.abs(np.asarray(Y).mean(0))) < 0.05


@pytest.mark.slow
def test_pathwise_posterior_matches_exact(key):
    """Conditioned paths: empirical mean/var at new inputs — on the observed
    process AND a latent component — match the exact posterior."""

    @gppp
    def build(t):
        f1 = st.GP(st.with_lengthscale(st.SEKernel(), 1.0))
        f2 = st.GP(0.4 * st.Matern32Kernel())
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    prog = build({})
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, 40)))
    y = jnp.asarray(np.sin(np.asarray(x)))
    noise = 0.05
    fx = prog(GPPPInput("f3", x), noise)

    S, F = 40000, 4096
    samp = pathwise_conditioned_samples(fx, y, key, S, num_features=F)
    post = posterior(fx, y)

    for tag in ("f3", "f1"):
        xs = GPPPInput(tag, jnp.linspace(-2.5, 2.5, 15))
        Y = np.asarray(samp(xs))
        m_exact = np.asarray(post.mean(xs))
        v_exact = np.asarray(post.var(xs))
        assert np.max(np.abs(Y.mean(0) - m_exact)) < 0.05, tag
        assert np.max(np.abs(Y.var(0) - v_exact)) < 0.08, tag


def test_pathwise_sample_is_coherent_function(key):
    """The SAME draw evaluated twice at overlapping inputs agrees pointwise
    (it is one function, not a fresh finite-dimensional sample)."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x = jnp.linspace(-2, 2, 30)
    y = jnp.sin(x)
    samp = pathwise_conditioned_samples(f(x, 0.1), y, key, 3, num_features=256)
    a = np.asarray(samp(jnp.linspace(-1, 1, 9)))
    b = np.asarray(samp(jnp.linspace(-1, 1, 17)))[:, ::2]
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_derivative_sample_paths(key):
    """Sampling f′ differentiates the RFF path exactly: empirical cov of the
    sampled derivative matches DerivativeGP's analytic cov."""
    gpc = GPC()
    f = st.GP(st.with_lengthscale(st.SEKernel(), 1.3), gpc=gpc)
    df = derivative(f)
    x = jnp.linspace(-1.5, 1.5, 12)
    S, F = 60000, 2048
    draws = prior_samples(df, key, S, num_features=F)
    Y = np.asarray(draws(x))
    emp = np.cov(Y.T)
    K = np.asarray(df.cov(x))
    assert np.max(np.abs(emp - K)) < 0.08, np.max(np.abs(emp - K))
