"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8; SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu.parallel import (
    chains_mesh,
    rows_mesh,
    shard_rows,
    run_nuts_sharded,
    distributed_cholesky,
    distributed_solve_lower,
    distributed_logdet_chol,
    distributed_mvn_logpdf,
    sharded_kernelmatrix,
    sharded_matvec,
    big_gp_logpdf,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _psd(rng, n):
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_distributed_cholesky_matches_dense(rng):
    mesh = rows_mesh(8)
    n, B = 128, 8
    K = _psd(rng, n)
    K_sh = shard_rows(mesh, K)
    L = distributed_cholesky(mesh, K_sh, block_size=B)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, atol=1e-8)


def test_distributed_cholesky_block_equals_slab(rng):
    """block == slab size (one block per device) still works."""
    mesh = rows_mesh(4)
    n, B = 64, 16
    K = _psd(rng, n)
    K_sh = shard_rows(mesh, K)
    L = distributed_cholesky(mesh, K_sh, block_size=B)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), atol=1e-8
    )


def test_distributed_solve_and_logdet(rng):
    mesh = rows_mesh(8)
    n, B = 64, 8
    K = _psd(rng, n)
    b = jnp.asarray(rng.normal(size=n))
    K_sh = shard_rows(mesh, K)
    L = distributed_cholesky(mesh, K_sh, block_size=B)
    a = distributed_solve_lower(mesh, L, b, block_size=B)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(a), np.linalg.solve(L_ref, b), atol=1e-8)
    ld = distributed_logdet_chol(mesh, L)
    np.testing.assert_allclose(
        float(ld), 2 * np.sum(np.log(np.diag(L_ref))), rtol=1e-10
    )


def test_distributed_mvn_logpdf(rng):
    mesh = rows_mesh(8)
    n, B = 64, 8
    K = _psd(rng, n)
    y = jnp.asarray(rng.normal(size=n))
    m = jnp.zeros(n)
    lp = distributed_mvn_logpdf(mesh, shard_rows(mesh, K), m, y, block_size=B)
    from scipy.stats import multivariate_normal

    lp_ref = multivariate_normal(np.zeros(n), np.asarray(K)).logpdf(np.asarray(y))
    np.testing.assert_allclose(float(lp), lp_ref, rtol=1e-9)


def test_sharded_kernelmatrix(rng):
    mesh = rows_mesh(8)
    x = jnp.asarray(rng.normal(size=64))
    K = sharded_kernelmatrix(mesh, st.SEKernel(), x, noise=0.1)
    K_ref = np.asarray(st.kernelmatrix(st.SEKernel(), x)) + 0.1 * np.eye(64)
    np.testing.assert_allclose(np.asarray(K), K_ref, atol=1e-9)
    v = jnp.asarray(rng.normal(size=64))
    y = sharded_matvec(mesh, K, v)
    np.testing.assert_allclose(np.asarray(y), K_ref @ np.asarray(v), atol=1e-8)


def test_big_gp_logpdf_matches_single_device(rng, key):
    mesh = rows_mesh(8)
    n, B = 128, 16
    x = jnp.asarray(np.sort(rng.uniform(-5, 5, n)))
    from stheno_tpu.graph import GPC

    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    y = st.rand(key, f(x, 0.1))
    lp_dist = big_gp_logpdf(mesh, st.SEKernel(), x, y, noise=0.1, block_size=B)
    lp_ref = st.logpdf(f(x, 0.1), y)
    np.testing.assert_allclose(float(lp_dist), float(lp_ref), rtol=1e-9)


def test_big_gp_logpdf_gradients(rng, key):
    """grad through the distributed pipeline (collectives included)."""
    mesh = rows_mesh(4)
    n, B = 64, 16
    x = jnp.asarray(np.sort(rng.uniform(-5, 5, n)))
    y = jnp.asarray(rng.normal(size=n))

    def lp(log_l, noise):
        k = st.with_lengthscale(st.SEKernel(), jnp.exp(log_l))
        return big_gp_logpdf(mesh, k, x, y, noise=noise, block_size=B)

    g = jax.grad(lp, argnums=(0, 1))(jnp.asarray(0.3), jnp.asarray(0.2))
    # FD reference
    eps = 1e-5
    fd0 = (lp(0.3 + eps, 0.2) - lp(0.3 - eps, 0.2)) / (2 * eps)
    fd1 = (lp(0.3, 0.2 + eps) - lp(0.3, 0.2 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), float(fd0), rtol=1e-5)
    np.testing.assert_allclose(float(g[1]), float(fd1), rtol=1e-5)


def test_run_nuts_sharded(key):
    mesh = chains_mesh(8)

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    samples, info = run_nuts_sharded(
        key,
        logp,
        jnp.zeros(3),
        mesh,
        num_warmup=200,
        num_samples=300,
        num_chains=8,
    )
    assert samples.shape == (8, 300, 3)
    # samples live sharded across devices
    assert len(samples.sharding.device_set) == 8
    s = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), np.zeros(3), atol=0.12)
    np.testing.assert_allclose(s.std(0), np.ones(3), atol=0.12)


def test_run_smc_sharded(key):
    from stheno_tpu.parallel import run_smc_sharded

    mesh = chains_mesh(8)
    d = 2

    def loglike(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    def logprior(q):
        return -0.5 * jnp.sum(q**2)

    P_ = 1024
    init = jax.random.normal(key, (P_, d))
    res = run_smc_sharded(
        jax.random.PRNGKey(1), loglike, logprior, init, mesh,
        num_mcmc=3, hmc_step_size=0.5, hmc_num_steps=8,
    )
    # posterior = N(1/2, 1/2) per dim
    np.testing.assert_allclose(np.asarray(res.particles).mean(0), [0.5, 0.5], atol=0.12)
    np.testing.assert_allclose(
        np.asarray(res.particles).std(0), np.sqrt(0.5) * np.ones(2), atol=0.12
    )
