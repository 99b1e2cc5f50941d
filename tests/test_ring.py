"""Ring blockwise kernel evaluation + matrix-free CG inference
(`parallel/ring.py`) on the 8-virtual-device CPU mesh — the SP-analogue
obligation of SURVEY.md §2.3 (ring-passed input shards, no N×N object).

Oracles: dense jnp/scipy computations at the same N.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu as st
from stheno_tpu.parallel import rows_mesh, shard_rows
from stheno_tpu.parallel.ring import (
    ring_matvec,
    pcg_solve,
    ring_gp_solve,
    ring_posterior_mean_var,
)


def _kernel():
    return 1.7 * st.with_lengthscale(st.SEKernel(), 0.9)


def _data(rng, n):
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, n)))
    y = jnp.asarray(rng.normal(size=n))
    return x, y


def test_ring_matvec_matches_dense(rng):
    mesh = rows_mesh(8)
    n, noise = 256, 0.3
    k = _kernel()
    x, v = _data(rng, n)
    x_sh, v_sh = shard_rows(mesh, x), shard_rows(mesh, v)
    got = jax.jit(
        lambda xx, vv: ring_matvec(mesh, k, xx, vv, noise=noise)
    )(x_sh, v_sh)
    K = k.matrix(x, x) + noise * jnp.eye(n, dtype=x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(K @ v), rtol=1e-10)


def test_ring_matvec_multi_rhs_and_2d_inputs(rng):
    mesh = rows_mesh(4)
    n, noise = 128, 0.1
    k = _kernel()
    x = jnp.asarray(rng.normal(size=(n, 3)))  # D=3 inputs
    V = jnp.asarray(rng.normal(size=(n, 5)))
    got = jax.jit(lambda xx, vv: ring_matvec(mesh, k, xx, vv, noise=noise))(
        shard_rows(mesh, x), shard_rows(mesh, V)
    )
    K = k.matrix(x, x) + noise * jnp.eye(n, dtype=x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(K @ V), rtol=1e-9)


def test_pcg_solve_dense_oracle(rng):
    n = 96
    A = jnp.asarray(rng.normal(size=(n, n)))
    A = A @ A.T + n * jnp.eye(n)
    b = jnp.asarray(rng.normal(size=(n, 2)))
    x, iters = pcg_solve(lambda v: A @ v, b, tol=1e-12)
    assert int(iters) < n + 1
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-8)
    # vector RHS path
    xv, _ = pcg_solve(lambda v: A @ v, b[:, 0], tol=1e-12)
    np.testing.assert_allclose(np.asarray(xv), np.asarray(x[:, 0]), rtol=1e-7)


def test_ring_gp_solve_matches_dense(rng):
    mesh = rows_mesh(8)
    n, noise = 256, 0.2
    k = _kernel()
    x, y = _data(rng, n)
    sol, iters = jax.jit(
        lambda xx, yy: ring_gp_solve(mesh, k, xx, yy, noise, tol=1e-12)
    )(shard_rows(mesh, x), shard_rows(mesh, y))
    K = k.matrix(x, x) + noise * jnp.eye(n, dtype=x.dtype)
    np.testing.assert_allclose(
        np.asarray(sol), np.asarray(jnp.linalg.solve(K, y)), atol=1e-8
    )


def test_ring_posterior_mean_var_matches_dense_posterior(rng, key):
    """Posterior marginals via ring CG ≡ the dense FiniteGP posterior."""
    mesh = rows_mesh(8)
    n, noise = 256, 0.1
    k = _kernel()
    x, y = _data(rng, n)
    xs = jnp.linspace(-2.5, 2.5, 33)

    m, var, (it1, it2) = jax.jit(
        lambda xx, yy: ring_posterior_mean_var(
            mesh, k, xx, yy, noise, xs, tol=1e-12
        )
    )(shard_rows(mesh, x), shard_rows(mesh, y))

    from stheno_tpu.graph import GPC

    f = st.GP(k, gpc=GPC())
    post = st.posterior(f(x, noise), y)
    m_ref, v_ref = post.mean(xs), post.var(xs)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-7)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_ref), atol=1e-7)


def test_ring_gp_solve_grad_through_collectives(rng):
    """jax.grad w.r.t. kernel hyperparameters through the ring + CG loop.

    CG is iterative — autodiff differentiates through the unrolled while_loop
    is not allowed; instead check grads of the *matvec* (one ring pass).
    """
    mesh = rows_mesh(4)
    n, noise = 64, 0.2
    x, y = _data(rng, n)
    x_sh, y_sh = shard_rows(mesh, x), shard_rows(mesh, y)

    def qform(ell):
        k = 1.7 * st.with_lengthscale(st.SEKernel(), ell)
        return jnp.vdot(y_sh, ring_matvec(mesh, k, x_sh, y_sh, noise=noise))

    g = jax.jit(jax.grad(qform))(0.9)
    # dense oracle
    def qform_dense(ell):
        k = 1.7 * st.with_lengthscale(st.SEKernel(), ell)
        K = k.matrix(x, x) + noise * jnp.eye(n, dtype=x.dtype)
        return y @ K @ y

    g_ref = jax.grad(qform_dense)(0.9)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-9)


@pytest.mark.slow
def test_slq_logdet_dense_oracle(rng, key):
    """SLQ logdet against the dense logdet (f64, full-reorth Lanczos)."""
    from stheno_tpu.parallel.ring import slq_logdet

    n = 256
    k = _kernel()
    x, _ = _data(rng, n)
    K = k.matrix(x, x) + 0.3 * jnp.eye(n, dtype=x.dtype)
    est, _ = slq_logdet(lambda V: K @ V, key, n, m=30, num_probes=32)
    ref = 2.0 * jnp.sum(jnp.log(jnp.diag(jnp.linalg.cholesky(K))))
    # SLQ is a statistical estimator; SE spectra decay fast so m=30 probes=32
    # lands well within a few percent of |logdet|
    assert abs(float(est) - float(ref)) < 0.03 * abs(float(ref)) + 1.0


def test_ring_gp_logpdf_matches_dense(rng, key):
    from stheno_tpu.parallel.ring import ring_gp_logpdf
    from stheno_tpu.graph import GPC

    mesh = rows_mesh(8)
    n, noise = 256, 0.2
    k = _kernel()
    x, y = _data(rng, n)
    val = jax.jit(
        lambda xx, yy: ring_gp_logpdf(
            mesh, k, xx, yy, noise, key, num_probes=32, lanczos_iters=30
        )
    )(shard_rows(mesh, x), shard_rows(mesh, y))
    f = st.GP(k, gpc=GPC())
    ref = st.logpdf(f(x, noise), y)
    assert abs(float(val) - float(ref)) < 0.02 * abs(float(ref)) + 1.0


def test_ring_gp_logpdf_ygrad_exact(rng, key):
    """The y-gradient of the ring logpdf is exact (−α), not stochastic —
    cheap deterministic check kept in the default lane."""
    from stheno_tpu.parallel.ring import ring_gp_logpdf

    mesh = rows_mesh(2)
    n = 64
    x, y = _data(rng, n)
    x_sh, y_sh = shard_rows(mesh, x), shard_rows(mesh, y)
    gy = jax.jit(jax.grad(lambda yy: ring_gp_logpdf(
        mesh, _kernel(), x_sh, yy, 0.2, key, num_probes=4, lanczos_iters=8
    )))(y_sh)
    K = _kernel().matrix(x, x) + 0.2 * jnp.eye(n, dtype=x.dtype)
    np.testing.assert_allclose(
        np.asarray(gy), np.asarray(-jnp.linalg.solve(K, y)), atol=1e-6
    )


@pytest.mark.slow
def test_ring_gp_logpdf_grad_vs_dense(rng, key):
    """Hutchinson/SLQ stochastic gradient vs the dense exact gradient.

    Nightly lane: the grad of the unrolled ring+Lanczos graph takes minutes
    to compile on the 2-core CPU container (VERDICT r2 weak-item 4)."""
    from stheno_tpu.parallel.ring import ring_gp_logpdf
    from stheno_tpu.graph import GPC

    mesh = rows_mesh(2)  # 2 ring steps: keeps the unrolled graph small
    n = 96
    x, y = _data(rng, n)
    x_sh, y_sh = shard_rows(mesh, x), shard_rows(mesh, y)

    def stoch(params):
        k = params["v"] * st.with_lengthscale(st.SEKernel(), params["l"])
        return ring_gp_logpdf(
            mesh, k, x_sh, y_sh, params["noise"], key,
            num_probes=48, lanczos_iters=20,
        )

    def dense(params):
        k = params["v"] * st.with_lengthscale(st.SEKernel(), params["l"])
        f = st.GP(k, gpc=GPC())
        return st.logpdf(f(x, params["noise"]), y)

    p0 = dict(v=jnp.asarray(1.7), l=jnp.asarray(0.9), noise=jnp.asarray(0.2))
    gs = jax.grad(stoch)(p0)
    gd = jax.grad(dense)(p0)
    for name in p0:
        s, d = float(gs[name]), float(gd[name])
        assert abs(s - d) <= 0.15 * abs(d) + 0.6, (name, s, d)
