"""Hot-path ops: blocked Cholesky / solves vs lax references, Pallas fused
kernelmatrix (interpret mode on CPU) vs the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu.ops.blocked_cholesky import (
    blocked_cholesky,
    blocked_solve_lower,
    blocked_solve_upper_T,
)
from stheno_tpu.ops.pallas.kernelmatrix import pairwise_kernelmatrix


def _psd(rng, n):
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n,block,base", [(512, 256, 256), (1024, 512, 256), (768, 256, 128)])
def test_blocked_cholesky_matches_lax(rng, n, block, base):
    K = _psd(rng, n)
    L = blocked_cholesky(K, block=block, base=base)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, atol=1e-7 * n)


def test_blocked_solves(rng):
    n = 512
    K = _psd(rng, n)
    L = blocked_cholesky(K, block=256, base=128)
    b = jnp.asarray(rng.normal(size=n))
    x = blocked_solve_lower(L, b, block=128)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(L), np.asarray(b)), atol=1e-8
    )
    xt = blocked_solve_upper_T(L, b, block=128)
    np.testing.assert_allclose(
        np.asarray(xt), np.linalg.solve(np.asarray(L).T, np.asarray(b)), atol=1e-8
    )
    # matrix rhs
    Bm = jnp.asarray(rng.normal(size=(n, 3)))
    Xm = blocked_solve_lower(L, Bm, block=128)
    np.testing.assert_allclose(
        np.asarray(Xm), np.linalg.solve(np.asarray(L), np.asarray(Bm)), atol=1e-8
    )


def test_blocked_cholesky_grad(rng):
    """Differentiability of the unrolled factorisation."""
    n = 256
    K = _psd(rng, n)

    def f_blocked(s):
        return jnp.sum(blocked_cholesky(K * s, block=128, base=64))

    def f_lax(s):
        return jnp.sum(jnp.linalg.cholesky(K * s))

    g1 = jax.grad(f_blocked)(jnp.asarray(1.0))
    g2 = jax.grad(f_lax)(jnp.asarray(1.0))
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-8)


@pytest.mark.parametrize("name,kern", [
    ("se", st.SEKernel()),
    ("matern12", st.Matern12Kernel()),
    ("matern32", st.Matern32Kernel()),
    ("matern52", st.Matern52Kernel()),
])
@pytest.mark.parametrize("dim", [1, 3])
def test_pallas_kernelmatrix_interpret(rng, name, kern, dim):
    n, m = 256, 128
    x = jnp.asarray(
        rng.normal(size=(n, dim)) if dim > 1 else rng.normal(size=n),
        dtype=jnp.float32,
    )
    y = jnp.asarray(
        rng.normal(size=(m, dim)) if dim > 1 else rng.normal(size=m),
        dtype=jnp.float32,
    )
    K = pairwise_kernelmatrix(x, y, name=name, tile_m=128, tile_n=128)
    K_ref = st.kernelmatrix(kern, x, y)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-5)
    # same-input path with exact diagonal
    Kxx = pairwise_kernelmatrix(x, name=name, tile_m=128, tile_n=128)
    np.testing.assert_allclose(np.diagonal(Kxx), np.ones(n), atol=1e-6)


def test_pallas_kernelmatrix_ard(rng):
    x = jnp.asarray(rng.normal(size=(256, 2)), dtype=jnp.float32)
    ell = jnp.asarray([0.5, 2.0], dtype=jnp.float32)
    K = pairwise_kernelmatrix(x, name="se", lengthscale=ell, variance=2.0,
                              tile_m=128, tile_n=128)
    K_ref = 2.0 * st.kernelmatrix(st.with_lengthscale(st.SEKernel(), ell), x)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-5)


def test_blocked_cholesky_custom_vjp_random_cotangent(rng):
    """Custom VJP vs lax autodiff under an arbitrary cotangent."""
    n = 256
    K = _psd(rng, n)
    ct = jnp.asarray(rng.normal(size=(n, n)))

    _, vjp_b = jax.vjp(lambda A: blocked_cholesky(A, block=128, base=64), K)
    _, vjp_l = jax.vjp(jnp.linalg.cholesky, K)
    gb = vjp_b(ct)[0]
    gl = vjp_l(ct)[0]
    # conventions may differ by symmetrization; compare symmetrized pullbacks
    gb_s = 0.5 * (gb + gb.T)
    gl_s = 0.5 * (gl + gl.T)
    np.testing.assert_allclose(np.asarray(gb_s), np.asarray(gl_s), atol=1e-8)
