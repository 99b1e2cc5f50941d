"""Kernel zoo vs dense numpy oracles (reference test pattern §4.3: algebraic
oracle tests with hand-written formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu.kernels import kernelmatrix, kernelmatrix_diag


def _np_pairwise(kfun, x, y):
    x = np.atleast_2d(np.asarray(x).T).T if np.asarray(x).ndim == 1 else np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    y = np.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    K = np.zeros((x.shape[0], y.shape[0]))
    for i in range(x.shape[0]):
        for j in range(y.shape[0]):
            K[i, j] = kfun(x[i], y[j])
    return K


ORACLES = [
    (st.SEKernel(), lambda a, b: np.exp(-0.5 * np.sum((a - b) ** 2))),
    (st.Matern12Kernel(), lambda a, b: np.exp(-np.linalg.norm(a - b))),
    (
        st.Matern32Kernel(),
        lambda a, b: (1 + np.sqrt(3) * np.linalg.norm(a - b))
        * np.exp(-np.sqrt(3) * np.linalg.norm(a - b)),
    ),
    (
        st.Matern52Kernel(),
        lambda a, b: (
            1
            + np.sqrt(5) * np.linalg.norm(a - b)
            + 5.0 / 3.0 * np.sum((a - b) ** 2)
        )
        * np.exp(-np.sqrt(5) * np.linalg.norm(a - b)),
    ),
    (
        st.RationalQuadraticKernel(alpha=jnp.asarray(1.7)),
        lambda a, b: (1 + np.sum((a - b) ** 2) / (2 * 1.7)) ** (-1.7),
    ),
    (st.LinearKernel(), lambda a, b: np.dot(a, b)),
    (st.ConstantKernel(c=jnp.asarray(2.5)), lambda a, b: 2.5),
    (
        st.PeriodicKernel(r=jnp.asarray(0.9)),
        lambda a, b: np.exp(-0.5 * np.sum((np.sin(np.pi * (a - b)) / 0.9) ** 2)),
    ),
    (st.ExponentiatedKernel(), lambda a, b: np.exp(np.dot(a, b))),
    (
        st.FBMKernel(h=jnp.asarray(0.4)),
        lambda a, b: 0.5
        * (
            np.sum(a**2) ** 0.4
            + np.sum(b**2) ** 0.4
            - np.sum((a - b) ** 2) ** 0.4
        ),
    ),
    (
        st.NeuralNetworkKernel(),
        lambda a, b: np.arcsin(
            np.dot(a, b)
            / np.sqrt((1 + np.sum(a**2)) * (1 + np.sum(b**2)))
        ),
    ),
]


@pytest.mark.parametrize("k,oracle", ORACLES, ids=lambda p: type(p).__name__)
@pytest.mark.parametrize("dim", [1, 3])
def test_kernel_vs_oracle(rng, k, oracle, dim):
    if not callable(oracle):
        pytest.skip("not an oracle")
    x = rng.normal(size=(7, dim)) if dim > 1 else rng.normal(size=7)
    y = rng.normal(size=(5, dim)) if dim > 1 else rng.normal(size=5)
    K = kernelmatrix(k, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(K, _np_pairwise(oracle, x, y), atol=1e-8)
    # diag path agrees with dense path
    Kx = kernelmatrix(k, jnp.asarray(x))
    np.testing.assert_allclose(
        kernelmatrix_diag(k, jnp.asarray(x)), np.diagonal(Kx), atol=1e-10
    )
    d = kernelmatrix_diag(k, jnp.asarray(x[:5]), jnp.asarray(y))
    np.testing.assert_allclose(d, np.diagonal(_np_pairwise(oracle, x[:5], y)), atol=1e-8)


def test_white_kernel(rng):
    x = jnp.asarray(rng.normal(size=6))
    K = kernelmatrix(st.WhiteKernel(), x)
    np.testing.assert_allclose(K, np.eye(6), atol=0)
    # cross: value-equality semantics
    y = jnp.concatenate([x[:2], jnp.asarray(rng.normal(size=3))])
    Kxy = kernelmatrix(st.WhiteKernel(), x, y)
    assert Kxy[0, 0] == 1.0 and Kxy[1, 1] == 1.0 and Kxy[2, 2] == 0.0


def test_kernel_algebra(rng):
    x = jnp.asarray(rng.normal(size=6))
    k1, k2 = st.SEKernel(), st.Matern32Kernel()
    np.testing.assert_allclose(
        kernelmatrix(k1 + k2, x), kernelmatrix(k1, x) + kernelmatrix(k2, x), atol=1e-12
    )
    np.testing.assert_allclose(
        kernelmatrix(k1 * k2, x), kernelmatrix(k1, x) * kernelmatrix(k2, x), atol=1e-12
    )
    np.testing.assert_allclose(
        kernelmatrix(2.5 * k1, x), 2.5 * kernelmatrix(k1, x), atol=1e-12
    )


def test_with_lengthscale(rng):
    x = jnp.asarray(rng.normal(size=6))
    k = st.with_lengthscale(st.SEKernel(), 0.5)
    np.testing.assert_allclose(
        kernelmatrix(k, x), kernelmatrix(st.SEKernel(), x / 0.5), atol=1e-12
    )
    # per-dim lengthscales (ARD)
    X = jnp.asarray(rng.normal(size=(5, 2)))
    ell = jnp.asarray([0.5, 2.0])
    k2 = st.with_lengthscale(st.SEKernel(), ell)
    np.testing.assert_allclose(
        kernelmatrix(k2, X), kernelmatrix(st.SEKernel(), X / ell[None, :]), atol=1e-12
    )


def test_matern_gradient_at_zero_distance(rng):
    """Matern kernels must have finite grads on the diagonal (d=0)."""
    import jax

    x = jnp.asarray(rng.normal(size=4))
    for k in [st.Matern12Kernel(), st.Matern32Kernel(), st.Matern52Kernel()]:
        g = jax.grad(lambda x_: jnp.sum(kernelmatrix(k, x_)))(x)
        assert np.all(np.isfinite(g)), f"{type(k).__name__} grad not finite"


def test_dtype_stability(rng):
    """Float32 in → Float32 out (reference test/gp/util.jl:76-89)."""
    x32 = jnp.asarray(rng.normal(size=5), dtype=jnp.float32)
    K = kernelmatrix(st.SEKernel(), x32)
    assert K.dtype == jnp.float32
    x64 = jnp.asarray(rng.normal(size=5), dtype=jnp.float64)
    assert kernelmatrix(st.Matern52Kernel(), x64).dtype == jnp.float64


def test_wiener_kernel(rng):
    """min(x,y) Brownian kernel on R₊ — Gram oracle, PSD, diag path."""
    x = jnp.asarray(np.sort(rng.uniform(0.1, 4.0, 7)))
    K = kernelmatrix(st.WienerKernel(), x)
    np.testing.assert_allclose(
        K, np.minimum(np.asarray(x)[:, None], np.asarray(x)[None, :]), atol=0
    )
    assert np.linalg.eigvalsh(np.asarray(K)).min() > -1e-12
    np.testing.assert_allclose(
        kernelmatrix_diag(st.WienerKernel(), x), np.asarray(x), atol=0
    )


@pytest.mark.parametrize(
    "k",
    [st.ExponentiatedKernel(), st.FBMKernel(h=jnp.asarray(0.7)),
     st.NeuralNetworkKernel()],
    ids=lambda k: type(k).__name__,
)
def test_new_kernels_psd_and_gp_roundtrip(rng, k):
    """Gram PSD-ness and usability inside a GP programme (logpdf finite)."""
    import jax

    x = jnp.asarray(rng.normal(size=9))
    K = kernelmatrix(k, x)
    assert np.linalg.eigvalsh(np.asarray(K)).min() > -1e-9
    from stheno_tpu.graph import GPC

    f = st.GP(k, gpc=GPC())
    lp = st.logpdf(f(x, 0.3), jnp.asarray(rng.normal(size=9)))
    assert bool(jnp.isfinite(lp))


def test_neural_kernel_network_matches_explicit_algebra(rng):
    """A single bias-free LinearLayer NKN IS the weighted kernel sum; a
    product layer IS the kernel product — check against the explicit
    algebra (reference NKN example parity: LinearLayer/product closure)."""
    import jax

    from stheno_tpu import LinearLayer, NeuralKernelNetwork, ProductLayer

    x = jnp.asarray(rng.normal(size=7))
    y = jnp.asarray(rng.normal(size=5))
    k1, k2 = st.SEKernel(), st.Matern32Kernel()
    w = jnp.asarray([[0.3, 1.7]])

    nkn = NeuralKernelNetwork(
        (k1, k2), (LinearLayer(jnp.log(w)),))
    explicit = 0.3 * k1 + 1.7 * k2
    np.testing.assert_allclose(
        kernelmatrix(nkn, x, y), kernelmatrix(explicit, x, y), atol=1e-12)
    np.testing.assert_allclose(
        kernelmatrix(nkn, x), kernelmatrix(explicit, x), atol=1e-12)
    np.testing.assert_allclose(
        kernelmatrix_diag(nkn, x), kernelmatrix_diag(explicit, x), atol=1e-12)

    # product layer == kernel product
    nkn_p = NeuralKernelNetwork(
        (k1, k2),
        (ProductLayer(), LinearLayer(jnp.zeros((1, 1)))),
    )
    np.testing.assert_allclose(
        kernelmatrix(nkn_p, x, y), kernelmatrix(k1 * k2, x, y), atol=1e-12)

    # layer params are differentiable leaves
    g = jax.grad(
        lambda k: jnp.sum(kernelmatrix(k, x))
    )(nkn)
    assert float(jnp.sum(jnp.abs(g.layers[0].log_w))) > 0


def test_neural_kernel_network_gp_interface(rng):
    """Full process-interface conformance (PSD, var ≡ diag(cov), posterior)
    for a GP with an NKN covariance."""
    from stheno_tpu import LinearLayer, NeuralKernelNetwork, ProductLayer
    from stheno_tpu.graph import GPC
    from stheno_tpu.utils.testing import check_process_interface
    import jax

    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    nkn = NeuralKernelNetwork(
        (st.SEKernel(), st.Matern52Kernel(),
         st.LinearKernel(), st.PeriodicKernel(r=jnp.asarray(1.0))),
        (LinearLayer.init(k0, 4, 4), ProductLayer(),
         LinearLayer.init(k1, 2, 1)),
    )
    f = st.GP(nkn, gpc=GPC())
    x0 = jnp.asarray(rng.normal(size=7))
    x1 = jnp.asarray(rng.normal(size=7))
    x2 = jnp.asarray(rng.normal(size=5))
    check_process_interface(f, x0, x1, x2)
