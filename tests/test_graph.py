"""Process-graph IR tests — algebraic oracle tests for every affine op
(reference test pattern: test/affine_transformations/*.jl) plus the
interface-conformance suite run against each op (test/test_util.jl:113-168)."""

import numpy as np
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu.graph import GPC, cross_cov, cross_var, cross
from stheno_tpu.kernels import kernelmatrix
from stheno_tpu.utils.testing import check_process_interface
from stheno_tpu.inputs import BlockData


@pytest.fixture
def xs(rng):
    return (
        jnp.asarray(rng.normal(size=5)),
        jnp.asarray(rng.normal(size=5)),
        jnp.asarray(rng.normal(size=4)),
    )


def _two_gps():
    gpc = GPC()
    f1 = st.GP(st.SEKernel(), gpc=gpc)
    f2 = st.GP(st.Matern32Kernel(), gpc=gpc)
    return gpc, f1, f2


def test_atomic_independence(xs):
    """Cross-cov between distinct atomics is identically zero
    (atomic_gp.jl:36-41)."""
    x0, x1, x2 = xs
    _, f1, f2 = _two_gps()
    np.testing.assert_array_equal(cross_cov(f1, f2, x0, x2), np.zeros((5, 4)))
    np.testing.assert_array_equal(cross_var(f1, f2, x0, x1), np.zeros(5))
    # self-cov is the kernel matrix
    np.testing.assert_allclose(f1.cov(x0), kernelmatrix(st.SEKernel(), x0))
    check_process_interface(f1, x0, x1, x2, f2=f2)


def test_addition_oracle(xs):
    """cov(f1+f2) = K1 + K2 when independent; cross-terms with
    sums-of-sums (addition.jl:28-54; test pattern addition.jl:12-23)."""
    x0, x1, x2 = xs
    _, f1, f2 = _two_gps()
    f3 = f1 + f2
    K1 = f1.cov(x0)
    K2 = f2.cov(x0)
    np.testing.assert_allclose(f3.cov(x0), K1 + K2, atol=1e-12)
    # cov(f3, f1) = K1 (cross-term with one parent)
    np.testing.assert_allclose(cross_cov(f3, f1, x0, x0), K1, atol=1e-12)
    np.testing.assert_allclose(cross_cov(f1, f3, x0, x0), K1, atol=1e-12)
    # f4 = f3 + f1 has cov = K3 + K1 + 2*cov(f3,f1) = K1+K2+K1+2K1
    f4 = f3 + f1
    np.testing.assert_allclose(f4.cov(x0), K2 + 4 * K1, atol=1e-12)
    check_process_interface(f3, x0, x1, x2, f2=f1)
    check_process_interface(f4, x0, x1, x2, f2=f3)


def test_subtraction_and_mean_shift(xs):
    x0, x1, x2 = xs
    _, f1, f2 = _two_gps()
    g = f1 - f1
    np.testing.assert_allclose(g.cov(x0), np.zeros((5, 5)), atol=1e-12)
    np.testing.assert_allclose(g.mean(x0), np.zeros(5), atol=1e-12)
    # b + f shifts mean only (addition.jl:62-87)
    h = 3.5 + f1
    np.testing.assert_allclose(h.mean(x0), 3.5 * np.ones(5), atol=1e-12)
    np.testing.assert_allclose(h.cov(x0), f1.cov(x0), atol=1e-12)
    # function shift
    hf = (lambda x: jnp.sin(x)) + f1
    np.testing.assert_allclose(hf.mean(x0), np.sin(x0), atol=1e-12)
    np.testing.assert_allclose(hf.cov(x0), f1.cov(x0), atol=1e-12)
    check_process_interface(h, x0, x1, x2, f2=f1)
    check_process_interface(hf, x0, x1, x2, f2=f2)


def test_product_oracle(xs):
    """Scaling powers c, c², through nested products (product.jl test
    pattern :23-40)."""
    x0, x1, x2 = xs
    _, f1, f2 = _two_gps()
    c = 2.5
    g = c * f1
    np.testing.assert_allclose(g.cov(x0), c**2 * f1.cov(x0), atol=1e-12)
    np.testing.assert_allclose(
        cross_cov(g, f1, x0, x0), c * f1.cov(x0), atol=1e-12
    )
    g2 = c * g  # c² overall
    np.testing.assert_allclose(g2.cov(x0), c**4 * f1.cov(x0), atol=1e-12)
    # function scaling: σ(x) K σ(x')ᵀ (product.jl:27-38)
    sig = lambda x: jnp.cos(x)
    h = f1 * sig
    s0 = np.cos(x0)
    np.testing.assert_allclose(
        h.cov(x0), s0[:, None] * np.asarray(f1.cov(x0)) * s0[None, :], atol=1e-12
    )
    np.testing.assert_allclose(h.mean(x0), s0 * np.asarray(f1.mean(x0)), atol=1e-12)
    # negation
    n = -f1
    np.testing.assert_allclose(n.cov(x0), f1.cov(x0), atol=1e-12)
    np.testing.assert_allclose(
        cross_cov(n, f1, x0, x0), -np.asarray(f1.cov(x0)), atol=1e-12
    )
    check_process_interface(g, x0, x1, x2, f2=f1)
    check_process_interface(h, x0, x1, x2, f2=f2)


def test_gp_times_gp_raises():
    _, f1, f2 = _two_gps()
    with pytest.raises(TypeError):
        f1 * f2


def test_compose_oracle(xs):
    """compose ≡ eval at warped inputs (compose.jl test :10-21)."""
    x0, x1, x2 = xs
    _, f1, f2 = _two_gps()
    g = st.stretch(f1, 0.5)
    np.testing.assert_allclose(g.cov(x0), f1.cov(0.5 * x0), atol=1e-12)
    s = st.shift(f1, 1.2)
    np.testing.assert_allclose(s.cov(x0), f1.cov(x0 - 1.2), atol=1e-12)
    p = st.periodic(f1, 0.7)
    emb = jnp.stack(
        [jnp.cos(2 * jnp.pi * 0.7 * x0), jnp.sin(2 * jnp.pi * 0.7 * x0)], axis=-1
    )
    np.testing.assert_allclose(p.cov(x0), f1.cov(emb), atol=1e-12)
    check_process_interface(g, x0, x1, x2, f2=f1)
    check_process_interface(p, x0, x1, x2, f2=f2)
    # cross between composed and parent: cov(f∘w, f, x, x2) = k(w(x), x2)
    np.testing.assert_allclose(
        cross_cov(g, f1, x0, x2),
        kernelmatrix(st.SEKernel(), 0.5 * x0, x2),
        atol=1e-12,
    )


def test_select_and_additive(rng):
    X = jnp.asarray(rng.normal(size=(6, 2)))
    gpc = GPC()
    f1 = st.GP(st.SEKernel(), gpc=gpc)
    f2 = st.GP(st.Matern52Kernel(), gpc=gpc)
    g = st.additive_gp([f1, f2], [0, 1])
    K = g.cov(X)
    K_expected = kernelmatrix(st.SEKernel(), X[:, 0]) + kernelmatrix(
        st.Matern52Kernel(), X[:, 1]
    )
    np.testing.assert_allclose(K, K_expected, atol=1e-12)


def test_cross_block_assembly(xs):
    """cross ≡ vcat of per-process stats (cross.jl test :34-50)."""
    x0, x1, x2 = xs
    _, f1, f2 = _two_gps()
    f3 = f1 + f2
    c = cross([f1, f3])
    bd = BlockData(x0, x2)
    m = c.mean(bd)
    np.testing.assert_allclose(
        m, np.concatenate([f1.mean(x0), f3.mean(x2)]), atol=1e-12
    )
    K = c.cov(bd)
    K11 = np.asarray(f1.cov(x0))
    K22 = np.asarray(f3.cov(x2))
    K12 = np.asarray(cross_cov(f1, f3, x0, x2))
    np.testing.assert_allclose(
        K, np.block([[K11, K12], [K12.T, K22]]), atol=1e-12
    )
    v = c.var(bd)
    np.testing.assert_allclose(v, np.diagonal(K), atol=1e-10)
    # cross vs single process
    C = cross_cov(c, f1, bd, x1)
    np.testing.assert_allclose(
        C,
        np.vstack([f1.cov2(x0, x1), cross_cov(f3, f1, x2, x1)]),
        atol=1e-12,
    )


def test_ids_and_gpc_guards():
    gpc1, f1, f2 = _two_gps()
    gpc2 = GPC()
    g = st.GP(st.SEKernel(), gpc=gpc2)
    with pytest.raises(ValueError):
        f1 + g
    assert f1.n < f2.n < (f1 + f2).n


def test_derivative_process(rng):
    """Exact derivative processes via nested jvp (SE closed forms)."""
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    df = st.derivative(f)
    x = jnp.asarray(rng.normal(size=5))
    x2 = jnp.asarray(rng.normal(size=7))
    d = np.subtract.outer(np.asarray(x), np.asarray(x2))
    k = np.exp(-0.5 * d**2)
    np.testing.assert_allclose(cross_cov(df, f, x, x2), -d * k, atol=1e-10)
    np.testing.assert_allclose(df.cov2(x, x2), (1 - d**2) * k, atol=1e-10)
    np.testing.assert_allclose(df.var(x), np.ones(5), atol=1e-10)
    check_process_interface(df, x, jnp.asarray(rng.normal(size=5)), x2, f2=f)
    # second derivative
    ddf = st.derivative(df)
    np.testing.assert_allclose(
        ddf.cov2(x, x2), (3 - 6 * d**2 + d**4) * k, atol=1e-9
    )
    # composes with ops: derivative of a scaled/stretched process
    g = st.derivative(2.0 * st.stretch(f, 0.5))
    # (2 f(x/2))' = f'(x/2);  cov = 1 * (1 - (dx/2)^2) e^{-(dx/2)^2/2} * ... chain rule:
    # d/dx d/dy [4 k(x/2 - y/2)] = 4 * (1/4) k'' = k''(dx/2)
    dh = d / 2.0
    np.testing.assert_allclose(
        g.cov2(x, x2), (1 - dh**2) * np.exp(-0.5 * dh**2), atol=1e-10
    )


def test_sqdist_clamp_is_derivative_transparent(rng):
    """The value-clamp on the matmul sqdist identity must not kill
    higher-order derivatives at zero distance (regression: derivative
    processes had non-PSD covs from clamped diagonal tangents)."""
    import jax

    x = jnp.asarray(rng.normal(size=4))

    def kxy(a, b):
        return st.kernelmatrix(st.SEKernel(), a, b)

    # d2/dxi dyi of k at x == y should be exactly +1 on the diagonal
    H = jax.jvp(
        lambda a: jax.jvp(lambda b: kxy(a, b), (x,), (jnp.ones_like(x),))[1],
        (x,),
        (jnp.ones_like(x),),
    )[1]
    np.testing.assert_allclose(np.diagonal(H), np.ones(4), atol=1e-10)


def test_convolve_quadrature(rng):
    """Quadrature convolution: analytic Gaussian-convolution oracle +
    interface conformance + deconvolution cross-covariances."""
    from stheno_tpu.graph import convolve_quadrature

    gpc = GPC()
    f = st.GP(st.with_lengthscale(st.SEKernel(), 0.4), gpc=gpc)
    nodes = jnp.linspace(-6.0, 6.0, 241)
    width = 0.5

    def w(x, tau):
        d = jnp.asarray(x)[:, None] - jnp.asarray(tau)[None, :]
        return jnp.exp(-0.5 * (d / width) ** 2) / (width * jnp.sqrt(2 * jnp.pi))

    Cf = convolve_quadrature(f, w, nodes)
    x = jnp.linspace(-1.5, 1.5, 7)
    l_eff = np.sqrt(0.4**2 + 2 * width**2)
    d = np.subtract.outer(np.asarray(x), np.asarray(x))
    K_true = (0.4 / l_eff) * np.exp(-0.5 * (d / l_eff) ** 2)
    np.testing.assert_allclose(Cf.cov(x), K_true, atol=5e-4)
    check_process_interface(
        Cf, x, jnp.asarray(rng.normal(size=7)), jnp.asarray(rng.normal(size=4)),
        f2=f, atol=1e-8,
    )
    # cross-cov with the latent: ∫ w(x,τ) k(τ, y) dτ (oracle via numpy quad)
    y = jnp.asarray(rng.normal(size=3))
    W = np.asarray(w(x, nodes)) * np.asarray(Cf.deltas)[None, :]
    K_fy = np.asarray(st.kernelmatrix(st.with_lengthscale(st.SEKernel(), 0.4), nodes, y))
    np.testing.assert_allclose(cross_cov(Cf, f, x, y), W @ K_fy, atol=1e-12)


def test_derivative_process_interface_and_oracle(xs):
    """DerivativeGP: conformance suite + closed-form SE-derivative oracle
    (∂ₓk = -(x-y)k, ∂ₓ∂_y k = (1-(x-y)²)k for unit-lengthscale SE)."""
    from stheno_tpu.graph import derivative

    x0, x1, x2 = xs
    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    df = derivative(f)

    check_process_interface(df, x0, x1, x2, f2=f)

    d = x0[:, None] - x2[None, :]
    k = np.exp(-0.5 * d**2)
    np.testing.assert_allclose(cross_cov(df, f, x0, x2), -d * k, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(df.cov2(x0, x2)), (1.0 - d**2) * k, atol=1e-9
    )

    # closed under the graph ops: observe f, predict f' (SURVEY.md §3.3
    # cross-process posterior), and derivative of a sum distributes.
    g = st.GP(st.Matern52Kernel(), gpc=gpc)
    ds = derivative(f + g)
    np.testing.assert_allclose(
        np.asarray(cross_cov(ds, f, x0, x2)), -d * k, atol=1e-9
    )


def test_paramfn_differentiable_ops(rng, key):
    """Function-valued scalings/shifts/warps/means with TRACED parameters:
    d logpdf / d theta through σ(x;θ)·f, b(x;θ)+f, warp(x;θ), m(x;θ) matches
    finite differences (reference differentiates b.(x)/σ.(x) via Zygote,
    addition.jl:62-87, product.jl:27-38)."""
    import jax

    x = jnp.asarray(rng.normal(size=9))
    y = jnp.asarray(rng.normal(size=9))

    def nlml(theta):
        with GPC() as gpc:
            f = st.GP(
                st.ParamFn(lambda p, xx: p * jnp.cos(xx), theta["m"]),
                st.SEKernel(),
            )
            g = st.ParamFn(lambda p, xx: jnp.tanh(p * xx) + 1.0, theta["s"]) * f
            h = g + st.ParamFn(lambda p, xx: p * xx, theta["b"])
            w = st.compose(h, st.ParamFn(lambda p, xx: xx * p, theta["w"]))
        return -st.logpdf(w(x, 0.1), y)

    theta = {
        "m": jnp.asarray(0.7),
        "s": jnp.asarray(1.3),
        "b": jnp.asarray(-0.4),
        "w": jnp.asarray(0.9),
    }
    g = jax.grad(nlml)(theta)
    eps = 1e-6
    for k in theta:
        tp = dict(theta); tp[k] = theta[k] + eps
        tm = dict(theta); tm[k] = theta[k] - eps
        fd = (nlml(tp) - nlml(tm)) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=1e-5,
                                   err_msg=f"grad mismatch for {k}")
    # plain opaque callables still work (coerced to StaticFn)
    with GPC() as gpc:
        f = st.GP(st.SEKernel())
        h = (lambda xx: jnp.sin(xx)) * f + (lambda xx: 0.1 * xx)
    assert np.isfinite(float(st.logpdf(h(x, 0.1), y)))


def test_paramfn_under_jit(rng, key):
    """ParamFn params are pytree leaves: the builder retraces cleanly under
    jit with traced hyperparameters."""
    import jax

    x = jnp.asarray(rng.normal(size=6))
    y = jnp.asarray(rng.normal(size=6))

    @jax.jit
    def nlml(s):
        with GPC() as gpc:
            f = st.GP(st.SEKernel())
            g = st.ParamFn(lambda p, xx: p * jnp.exp(-xx**2), s) * f
        return -st.logpdf(g(x, 0.1), y)

    v1 = float(nlml(jnp.asarray(1.0)))
    v2 = float(nlml(jnp.asarray(2.0)))  # same trace, different value
    assert np.isfinite(v1) and np.isfinite(v2) and v1 != v2
