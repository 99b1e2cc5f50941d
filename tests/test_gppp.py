"""GPPP routing + external-vs-internal consistency (reference
test/gaussian_process_probabilistic_programme.jl patterns)."""

import numpy as np
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu import GPPPInput, BlockData, gppp, split
from stheno_tpu.graph import GPC, cross_cov
from stheno_tpu.utils.testing import check_process_interface


@gppp
def simple_model():
    f1 = st.GP(st.SEKernel())
    f2 = st.GP(st.Matern52Kernel())
    f3 = f1 + f2
    return dict(f1=f1, f2=f2, f3=f3)


@pytest.fixture
def xs(rng):
    return (
        jnp.asarray(rng.normal(size=5)),
        jnp.asarray(rng.normal(size=5)),
        jnp.asarray(rng.normal(size=4)),
    )


def test_gppp_routing_single(xs):
    x0, x1, x2 = xs
    f = simple_model()
    # internal consistency: GPPP stats at a tag == component process stats
    np.testing.assert_allclose(
        f.mean(GPPPInput("f3", x0)), f["f3"].mean(x0), atol=1e-12
    )
    np.testing.assert_allclose(
        f.cov(GPPPInput("f3", x0)), f["f3"].cov(x0), atol=1e-12
    )
    np.testing.assert_allclose(
        f.var(GPPPInput("f1", x0)), f["f1"].var(x0), atol=1e-12
    )


def test_gppp_routing_blockdata(xs):
    x0, x1, x2 = xs
    f = simple_model()
    x = BlockData(GPPPInput("f1", x0), GPPPInput("f3", x2))
    m = f.mean(x)
    np.testing.assert_allclose(
        m, np.concatenate([f["f1"].mean(x0), f["f3"].mean(x2)]), atol=1e-12
    )
    K = f.cov(x)
    K11 = np.asarray(f["f1"].cov(x0))
    K13 = np.asarray(cross_cov(f["f1"], f["f3"], x0, x2))
    K33 = np.asarray(f["f3"].cov(x2))
    np.testing.assert_allclose(K, np.block([[K11, K13], [K13.T, K33]]), atol=1e-12)
    # var over BlockData
    np.testing.assert_allclose(f.var(x), np.diagonal(K), atol=1e-10)
    # cov2 between different tagged sets
    x_other = BlockData(GPPPInput("f2", x1))
    C = f.cov2(x, x_other)
    np.testing.assert_allclose(
        C,
        np.vstack(
            [
                np.zeros((5, 5)),  # f1 ⟂ f2
                cross_cov(f["f3"], f["f2"], x2, x1),
            ]
        ),
        atol=1e-12,
    )


def test_gppp_cross_process_covariance_is_nonzero(xs):
    """The whole point of the library: cov between f3=f1+f2 and f1."""
    x0, _, x2 = xs
    f = simple_model()
    C = f.cov2(GPPPInput("f3", x0), GPPPInput("f1", x2))
    np.testing.assert_allclose(C, f["f1"].cov2(x0, x2), atol=1e-12)


def test_gppp_tuple_list_inputs(xs):
    """[(name, point), ...] vector inputs are grouped by symbol
    (gppp.jl:32-43)."""
    x0, _, _ = xs
    f = simple_model()
    pts = [("f1", float(x0[0])), ("f1", float(x0[1])), ("f3", float(x0[2]))]
    m = f.mean(pts)
    expected = np.concatenate(
        [f["f1"].mean(x0[:2]), f["f3"].mean(x0[2:3])]
    )
    np.testing.assert_allclose(m, expected, atol=1e-12)


def test_gppp_interface(xs):
    x0, x1, x2 = xs
    f = simple_model()
    check_process_interface(
        f,
        GPPPInput("f3", x0),
        GPPPInput("f3", x1),
        BlockData(GPPPInput("f1", x2), GPPPInput("f2", x2)),
    )


def test_nested_gppp_style_composition(xs):
    """GPPPs built from derived ops of other processes (nested-GPPP test
    pattern, reference gppp tests :107-120)."""
    x0, x1, x2 = xs

    @gppp
    def model():
        f1 = st.GP(st.SEKernel())
        f2 = st.GP(st.SEKernel())
        f3 = 2.0 * f1
        f4 = st.stretch(f2, 0.5)
        f5 = f3 + f4
        f6 = st.shift(f5, 1.0)
        return dict(f1=f1, f2=f2, f3=f3, f4=f4, f5=f5, f6=f6)

    f = model()
    check_process_interface(f, GPPPInput("f6", x0), GPPPInput("f6", x1))
    # f6(x) = f5(x-1); cross-check with manual composition
    np.testing.assert_allclose(
        f.cov(GPPPInput("f6", x0)), f["f5"].cov(x0 - 1.0), atol=1e-12
    )


def test_split(rng, xs):
    x0, _, x2 = xs
    x = BlockData(GPPPInput("f2", x0), GPPPInput("f3", x2))
    y = jnp.asarray(rng.normal(size=9))
    y2, y3 = split(x, y)
    np.testing.assert_array_equal(y2, y[:5])
    np.testing.assert_array_equal(y3, y[5:])
    Y = jnp.asarray(rng.normal(size=(9, 3)))
    Y2, Y3 = split(x, Y)
    np.testing.assert_array_equal(Y2, Y[:5])
    np.testing.assert_array_equal(Y3, Y[5:])
    with pytest.raises(ValueError):
        split(x, y[:-1])


def test_gppp_unknown_process_raises(xs):
    f = simple_model()
    with pytest.raises(KeyError):
        f.mean(GPPPInput("nope", xs[0]))


def test_true_nested_gppp(xs):
    """A GPPP used as an atomic component of ANOTHER GPPP, queried through
    tagged-inside-tagged inputs — the reference's nested-gppp test
    (test/gaussian_process_probabilistic_programme.jl:107-120)."""
    x0, x1, x2 = xs
    inner = simple_model()

    @gppp
    def outer_model():
        g1 = st.atomic(inner)
        g2 = 5.0 * g1
        return dict(g1=g1, g2=g2)

    f_outer = outer_model()

    # tagged-inside-tagged: GPPPInput("g1", GPPPInput("f1", x))
    x0_in = GPPPInput("f1", x0)
    x1_in = GPPPInput("f3", x2)
    x0_outer = GPPPInput("g1", x0_in)
    x1_outer = GPPPInput("g2", x1_in)

    # conformance of the outer programme over nested tagged inputs
    check_process_interface(
        f_outer, x0_outer, GPPPInput("g1", GPPPInput("f1", x1)), x1_outer
    )

    # statistics route through to the inner programme
    np.testing.assert_allclose(
        f_outer.mean(x0_outer), inner.mean(x0_in), atol=1e-12
    )
    np.testing.assert_allclose(
        f_outer.cov(x0_outer), inner.cov(x0_in), atol=1e-12
    )
    # scaling distributes over the wrapped leaf
    np.testing.assert_allclose(
        f_outer.cov(x1_outer), 25.0 * inner.cov(x1_in), atol=1e-10
    )
    np.testing.assert_allclose(
        f_outer.cov2(x0_outer, x1_outer),
        5.0 * np.asarray(inner.cov2(x0_in, x1_in)),
        atol=1e-10,
    )

    # BlockData over nested tagged inputs
    xb = BlockData(x0_outer, x1_outer)
    K = f_outer.cov(xb)
    assert K.shape == (5 + 4, 5 + 4)
    np.testing.assert_allclose(f_outer.var(xb), np.diagonal(K), atol=1e-10)

    # end-to-end verbs on the outer programme
    fx = f_outer(x0_outer, 0.1)
    key = __import__("jax").random.PRNGKey(0)
    y = st.rand(key, fx)
    assert np.isfinite(float(st.logpdf(fx, y)))


def test_atomic_wraps_posterior(xs, key):
    """Wrap a PosteriorGP as an independent leaf in a NEW programme —
    iterated conditioning across programmes (generic `atomic`,
    src/gp/atomic_gp.jl:11-22)."""
    x0, x1, x2 = xs
    f = simple_model()
    y = st.rand(key, f(GPPPInput("f3", x0), 0.1))
    post = st.posterior(f(GPPPInput("f3", x0), 0.1), y)

    @gppp
    def second_model():
        # the posterior (queried at f3-tagged inputs) becomes a prior leaf
        h1 = st.atomic(_TagWrap(post, "f3"))
        h2 = st.GP(st.SEKernel())
        h3 = h1 + h2
        return dict(h1=h1, h2=h2, h3=h3)

    g = second_model()
    check_process_interface(g, GPPPInput("h3", x0), GPPPInput("h3", x1))
    # h1 stats == posterior stats
    np.testing.assert_allclose(
        g.mean(GPPPInput("h1", x2)), post.mean(GPPPInput("f3", x2)), atol=1e-10
    )
    np.testing.assert_allclose(
        g.cov(GPPPInput("h1", x2)), post.cov(GPPPInput("f3", x2)), atol=1e-10
    )
    # independence: cross-cov between the wrapped posterior and the fresh GP
    # is identically zero
    np.testing.assert_allclose(
        cross_cov(g["h1"], g["h2"], x2, x2), np.zeros((4, 4)), atol=0
    )
    # condition the SECOND programme (iterated conditioning)
    y2 = st.rand(key, g(GPPPInput("h3", x0), 0.1))
    post2 = st.posterior(g(GPPPInput("h3", x0), 0.1), y2)
    m = post2.mean(GPPPInput("h1", x2))
    assert np.all(np.isfinite(np.asarray(m)))


class _TagWrap:
    """Present a posterior over a fixed tag as an untagged process (so it can
    mix with plain-array processes inside a new programme)."""

    def __init__(self, p, tag):
        self.p, self.tag = p, tag

    def _t(self, x):
        return GPPPInput(self.tag, x)

    def mean(self, x):
        return self.p.mean(self._t(x))

    def cov(self, x):
        return self.p.cov(self._t(x))

    def cov2(self, x, x2):
        return self.p.cov2(self._t(x), self._t(x2))

    def var(self, x):
        return self.p.var(self._t(x))

    def var2(self, x, x2):
        return self.p.var2(self._t(x), self._t(x2))


def _collect(xi):
    """The reference's `collect(GPPPInput)` — a plain vector of (name, point)
    tuples (test/gaussian_process_probabilistic_programme.jl:63-85)."""
    if isinstance(xi, GPPPInput):
        return [(xi.p, xi.x[i]) for i in range(len(xi))]
    if isinstance(xi, BlockData):
        out = []
        for b in xi.blocks:
            out.extend(_collect(b))
        return out
    raise TypeError


def _permutations(rng):
    """The reference's 9 input-type permutations
    (test/gaussian_process_probabilistic_programme.jl:47-86)."""
    r = lambda n: jnp.asarray(rng.normal(size=n))
    g = GPPPInput
    B = BlockData
    return [
        (g("f1", r(4)), g("f3", r(3))),
        (g("f1", r(4)), B(g("f2", r(3)), g("f3", r(2)))),
        (B(g("f2", r(3)), g("f3", r(2))), g("f1", r(4))),
        (B(g("f2", r(3)), g("f3", r(2))), B(g("f1", r(6)))),
        (_collect(g("f1", r(4))), _collect(g("f3", r(3)))),
        (g("f1", r(4)), _collect(g("f3", r(3)))),
        (_collect(B(g("f2", r(3)), g("f3", r(2)))), _collect(g("f1", r(4)))),
        (_collect(B(g("f2", r(3)), g("f3", r(2)))), g("f1", r(4))),
        (B(_collect(g("f2", r(3))), g("f3", r(2))), g("f1", r(4))),
    ]


@pytest.mark.parametrize("perm_idx", range(9))
def test_gppp_conformance_permutation_matrix(rng, key, perm_idx):
    """Interface conformance over every reference input-type permutation."""
    import jax

    f = simple_model()
    x0, x2 = _permutations(rng)[perm_idx]

    # GPPP-level stats across the pair
    C = f.cov2(x0, x2)
    from stheno_tpu.inputs import input_length
    assert C.shape == (input_length(x0), input_length(x2))
    Ct = f.cov2(x2, x0)
    np.testing.assert_allclose(np.asarray(C), np.asarray(Ct).T, atol=1e-10)

    K0 = f.cov(x0)
    np.testing.assert_allclose(np.asarray(f.var(x0)), np.diagonal(K0), atol=1e-10)
    evals = np.linalg.eigvalsh(np.asarray(K0, np.float64))
    assert evals.min() > -1e-8

    # joint PSD-ness
    Kj = np.block([
        [np.asarray(K0), np.asarray(C)],
        [np.asarray(C).T, np.asarray(f.cov(x2))],
    ])
    assert np.linalg.eigvalsh(Kj.astype(np.float64)).min() > -1e-8

    # verbs end-to-end on both shapes
    for xi in (x0, x2):
        fx = f(xi, 0.1)
        y = st.rand(key, fx)
        assert np.isfinite(float(st.logpdf(fx, y)))
        m, v = fx.mean_and_var()
        assert m.shape == v.shape == (input_length(xi),)
        post = st.posterior(fx, y)
        mp = post.mean(xi)
        assert np.all(np.isfinite(np.asarray(mp)))


def test_rand_mc_convergence(rng, key):
    """S=100k prior samples match mean/cov to 1e-2 (reference
    test/gp/util.jl:36-47) — over a cross-process BlockData."""
    f = simple_model()
    x = BlockData(GPPPInput("f1", jnp.asarray(rng.normal(size=4))),
                  GPPPInput("f3", jnp.asarray(rng.normal(size=4))))
    fx = f(x, 0.1)
    m, K = fx.mean_and_cov()
    S = 100_000
    ys = st.rand(key, fx, S)  # (N, S)
    ys = np.asarray(ys)
    emp_m = ys.mean(axis=1)
    emp_K = np.cov(ys)
    np.testing.assert_allclose(emp_m, np.asarray(m), atol=1e-2)
    np.testing.assert_allclose(emp_K, np.asarray(K), atol=2e-2)
    # seeded determinism (test/gp/util.jl:23-34)
    ys2 = np.asarray(st.rand(key, fx, 3))
    ys3 = np.asarray(st.rand(key, fx, 3))
    np.testing.assert_array_equal(ys2, ys3)
