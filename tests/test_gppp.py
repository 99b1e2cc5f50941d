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
