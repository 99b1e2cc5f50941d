"""Workload model-family builders (stheno_tpu.models) + API parity bits."""

import numpy as np
import jax
import jax.numpy as jnp

import stheno_tpu as st
from stheno_tpu import GPPPInput, BlockData, ColVecs, RowVecs, VFE, elbo, elbo_fx, logpdf, rand
from stheno_tpu.models import WORKLOADS, process_decomposition, hyperparameter_model
from stheno_tpu.utils.testing import check_process_interface


def test_workloads_registry(rng):
    assert set(WORKLOADS) == {
        "process_decomposition",
        "sensor_fusion",
        "extended_mauna_loa",
        "gppp_and_pseudo_points",
        "turing_integration",
    }


def test_process_decomposition_builder(rng, key):
    f = process_decomposition(l1=2.0, l2=0.3)
    x = jnp.asarray(rng.normal(size=6))
    check_process_interface(
        f, GPPPInput("f3", x), GPPPInput("f3", jnp.asarray(rng.normal(size=6)))
    )
    y = rand(key, f(GPPPInput("f3", x), 0.1))
    assert np.isfinite(float(logpdf(f(GPPPInput("f3", x), 0.1), y)))


def test_builders_jit_grad(rng):
    """Every parametric builder is differentiable through rebuild."""
    x = jnp.asarray(rng.normal(size=8))
    y = jnp.asarray(rng.normal(size=8))

    def nlml(p):
        f = hyperparameter_model(p)
        return -logpdf(f(GPPPInput("f", x), 0.1), y)

    g = jax.jit(jax.grad(nlml))(dict(v=jnp.asarray(1.0), l=jnp.asarray(0.8)))
    assert np.isfinite(g["v"]) and np.isfinite(g["l"])


def test_colvecs_rowvecs(rng):
    X = rng.normal(size=(3, 10))  # D=3, N=10 in ColVecs convention
    xc = ColVecs(jnp.asarray(X))
    assert xc.shape == (10, 3)
    xr = RowVecs(jnp.asarray(X.T))
    np.testing.assert_array_equal(np.asarray(xc), np.asarray(xr))


def test_elbo_fx_convenience(rng, key):
    from stheno_tpu.graph import GPC

    gpc = GPC()
    f = st.GP(st.SEKernel(), gpc=gpc)
    x = jnp.asarray(rng.uniform(0, 1, 20))
    z = jnp.linspace(0, 1, 5)
    fx = f(x, 0.1)
    y = rand(key, fx)
    np.testing.assert_allclose(
        float(elbo_fx(fx, y, f(z, 1e-9))), float(elbo(VFE(f(z, 1e-9)), fx, y))
    )


def test_cost_summary_smoke():
    # SURVEY.md §5: cost-model printouts per jitted entry point.
    import io

    import jax.numpy as jnp

    from stheno_tpu.utils import cost_summary

    def f(a):
        return jnp.sum(a @ a)

    buf = io.StringIO()
    ca = cost_summary(
        f, jnp.ones((64, 64)), name="mm64",
        peak_flops=49e12, hbm_bw=8e11, file=buf,
    )
    assert isinstance(ca, dict)
    assert "[cost] mm64" in buf.getvalue()
