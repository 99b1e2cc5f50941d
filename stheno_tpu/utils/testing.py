"""Interface-conformance test utilities.

Replicates the two generic checkers the reference runs against every GP type
and op (SURVEY.md §4.1):

- AbstractGPs.TestUtils.test_internal_abstractgps_interface
- the local `abstractgp_interface_tests` (test/test_util.jl:113-168):
  shape/type checks, symmetry `cov(f,f',x0,x2) ≈ cov(f',f,x2,x0)'`, PSD-ness
  via min eigenvalue, and `var ≡ diag(cov)` consistency (:151-167).

Usable both from the test-suite and by users validating custom affine
transformations (the examples/custom_affine_transformations contract).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stheno_tpu.graph import AbstractProcess, cross_cov, cross_var
from stheno_tpu.inputs import input_length


def check_process_interface(f, x0, x1, x2=None, atol=1e-9, f2=None):
    """Validate the statistics interface of a process-like object.

    `x0`, `x1` are two input collections for `f` with len(x0) == len(x1);
    `x2` (optional) may have a different length.  If `f2` is given (a second
    process from the same programme) the cross rules are validated too.
    """
    n0 = input_length(x0)
    n1 = input_length(x1)
    assert n0 == n1, "test misuse: x0 and x1 must have equal length"

    m = f.mean(x0)
    assert m.shape == (n0,), f"mean shape {m.shape} != ({n0},)"

    K = f.cov(x0)
    assert K.shape == (n0, n0)
    np.testing.assert_allclose(K, K.T, atol=atol, err_msg="cov not symmetric")
    evals = np.linalg.eigvalsh(np.asarray(K, dtype=np.float64))
    assert evals.min() > -1e-6, f"cov not PSD: min eig {evals.min()}"

    v = f.var(x0)
    assert v.shape == (n0,)
    np.testing.assert_allclose(
        v, jnp.diagonal(K), atol=max(atol, 1e-8), err_msg="var != diag(cov)"
    )

    K01 = f.cov2(x0, x1)
    assert K01.shape == (n0, n1)
    K10 = f.cov2(x1, x0)
    np.testing.assert_allclose(
        K01, K10.T, atol=atol, err_msg="cov2(x0,x1) != cov2(x1,x0)^T"
    )

    v01 = f.var2(x0, x1)
    assert v01.shape == (n0,)
    np.testing.assert_allclose(
        v01, jnp.diagonal(K01), atol=max(atol, 1e-8), err_msg="var2 != diag(cov2)"
    )

    if x2 is not None:
        n2 = input_length(x2)
        K02 = f.cov2(x0, x2)
        assert K02.shape == (n0, n2)
        K20 = f.cov2(x2, x0)
        np.testing.assert_allclose(K02, K20.T, atol=atol)

    if f2 is not None and isinstance(f, AbstractProcess):
        C = cross_cov(f, f2, x0, x1)
        Ct = cross_cov(f2, f, x1, x0)
        np.testing.assert_allclose(
            C, Ct.T, atol=atol, err_msg="cross_cov not transpose-symmetric"
        )
        cv = cross_var(f, f2, x0, x1)
        np.testing.assert_allclose(
            cv, jnp.diagonal(C), atol=max(atol, 1e-8),
            err_msg="cross_var != diag(cross_cov)",
        )

    # Joint [x0; x2-or-x1] covariance must be PSD as well.
    xj = x2 if x2 is not None else x1
    Kj = np.block(
        [
            [np.asarray(f.cov(x0)), np.asarray(f.cov2(x0, xj))],
            [np.asarray(f.cov2(xj, x0)), np.asarray(f.cov(xj))],
        ]
    )
    evj = np.linalg.eigvalsh(Kj.astype(np.float64))
    assert evj.min() > -1e-6, f"joint cov not PSD: min eig {evj.min()}"


def check_finite_gp(key, fx, atol=1e-8):
    """Shape/consistency checks on a FiniteGP (rand/logpdf/marginals)."""
    from stheno_tpu import finite_gp as fgp

    n = len(fx)
    m, K = fx.mean_and_cov()
    assert m.shape == (n,) and K.shape == (n, n)
    m2, v = fx.mean_and_var()
    np.testing.assert_allclose(m, m2, atol=atol)
    np.testing.assert_allclose(v, jnp.diagonal(K), atol=max(atol, 1e-8))

    y = fgp.rand(key, fx)
    assert y.shape == (n,)
    ys = fgp.rand(key, fx, 3)
    assert ys.shape == (n, 3)

    lp = fgp.logpdf(fx, y)
    assert lp.shape == ()
    lps = fgp.logpdf(fx, ys)
    assert lps.shape == (3,)
    return y
