"""Differentiation as an affine transformation — reference
examples/differentiation (there: a "correct, albeit unbearably slow"
finite-difference implementation; here: EXACT derivatives via nested jvp
through the kernel graph, at matmul cost — a capability upgrade, not a port).

Observe a process f, infer its derivative f′ (and curvature f″) jointly.

Run: python examples/differentiation.py [--platform cpu]
"""

import sys

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import GPPPInput, BlockData, gppp, marginals, posterior, rand, split
from stheno_tpu.graph import cross_cov


@gppp
def model():
    f = st.GP(st.SEKernel())
    df = st.derivative(f)
    ddf = st.derivative(df)
    return dict(f=f, df=df, ddf=ddf)


def main():
    key = jax.random.PRNGKey(4)
    g = model()

    # closed-form oracles for the SE kernel: with d = x - y, k = e^{-d²/2}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=6))
    y = jnp.asarray(rng.normal(size=8))
    d = np.subtract.outer(np.asarray(x), np.asarray(y))
    k = np.exp(-0.5 * d**2)
    np.testing.assert_allclose(
        cross_cov(g["df"], g["f"], x, y), -d * k, atol=1e-10
    )
    np.testing.assert_allclose(g["df"].cov2(x, y), (1 - d**2) * k, atol=1e-10)
    np.testing.assert_allclose(
        g["ddf"].cov2(x, y), (3 - 6 * d**2 + d**4) * k, atol=1e-9
    )
    print("closed-form SE derivative covariances: OK")

    # observe f on a grid; infer f′ and f″ everywhere
    xo = jnp.linspace(-3.0, 3.0, 50)
    yo = rand(key, g(GPPPInput("f", xo), 1e-6))
    post = posterior(g(GPPPInput("f", xo), 1e-6), yo)

    xp = jnp.linspace(-2.5, 2.5, 101)
    xp_all = BlockData(
        GPPPInput("f", xp), GPPPInput("df", xp), GPPPInput("ddf", xp)
    )
    ms = marginals(post(xp_all, 1e-9))
    mf, mdf, mddf = split(xp_all, ms.mean)

    # posterior-mean consistency: E[f′] == d/dx E[f] (central differences)
    eps = 1e-4
    m_p = post.mean(GPPPInput("f", xp + eps))
    m_m = post.mean(GPPPInput("f", xp - eps))
    fd = (np.asarray(m_p) - np.asarray(m_m)) / (2 * eps)
    err = float(np.max(np.abs(np.asarray(mdf) - fd)))
    print(f"|E[f'] - d/dx E[f]|_inf = {err:.2e}")
    assert err < 1e-5

    # joint samples: sampled derivative matches FD of a densely sampled path
    # statistically (slope sign agreement at extrema of the mean)
    imax = int(np.argmax(np.asarray(mf)[10:-10])) + 10
    assert abs(float(mdf[imax])) < 0.2, "derivative should vanish at the peak"
    assert float(mddf[imax]) < 0.1, "curvature should be negative-ish at the peak"
    print("differentiation: OK")


if __name__ == "__main__":
    main()
