"""Time-varying Bayesian linear regression — reference
examples/time_varying_blr: known basis functions g1, g2 with slowly-varying
GP coefficient processes w1, w2; observe y = g1·w1 + g2·w2 + rough noise,
recover the coefficient trajectories.

Function-scaled processes (`f * callable`) are exactly the reference's
`g1 * w1` op (product.jl function-scaling rules).

Run: python examples/time_varying_blr.py [--platform cpu]
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


@gppp
def model():
    g1 = lambda x: x / 4.0
    g2 = jnp.cos
    w1 = st.stretch(st.GP(st.SEKernel()), 0.2)
    w2 = st.stretch(st.GP(st.SEKernel()), 1.0)
    f = w1 * g1 + w2 * g2
    y = f + 0.3 * st.GP(st.Matern12Kernel())
    return dict(w1=w1, w2=w2, f=f, y=y)


def main():
    key = jax.random.PRNGKey(123456)
    rng = np.random.default_rng(123456)
    g = model()

    N = 250
    x = GPPPInput("y", jnp.asarray(np.sort(rng.uniform(0, 10, N))))
    yhat = rand(key, g(x, 1e-9))

    post = posterior(g(x, 1e-9), yhat)

    xp = jnp.linspace(-2.5, 12.5, 500)
    xp_all = BlockData(
        GPPPInput("w1", xp), GPPPInput("w2", xp),
        GPPPInput("f", xp), GPPPInput("y", xp),
    )
    ms = marginals(post(xp_all, 1e-9))
    m_w1, m_w2, m_f, m_y = split(xp_all, ms.mean)
    v_w1, v_w2, v_f, v_y = split(xp_all, ms.var)

    # consistency: E[f] == g1·E[w1] + g2·E[w2] exactly (f is their mix;
    # E[y] differs — the Matern12 "noise" process is correlated, so it has
    # its own nonzero posterior mean near the data)
    recon = np.asarray(xp) / 4.0 * np.asarray(m_w1) + np.cos(
        np.asarray(xp)
    ) * np.asarray(m_w2)
    err = float(np.max(np.abs(recon - np.asarray(m_f))))
    print(f"|g1 E[w1] + g2 E[w2] - E[f]|_inf = {err:.2e}")
    assert err < 1e-8
    resid = float(np.max(np.abs(np.asarray(m_y) - np.asarray(m_f))))
    print(f"correlated-noise posterior contribution |E[y]-E[f]|_inf = {resid:.3f}")

    # the coefficients are better identified inside the data region than out
    inside = (np.asarray(xp) > 0) & (np.asarray(xp) < 10)
    assert np.mean(np.asarray(v_w2)[inside]) < np.mean(np.asarray(v_w2)[~inside])

    # joint posterior samples exist and are finite
    ys = rand(key, post(xp_all, 1e-9), 100)
    assert np.all(np.isfinite(np.asarray(ys)))
    s_w1, s_w2, s_f, s_y = split(xp_all, ys)
    print(
        f"posterior sd of w2 inside data: {float(np.mean(np.sqrt(np.asarray(v_w2)[inside]))):.3f}; "
        f"outside: {float(np.mean(np.sqrt(np.asarray(v_w2)[~inside]))):.3f}"
    )
    print("time_varying_blr: OK")


if __name__ == "__main__":
    main()
