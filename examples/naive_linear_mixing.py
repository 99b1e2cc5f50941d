"""Naive linear mixing — reference examples/naive-linear-mixing: a simple
multi-output GP where three outputs are fixed linear combinations of two
latent processes; heterogeneous observations across outputs are conditioned
jointly and every output (and latent) gets a posterior.

Run: python examples/naive_linear_mixing.py [--platform cpu]
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
    f1 = st.GP(st.SEKernel())
    f2 = st.GP(st.with_lengthscale(st.SEKernel(), 0.1))
    g1 = 0.2 * f1 + 0.8 * f2
    g2 = 0.3 * f1 + 0.7 * f2
    g3 = 0.9 * f1 + 0.2 * f2
    return dict(f1=f1, f2=f2, g1=g1, g2=g2, g3=g3)


def main():
    key = jax.random.PRNGKey(123456)
    rng = np.random.default_rng(123456)
    f = model()

    # ragged observations: 10, 4, 7 points across the three outputs
    x1 = jnp.asarray(rng.normal(size=10))
    x2 = jnp.asarray(rng.normal(size=4))
    x3 = jnp.asarray(rng.normal(size=7))
    x = BlockData(
        GPPPInput("g1", x1), GPPPInput("g2", x2), GPPPInput("g3", x3)
    )
    noise = 0.1
    fx = f(x, noise)
    y = rand(key, fx)
    y1, y2, y3 = split(x, y)

    post = posterior(fx, y)
    xp = jnp.linspace(-5.0, 5.0, 300)
    xp_all = BlockData(
        GPPPInput("f1", xp), GPPPInput("f2", xp),
        GPPPInput("g1", xp), GPPPInput("g2", xp), GPPPInput("g3", xp),
    )
    ms = marginals(post(xp_all, 1e-9))
    mf1, mf2, mg1, mg2, mg3 = split(xp_all, ms.mean)

    # mixing consistency of the posterior means
    for coefs, mg, name in [
        ((0.2, 0.8), mg1, "g1"),
        ((0.3, 0.7), mg2, "g2"),
        ((0.9, 0.2), mg3, "g3"),
    ]:
        err = float(
            np.max(np.abs(coefs[0] * np.asarray(mf1) + coefs[1] * np.asarray(mf2) - np.asarray(mg)))
        )
        assert err < 1e-8, f"{name} mixing inconsistent: {err}"
    print("posterior mixing identities: OK")

    # information flows across outputs: conditioning on g1/g2/g3 shrinks the
    # latent f1's variance below its prior variance (=1) inside the data
    vf1 = split(xp_all, ms.var)[0]
    inside = np.abs(np.asarray(xp)) < 2.0
    assert float(np.mean(np.asarray(vf1)[inside])) < 0.8
    print(
        f"latent f1 posterior var inside data: "
        f"{float(np.mean(np.asarray(vf1)[inside])):.3f} (prior 1.0)"
    )
    print("naive_linear_mixing: OK")


if __name__ == "__main__":
    main()
