"""Process decomposition — the reference README / process_decomposition
example (BASELINE.json workload #1), written against stheno_tpu's public API.

Declares f3 = f1 + f2, samples data from f3, conditions on it, and reads off
posteriors over ALL THREE processes (including the latent f1, f2) — the
signature capability of GP probabilistic programming.

Run: python examples/process_decomposition.py [--platform cpu]
"""

import sys

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import (
    GPPPInput,
    BlockData,
    gppp,
    logpdf,
    marginals,
    posterior,
    rand,
    split,
)


@gppp
def model():
    f1 = st.GP(st.SEKernel())
    f2 = st.GP(st.with_lengthscale(st.SEKernel(), 0.5))
    f3 = f1 + f2
    return dict(f1=f1, f2=f2, f3=f3)


def main():
    key = jax.random.PRNGKey(4)
    f = model()

    # Generate a toy dataset by sampling the prior over f3.
    x = jnp.asarray(np.sort(np.random.default_rng(0).uniform(-5.0, 5.0, 21)))
    noise = 0.05
    fx = f(GPPPInput("f3", x), noise)
    y = rand(key, fx)
    print(f"observations: N={len(y)}, y[:4]={np.asarray(y[:4]).round(3)}")

    lp = logpdf(fx, y)
    print(f"prior logpdf(f3(x), y) = {float(lp):.4f}")

    # Condition on (x, y) and predict all three processes jointly.
    post = posterior(fx, y)
    xp = jnp.linspace(-6.0, 6.0, 121)
    xp_all = BlockData(
        GPPPInput("f1", xp), GPPPInput("f2", xp), GPPPInput("f3", xp)
    )
    ms = marginals(post(xp_all, 1e-9))
    m1, m2, m3 = split(xp_all, ms.mean)
    s1, s2, s3 = split(xp_all, ms.std)
    print(f"posterior mean over f1 at x=0: {float(m1[60]):.4f} ± {float(s1[60]):.4f}")
    print(f"posterior mean over f2 at x=0: {float(m2[60]):.4f} ± {float(s2[60]):.4f}")
    print(f"posterior mean over f3 at x=0: {float(m3[60]):.4f} ± {float(s3[60]):.4f}")
    add_err = float(jnp.max(jnp.abs(m1 + m2 - m3)))
    print(f"additivity |m1 + m2 - m3|_inf = {add_err:.2e}")
    assert add_err < 1e-6

    # Joint posterior samples also decompose additively.
    ys = rand(key, post(xp_all, 1e-9), 5)
    y1, y2, y3 = split(xp_all, ys)
    samp_err = float(jnp.max(jnp.abs(y1 + y2 - y3)))
    print(f"sample additivity err = {samp_err:.2e}")
    assert samp_err < 1e-3
    print("process_decomposition: OK")


if __name__ == "__main__":
    main()
