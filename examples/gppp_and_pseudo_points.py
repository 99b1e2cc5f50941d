"""GPPP + pseudo-points — BASELINE.json workload #2 (reference
examples/gppp_and_pseudo_points/script.jl): variational pseudo-point (VFE)
inference on a composite GP programme, with inducing points living in a
*latent* process (interdomain), and joint optimisation of hyperparameters +
inducing locations by maximising the collapsed Titsias ELBO.

Scenario: a smooth slowly-varying process f1 plus a faster process f2 are
observed only through their sum f3 at N points; M ≪ N pseudo-points placed
in the latent components summarise the posterior.

Run: python examples/gppp_and_pseudo_points.py [--platform cpu]
"""

import sys
import time

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import (
    BlockData,
    GPPPInput,
    VFE,
    elbo,
    gppp,
    logpdf,
    marginals,
    posterior_vfe,
    rand,
    split,
)
from stheno_tpu import params as P
from stheno_tpu.inference import fit


@gppp
def build(t):
    f1 = st.GP(t["v1"] * st.with_lengthscale(st.SEKernel(), t["l1"]))
    f2 = st.GP(t["v2"] * st.with_lengthscale(st.Matern52Kernel(), t["l2"]))
    return dict(f1=f1, f2=f2, f3=f1 + f2)


def main():
    key = jax.random.PRNGKey(2)
    rng = np.random.default_rng(7)

    # ground truth data from the prior at N = 600
    N, M = 600, 24
    true = dict(
        v1=jnp.asarray(1.0), l1=jnp.asarray(2.0),
        v2=jnp.asarray(0.4), l2=jnp.asarray(0.4),
    )
    noise = 0.05
    x = jnp.asarray(np.sort(rng.uniform(-8, 8, N)))
    f_true = build(true)
    y = rand(key, f_true(GPPPInput("f3", x), noise))

    # variational spec: hyperparameters + inducing inputs in BOTH latents
    spec = dict(
        v1=P.positive(0.8), l1=P.positive(1.0),
        v2=P.positive(0.8), l2=P.positive(1.0),
        noise=P.positive(0.2),
        z=jnp.linspace(-8.0, 8.0, M),  # unconstrained inducing locations
    )

    def neg_elbo(t):
        f = build(t)
        fx = f(GPPPInput("f3", x), t["noise"])
        u = f(
            BlockData(GPPPInput("f1", t["z"]), GPPPInput("f2", t["z"])), 1e-6
        )
        return -elbo(VFE(u), fx, y)

    t0 = time.time()
    res = fit(neg_elbo, spec, num_steps=400, learning_rate=2e-2)
    jax.block_until_ready(res.theta)
    print(
        f"ELBO fit: {time.time() - t0:.1f}s  -elbo {float(res.losses[0]):.1f} → "
        f"{float(res.losses[-1]):.1f}"
    )
    assert res.losses[-1] < res.losses[0]

    theta = res.params
    f = build(theta)
    fx = f(GPPPInput("f3", x), theta["noise"])
    u = f(
        BlockData(GPPPInput("f1", theta["z"]), GPPPInput("f2", theta["z"])), 1e-6
    )
    final_elbo = float(elbo(VFE(u), fx, y))
    exact_lp = float(logpdf(fx, y))
    print(f"final elbo = {final_elbo:.2f} ≤ exact logpdf = {exact_lp:.2f}")
    assert final_elbo <= exact_lp
    # with 2M=48 well-placed pseudo-points the bound should be tight-ish
    assert final_elbo > exact_lp - 0.2 * abs(exact_lp) - 50

    # approximate posterior: predict the latent decomposition
    ap = posterior_vfe(VFE(u), fx, y)
    xp = jnp.linspace(-8, 8, 100)
    xp_all = BlockData(GPPPInput("f1", xp), GPPPInput("f3", xp))
    ms = marginals(ap(xp_all, 1e-9))
    m1, m3 = split(xp_all, ms.mean)
    # f3 approximate-posterior mean should track the data
    rmse = float(
        jnp.sqrt(jnp.mean((jnp.interp(x, xp, m3) - y) ** 2))
    )
    print(f"f3 approx-posterior rmse vs data: {rmse:.3f}")
    assert rmse < 0.35
    print("gppp_and_pseudo_points: OK")


if __name__ == "__main__":
    main()
