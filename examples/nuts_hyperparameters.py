"""NUTS over GP hyperparameters — the reference's getting_started /
turing_integration workload (BASELINE.json config #5): standard-normal priors
on unconstrained hyperparameters, NUTS with Stan adaptation (target accept
0.8), many chains vmapped.

Reference recipe being replicated: examples/getting_started/script.jl:239-263
(AdvancedHMC NUTS + StanHMCAdaptor + ParameterHandling.positive).

Run: python examples/nuts_hyperparameters.py [--platform cpu]
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
from stheno_tpu import GPPPInput, gppp, logpdf, rand
from stheno_tpu import params as P
from stheno_tpu.inference import (
    run_nuts,
    effective_sample_size,
    potential_scale_reduction,
)


def main():
    key = jax.random.PRNGKey(11)

    # ground-truth data from a known GP
    from stheno_tpu.graph import GPC

    gpc = GPC()
    f_true = st.GP(2.0 * st.with_lengthscale(st.SEKernel(), 1.3), gpc=gpc)
    x = jnp.asarray(np.sort(np.random.default_rng(1).uniform(-5, 5, 60)))
    y = rand(key, f_true(x, 0.1))

    # model builder: pure function of constrained hyperparameters
    @gppp
    def build(p):
        return dict(
            f=st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"]))
        )

    spec = dict(v=P.positive(1.0), l=P.positive(1.0), noise=P.positive(0.3))
    theta0, unflatten = P.init(spec)

    def logdensity(theta):
        p = unflatten(theta)
        f = build(p)
        lp = logpdf(f(GPPPInput("f", x), p["noise"]), y)
        # standard-normal prior on the unconstrained params (reference ℓπ,
        # getting_started:239-246)
        return lp - 0.5 * jnp.sum(theta**2)

    n_chains, n_warm, n_samp = 4, 300, 400
    t0 = time.time()
    samples, info = run_nuts(
        key,
        logdensity,
        theta0,
        num_warmup=n_warm,
        num_samples=n_samp,
        num_chains=n_chains,
    )
    samples = jax.block_until_ready(samples)
    dt_total = time.time() - t0

    # NOTE: ravel_pytree sorts dict keys — always map back through
    # `unflatten` rather than assuming insertion order on the flat vector.
    names = ["v", "l", "noise"]
    constrained = {
        nm: np.asarray(jax.vmap(jax.vmap(lambda t: unflatten(t)[nm]))(samples))
        for nm in names
    }
    print(f"NUTS: {n_chains} chains x {n_samp} samples in {dt_total:.1f}s")
    ess_total = 0.0
    for nm in names:
        post = constrained[nm]
        ess = float(effective_sample_size(jnp.log(jnp.asarray(post))))
        rhat = float(potential_scale_reduction(jnp.log(jnp.asarray(post))))
        ess_total += ess
        print(
            f"  {nm:>6}: mean={post.mean():.3f} sd={post.std():.3f} "
            f"ESS={ess:.0f} R̂={rhat:.3f}"
        )
    div = float(np.asarray(info.diverging).mean())
    print(f"  divergence rate: {div:.3%}")
    print(f"  mean accept prob: {float(np.asarray(info.accept_prob).mean()):.3f}")
    print(f"  ESS/s (sum over params): {ess_total / dt_total:.1f}")

    # sanity: true values inside the posterior mass
    v_post, l_post, s_post = (constrained[nm].ravel() for nm in names)
    assert np.quantile(l_post, 0.02) < 1.3 < np.quantile(l_post, 0.98), "l outside"
    assert np.quantile(s_post, 0.02) < 0.1 < np.quantile(s_post, 0.98), "noise outside"
    assert div < 0.05
    print("nuts_hyperparameters: OK")


if __name__ == "__main__":
    main()
