"""SMC over GP hyperparameters — the north-star SMC engine (BASELINE.json):
adaptive-tempering SMC sweeps particles from the prior to the hyperparameter
posterior, yielding both posterior draws and the model evidence log Z.

The evidence lets you compare GP programme *structures* (here: SE vs Matern
3/2 data-generating kernels), something point estimates can't do.

Run: python examples/smc_model_evidence.py [--platform cpu]
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
from stheno_tpu.inference import run_smc


def make_loglike(build, x, y):
    def loglike(q):
        p = dict(v=jnp.exp(q[0]), l=jnp.exp(q[1]), noise=jnp.exp(q[2]))
        f = build(p)
        return logpdf(f(GPPPInput("f", x), p["noise"]), y)

    return loglike


def logprior(q):
    return -0.5 * jnp.sum(q**2) - 1.5 * jnp.log(2 * jnp.pi)


@gppp
def build_se(p):
    return dict(f=st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"])))


@gppp
def build_m32(p):
    return dict(f=st.GP(p["v"] * st.with_lengthscale(st.Matern32Kernel(), p["l"])))


def main():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(3)

    # data generated from the SE model
    x = jnp.asarray(np.sort(rng.uniform(-4, 4, 50)))
    f_true = build_se(dict(v=1.5, l=1.2))
    y = rand(key, f_true(GPPPInput("f", x), 0.1))

    P_ = 512
    init = jax.random.normal(jax.random.PRNGKey(1), (P_, 3))

    results = {}
    for name, build in [("SE", build_se), ("Matern32", build_m32)]:
        t0 = time.time()
        res = run_smc(
            jax.random.PRNGKey(5),
            make_loglike(build, x, y),
            logprior,
            init,
            num_mcmc=5,
            hmc_step_size=0.25,
            hmc_num_steps=10,
        )
        jax.block_until_ready(res.log_evidence)
        results[name] = res
        print(
            f"{name:9s}: log Z = {float(res.log_evidence):8.2f}  "
            f"({int(res.num_stages)} stages, {time.time()-t0:.1f}s)"
        )

    # the generating model should win the evidence comparison
    lz_se = float(results["SE"].log_evidence)
    lz_m32 = float(results["Matern32"].log_evidence)
    print(f"Bayes factor log(SE/M32) = {lz_se - lz_m32:.2f}")
    assert lz_se > lz_m32, "evidence should favour the generating model"

    # posterior moments from the winning model's particles
    particles = np.asarray(results["SE"].particles)
    post = np.exp(particles)  # (P, 3): v, l, noise
    print(
        f"posterior medians: v={np.median(post[:,0]):.2f} "
        f"l={np.median(post[:,1]):.2f} noise={np.median(post[:,2]):.3f} "
        f"(truth 1.5, 1.2, 0.1)"
    )
    assert 0.4 < np.median(post[:, 1]) < 3.5
    assert np.median(post[:, 2]) < 0.5
    print("smc_model_evidence: OK")


if __name__ == "__main__":
    main()
