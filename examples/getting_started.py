"""Getting started — the reference's full tour (examples/getting_started/
script.jl): exact inference in a GPPP, then three ways to learn
hyperparameters — gradient-free Nelder–Mead, BFGS with exact gradients, and
NUTS — driven by the constrained-parameter utilities (`stheno_tpu.params`,
the ParameterHandling.jl equivalent).

Plots are replaced with self-checking assertions; every section mirrors the
reference's code structure (citations inline).

Run: python examples/getting_started.py [--platform cpu] [--fast]
(`--fast` shrinks the optimiser/NUTS iteration counts for smoke suites;
every section and assertion still runs.)
"""

import sys
import time

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import scipy.optimize

import stheno_tpu as st
from stheno_tpu import GPPPInput, gppp, logpdf, marginals, posterior, rand
from stheno_tpu import params as P
from stheno_tpu.inference import (
    effective_sample_size,
    potential_scale_reduction,
    run_nuts,
)


# ---------------------------------------------------------------------------
# Exact Inference in a GP in 2 Minutes (script.jl:15-99)
# ---------------------------------------------------------------------------
# build_model is a pure function of the hyperparameters — the reference's
# `build_model(θ)` pattern (script.jl:111-117), retraced under jit.
@gppp
def build_model(t):
    f1 = t["s1"] * st.stretch(st.GP(st.Matern52Kernel()), 1.0 / t["l1"])
    f2 = t["s2"] * st.stretch(st.GP(st.SEKernel()), 1.0 / t["l2"])
    return dict(f1=f1, f2=f2, f3=f1 + f2)


def main():
    fast = "--fast" in sys.argv
    key = jax.random.PRNGKey(0)

    # Short length-scale & small variance; long length-scale & larger
    # variance (script.jl:27-33).
    truth = dict(l1=0.4, s1=0.2, l2=5.0, s2=1.0)
    f = build_model({k: jnp.asarray(v) for k, v in truth.items()})

    x_raw = jnp.linspace(-5.0, 5.0, 100)
    x = GPPPInput("f3", x_raw)
    noise_true = 0.02
    fx = f(x, noise_true)
    key, sub = jax.random.split(key)
    y = rand(sub, fx)

    lml = float(logpdf(fx, y))
    print(f"log marginal likelihood under the true model: {lml:.3f}")

    # posterior over the whole programme; query *components* of the GPPP at
    # prediction points (script.jl:70-99)
    f_post = posterior(fx, y)
    x_plot = jnp.linspace(-7.0, 7.0, 200)
    for pname in ("f3", "f2", "f1"):
        ms = marginals(f_post(GPPPInput(pname, x_plot), 1e-9))
        assert np.all(np.asarray(ms.var) > -1e-9)
        print(f"posterior over {pname}: mean in [{float(ms.mean.min()):+.2f}, "
              f"{float(ms.mean.max()):+.2f}]")
    key, sub = jax.random.split(key)
    smp = rand(sub, f_post(GPPPInput("f3", x_plot), 1e-9), 10)
    assert smp.shape == (200, 10)

    # the posterior must interpolate: rmse at the data ≪ prior rmse
    m_at_x = marginals(f_post(x, 1e-9)).mean
    rmse_post = float(jnp.sqrt(jnp.mean((m_at_x - y) ** 2)))
    rmse_prior = float(jnp.sqrt(jnp.mean(y**2)))
    print(f"rmse at data: posterior {rmse_post:.4f} vs prior {rmse_prior:.4f}")
    assert rmse_post < 0.3 * rmse_prior

    # ------------------------------------------------------------------
    # Fit a GP with NelderMead in 2 Minutes (script.jl:100-160)
    # ------------------------------------------------------------------
    spec = dict(
        l1=P.positive(0.4),
        s1=P.positive(0.2),
        l2=P.positive(5.0),
        s2=P.positive(1.0),
        # noise learnt too, constrained ≥ 1e-3 (positive(0.1, exp, 1e-3),
        # script.jl:134)
        s_noise=P.positive(0.1, lb=1e-3),
    )
    theta0, unflatten = P.init(spec)

    @jax.jit
    def nlml(theta):
        t = unflatten(theta)
        fm = build_model(t)
        return -logpdf(fm(x, t["s_noise"] + 1e-6), y)

    rng = np.random.default_rng(42)
    theta_init = np.asarray(theta0) + 0.1 * rng.normal(size=theta0.shape)
    nlml0 = float(nlml(jnp.asarray(theta_init)))

    t0 = time.time()
    res_nm = scipy.optimize.minimize(
        lambda t: float(nlml(jnp.asarray(t))),
        theta_init,
        method="Nelder-Mead",
        options=dict(maxiter=300 if fast else 2000, xatol=1e-6, fatol=1e-8),
    )
    print(f"Nelder-Mead: nlml {nlml0:.2f} → {res_nm.fun:.2f} "
          f"({res_nm.nit} iters, {time.time()-t0:.1f}s)")
    assert res_nm.fun < nlml0

    # ------------------------------------------------------------------
    # Fit a GP with BFGS in 2 minutes (script.jl:205-230) — exact gradients
    # via jax.value_and_grad in place of Zygote
    # ------------------------------------------------------------------
    vg = jax.jit(jax.value_and_grad(nlml))

    def fun_jac(t):
        v, g = vg(jnp.asarray(t))
        return float(v), np.asarray(g, dtype=float)

    t0 = time.time()
    res_bfgs = scipy.optimize.minimize(
        fun_jac, theta_init, jac=True, method="BFGS",
        options=dict(maxiter=120 if fast else 500),
    )
    print(f"BFGS:        nlml {nlml0:.2f} → {res_bfgs.fun:.2f} "
          f"({res_bfgs.nit} iters, {time.time()-t0:.1f}s)")
    assert res_bfgs.fun <= res_nm.fun + 1.0  # "almost indistinguishable"

    t_opt = unflatten(jnp.asarray(res_bfgs.x))
    print("  learnt:", {k: round(float(v), 3) for k, v in t_opt.items()})
    # the learnt noise should be in the vicinity of the truth
    assert 0.2 * noise_true < float(t_opt["s_noise"]) < 5 * noise_true

    # posterior under learnt hyperparameters beats the initial ones
    f_opt = build_model(t_opt)
    lml_opt = float(logpdf(f_opt(x, t_opt["s_noise"]), y))
    assert lml_opt >= -float(res_nm.fun) - 1e-6
    print(f"lml at BFGS optimum: {lml_opt:.3f} (true-model lml {lml:.3f})")

    # ------------------------------------------------------------------
    # Inference with NUTS in 2 minutes (script.jl:239-263): ℓπ(θ) =
    # -nlml(θ) + standard-normal prior on the flat unconstrained params
    # ------------------------------------------------------------------
    def logdensity(theta):
        return -nlml(theta) - 0.5 * jnp.sum(theta**2)

    key, sub = jax.random.split(key)
    t0 = time.time()
    samples, info = run_nuts(
        sub, logdensity, jnp.asarray(theta_init),
        num_warmup=80 if fast else 150, num_samples=120 if fast else 250,
        num_chains=4,
    )
    samples = jax.block_until_ready(samples)
    print(f"NUTS: 4 chains x 250 samples in {time.time()-t0:.1f}s; "
          f"divergences {float(np.asarray(info.diverging).mean()):.2%}")
    # posterior over the noise hyperparameter should cover the truth
    s_noise = np.asarray(
        jax.vmap(jax.vmap(lambda t: unflatten(t)["s_noise"]))(samples)
    )
    rhat = float(potential_scale_reduction(jnp.log(jnp.asarray(s_noise))))
    ess = float(effective_sample_size(jnp.log(jnp.asarray(s_noise))))
    print(f"  s_noise: mean {s_noise.mean():.4f}  R̂ {rhat:.3f}  ESS {ess:.0f}")
    assert np.quantile(s_noise, 0.01) < noise_true < np.quantile(s_noise, 0.99)
    assert rhat < 1.2

    print("getting_started: OK")


if __name__ == "__main__":
    main()
