"""Extended Mauna-Loa-style workload — BASELINE.json workload #4 (reference
examples/extended_mauna_loa/script.jl): a structured multi-output GPPP with a
*shared* trend process, per-output wiggle/periodic components, and joint
hyperparameter optimisation over both outputs at N ~ 10³.

Model (same structure as the reference's build_gp, script.jl:120-137):

  f_trend        = stretch(GP(SE), λ_trend)                 shared trend
  f_co2 = σ_l·f_trend + σ_w·stretch(GP(SE), λ_w)
          + σ_p·(GP(SE) ∘ Periodic(freq)) + σ_m·GP(Const)   CO₂-like output
  f_T   = σ_t·f_trend + σ_w'·stretch(GP(SE), λ_w') + σ_m'·GP(Const)  temp-like

Observed jointly at different input sets with different noises; fit by Adam
on the exact nlml (the reference uses Optim.LBFGS + Zygote — here the whole
optimisation loop is one jitted lax.scan).  Data is synthetic with the same
qualitative structure (trend + seasonality + noise); the reference's CSV is
not redistributed.

Run: python examples/extended_mauna_loa.py [--platform cpu]
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
    Periodic,
    TransformedKernel,
    gppp,
    logpdf,
    marginals,
    posterior,
    split,
)
from stheno_tpu import params as P
from stheno_tpu.inference import fit


@gppp
def build_gp(t):
    f_trend = st.stretch(st.GP(st.SEKernel()), t["trend_scale"])

    co2 = t["co2"]
    f_co2_latent = co2["s_latent"] * f_trend
    f_co2_wiggle = co2["s_wiggle"] * st.stretch(st.GP(st.SEKernel()), co2["l_wiggle"])
    f_co2_period = co2["s_period"] * st.GP(
        TransformedKernel(st.SEKernel(), Periodic(co2["freq"]))
    )
    f_co2 = (
        f_co2_latent + f_co2_wiggle + f_co2_period
        + co2["s_mean"] * st.GP(st.ConstantKernel(jnp.asarray(1.0)))
    )

    T = t["temp"]
    f_T_trend = T["s_trend"] * f_trend
    f_T_wiggle = T["s_wiggle"] * st.stretch(st.GP(st.SEKernel()), T["l_wiggle"])
    f_T = f_T_trend + f_T_wiggle + T["s_mean"] * st.GP(st.ConstantKernel(jnp.asarray(1.0)))

    return dict(f_trend=f_trend, f_co2=f_co2, f_T=f_T)


def synthetic_data(rng, n_co2=480, n_T=360):
    """CO2-like (trend+seasonal) and temperature-like (trend) series,
    standardised, on overlapping but distinct yearly grids."""
    t_co2 = np.linspace(1980.0, 2020.0, n_co2)
    t_T = np.linspace(1985.0, 2020.0, n_T)
    co2 = (
        0.8 * (t_co2 - 2000.0) / 10.0
        + 0.05 * ((t_co2 - 2000.0) / 10.0) ** 2
        + 0.35 * np.sin(2 * np.pi * t_co2)
        + 0.12 * np.cos(4 * np.pi * t_co2)
        + 0.05 * rng.normal(size=n_co2)
    )
    temp = (
        0.6 * (t_T - 2000.0) / 10.0
        + 0.3 * rng.normal(size=n_T)
    )
    co2 = (co2 - co2.mean()) / co2.std()
    temp = (temp - temp.mean()) / temp.std()
    return (jnp.asarray(t_co2 - 2000.0), jnp.asarray(co2),
            jnp.asarray(t_T - 2000.0), jnp.asarray(temp))


def main():
    rng = np.random.default_rng(0)
    x_co2, y_co2, x_T, y_T = synthetic_data(rng)
    n_co2, n_T = len(y_co2), len(y_T)

    x = BlockData(GPPPInput("f_co2", x_co2), GPPPInput("f_T", x_T))
    y = jnp.concatenate([y_co2, y_T])

    spec = dict(
        trend_scale=P.positive(0.1),
        co2=dict(
            s_latent=P.positive(0.3),
            s_wiggle=P.positive(0.3),
            l_wiggle=P.positive(5.0),
            s_period=P.positive(0.3),
            freq=P.fixed(1.0),
            s_noise=P.positive(0.1),
            s_mean=P.positive(1.0),
        ),
        temp=dict(
            s_trend=P.positive(1.0),
            s_wiggle=P.positive(1.0),
            l_wiggle=P.positive(0.5),
            s_noise=P.positive(0.1),
            s_mean=P.positive(1.0),
        ),
    )

    def obs_noise(t):
        return jnp.concatenate(
            [
                jnp.full((n_co2,), t["co2"]["s_noise"] ** 2),
                jnp.full((n_T,), t["temp"]["s_noise"] ** 2),
            ]
        )

    def nlml(t):
        f = build_gp(t)
        return -logpdf(f(x, obs_noise(t)), y)

    t0 = time.time()
    res = fit(nlml, spec, num_steps=250, learning_rate=3e-2)
    jax.block_until_ready(res.theta)
    print(
        f"fit: {time.time() - t0:.1f}s  nlml {float(res.losses[0]):.1f} → "
        f"{float(res.losses[-1]):.1f}"
    )
    assert res.losses[-1] < res.losses[0] - 50, "optimisation made no progress"

    # posterior predictions: CO2 forecast + latent trend extraction
    theta = res.params
    f = build_gp(theta)
    post = posterior(f(x, obs_noise(theta)), y)
    xp = jnp.linspace(-22.0, 25.0, 200)
    xp_all = BlockData(
        GPPPInput("f_co2", xp), GPPPInput("f_T", xp), GPPPInput("f_trend", xp)
    )
    ms = marginals(post(xp_all, 1e-9))
    m_co2, m_T, m_tr = split(xp_all, ms.mean)
    v_co2, v_T, v_tr = split(xp_all, ms.var)
    assert np.all(np.isfinite(np.asarray(ms.mean)))
    # in-sample fit quality on CO2
    ms_in = marginals(post(GPPPInput("f_co2", x_co2), 1e-9))
    rmse = float(jnp.sqrt(jnp.mean((ms_in.mean - y_co2) ** 2)))
    print(f"CO2 in-sample rmse: {rmse:.3f} (data sd = 1.0)")
    assert rmse < 0.3
    # seasonal structure: short-range periodicity visible in forecast region
    print(
        f"forecast var at +5y: {float(np.interp(5.0, xp, np.asarray(v_co2))):.3f}; "
        f"shared trend var at +5y: {float(np.interp(5.0, xp, np.asarray(v_tr))):.3f}"
    )
    print("extended_mauna_loa: OK")


if __name__ == "__main__":
    main()
