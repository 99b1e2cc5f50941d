"""The five reference workload model families (BASELINE.json configs),
as parametric GPPP builders.

Each function returns a `GPPP`; all are pure in their hyperparameter
arguments so they can be rebuilt under jit/grad each objective evaluation
(the reference's `build_model(θ)` idiom,
examples/getting_started/script.jl:111-117).
"""

from __future__ import annotations

import jax.numpy as jnp

import stheno_tpu as st
from stheno_tpu import gppp
from stheno_tpu.graph import Periodic
from stheno_tpu.kernels import TransformedKernel


@gppp
def process_decomposition(l1=1.0, l2=0.5):
    """f3 = f1 + f2 (README / process_decomposition example)."""
    f1 = st.GP(st.with_lengthscale(st.SEKernel(), l1))
    f2 = st.GP(st.with_lengthscale(st.SEKernel(), l2))
    return dict(f1=f1, f2=f2, f3=f1 + f2)


@gppp
def sensor_fusion():
    """Latent f observed through two structured-noise sensors
    (examples/sensor_fusion)."""
    f = st.GP(st.SEKernel())
    noise1 = jnp.sqrt(1e-2) * st.GP(st.WhiteKernel()) + (
        lambda x: jnp.sin(x) - 5.0 + jnp.sqrt(jnp.abs(x))
    )
    noise2 = jnp.sqrt(1e-1) * st.GP(3.5, st.WhiteKernel())
    return dict(f=f, noise1=noise1, noise2=noise2, y1=f + noise1, y2=f + noise2)


@gppp
def mauna_loa_style(t):
    """Shared-trend multi-output structured model
    (examples/extended_mauna_loa build_gp)."""
    f_trend = st.stretch(st.GP(st.SEKernel()), t["trend_scale"])
    co2 = t["co2"]
    f_co2 = (
        co2["s_latent"] * f_trend
        + co2["s_wiggle"] * st.stretch(st.GP(st.SEKernel()), co2["l_wiggle"])
        + co2["s_period"]
        * st.GP(TransformedKernel(st.SEKernel(), Periodic(co2["freq"])))
        + co2["s_mean"] * st.GP(st.ConstantKernel(jnp.asarray(1.0)))
    )
    T = t["temp"]
    f_T = (
        T["s_trend"] * f_trend
        + T["s_wiggle"] * st.stretch(st.GP(st.SEKernel()), T["l_wiggle"])
        + T["s_mean"] * st.GP(st.ConstantKernel(jnp.asarray(1.0)))
    )
    return dict(f_trend=f_trend, f_co2=f_co2, f_T=f_T)


@gppp
def pseudo_points_model(t):
    """Composite model for interdomain pseudo-point inference
    (examples/gppp_and_pseudo_points)."""
    f1 = st.GP(t["v1"] * st.with_lengthscale(st.SEKernel(), t["l1"]))
    f2 = st.GP(t["v2"] * st.with_lengthscale(st.Matern52Kernel(), t["l2"]))
    return dict(f1=f1, f2=f2, f3=f1 + f2)


@gppp
def hyperparameter_model(p):
    """Single-output model whose hyperparameter posterior is sampled with
    NUTS (getting_started / turing_integration style)."""
    return dict(f=st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"])))


WORKLOADS = {
    "process_decomposition": process_decomposition,
    "sensor_fusion": sensor_fusion,
    "extended_mauna_loa": mauna_loa_style,
    "gppp_and_pseudo_points": pseudo_points_model,
    "turing_integration": hyperparameter_model,
}
