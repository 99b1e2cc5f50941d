"""Neural kernel network — the reference's second flux_integration example
analogue (`examples/flux_integration/neural_kernel_network/time_series.jl`):
a trainable composition of 8 primitive kernels through positive linear and
product layers (Sun et al. 2018), fit by exact marginal likelihood on an
airline-passengers-style seasonal series, then extrapolated 3 years.

Differences from the reference, by design (this is not a port):

- the NKN is a first-class library kernel (`stheno_tpu.NeuralKernelNetwork`),
  a frozen pytree whose layer log-weights AND primitive hyperparameters are
  leaves — one `jax.grad` trains everything jointly, no Flux/Zygote split;
- the whole Adam loop is one jitted `lax.scan` (`inference.fit`);
- the dataset is synthesised (trend x multiplicative seasonality + noise)
  rather than shipped as a CSV, so the example is self-contained and
  self-checking (held-out RMSE bound).

Run: python examples/neural_kernel_network.py [--platform cpu] [--fast]
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
    LinearLayer,
    NeuralKernelNetwork,
    ProductLayer,
    gppp,
    logpdf,
    marginals,
    posterior,
    with_lengthscale,
)
from stheno_tpu import params as P
from stheno_tpu.inference import fit


def airline_style_series(rng, n_months=144):
    """Monthly totals with linear-plus-curved trend and multiplicative
    yearly seasonality — the AirPassengers shape, synthesised."""
    t = np.arange(n_months) / 12.0  # years
    season = 1.0 + 0.22 * np.sin(2 * np.pi * t - 0.7) + 0.08 * np.sin(
        4 * np.pi * t + 0.4
    )
    trend = 110.0 + 26.0 * t + 0.8 * t**2
    return t, trend * season * np.exp(0.02 * rng.normal(size=n_months))


def main():
    fast = "--fast" in sys.argv
    rng = np.random.default_rng(4)
    t, y_raw = airline_style_series(rng)

    # train on the first 9 years, extrapolate the last 3 (reference split:
    # year < 1958 trains)
    n_train = 108
    xm, xs = t[:n_train].mean(), t[:n_train].std()
    ym, ys = y_raw[:n_train].mean(), y_raw[:n_train].std()
    x = jnp.asarray((t - xm) / xs)
    y = jnp.asarray((y_raw - ym) / ys)
    xtr, ytr = x[:n_train], y[:n_train]
    xte, yte = x[n_train:], y[n_train:]

    # median pairwise distance of the standardised training inputs — the
    # reference's lengthscale-initialisation heuristic
    dists = np.abs(np.subtract.outer(np.asarray(xtr), np.asarray(xtr)))
    l = float(np.median(dists[np.triu_indices(n_train, 1)]))
    period = float(1.0 / 12.0 / xs) * 12.0  # one year in standardised units

    # 8 primitive kernels (linear / periodic / SE / RQ at two scales each —
    # the reference's Primitive(...) bank), hyperparameters trainable
    def primitives(p):
        return (
            with_lengthscale(st.LinearKernel(), p["l_lin1"]),
            with_lengthscale(st.PeriodicKernel(r=p["r_per1"]), p["p_per1"]),
            with_lengthscale(st.SEKernel(), p["l_se1"]),
            with_lengthscale(
                st.RationalQuadraticKernel(alpha=p["a_rq1"]), p["l_rq1"]),
            with_lengthscale(st.LinearKernel(), p["l_lin2"]),
            with_lengthscale(
                st.RationalQuadraticKernel(alpha=p["a_rq2"]), p["l_rq2"]),
            with_lengthscale(st.SEKernel(), p["l_se2"]),
            with_lengthscale(st.PeriodicKernel(r=p["r_per2"]), p["p_per2"]),
        )

    # layer stack: 8 -> 8 -> (product) 4 -> 4 -> (product) 2 -> 1
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    layers0 = (
        LinearLayer.init(k0, 8, 8),
        ProductLayer(),
        LinearLayer.init(k1, 4, 4),
        ProductLayer(),
        LinearLayer.init(k2, 2, 1),
    )

    spec = dict(
        # primitive hyperparameters: positive via bijector
        l_lin1=P.positive(1.0), l_lin2=P.positive(3.0),
        p_per1=P.positive(period), r_per1=P.positive(1.0),
        p_per2=P.positive(period), r_per2=P.positive(0.7),
        l_se1=P.positive(l / 4.0), l_se2=P.positive(l),
        a_rq1=P.positive(0.2), l_rq1=P.positive(2.0 * l),
        a_rq2=P.positive(0.1), l_rq2=P.positive(l),
        # network weights: raw log-scale leaves (pass-through, trained
        # unconstrained; exponentiated inside the layers)
        layers=layers0,
        noise=P.positive(0.1, lb=1e-4),
    )

    @gppp
    def build(p):
        k = NeuralKernelNetwork(primitives(p), tuple(p["layers"]))
        return dict(f=st.GP(k))

    def nlml(p):
        f = build(p)
        return -logpdf(f(GPPPInput("f", xtr), p["noise"]), ytr)

    steps = 120 if fast else 600
    res = fit(nlml, spec, num_steps=steps, learning_rate=2e-2)
    print(f"nlml: {float(res.losses[0]):.2f} -> {float(res.losses[-1]):.2f}")
    assert float(res.losses[-1]) < float(res.losses[0])

    # condition on the training years, predict the full range
    p = res.params
    f = build(p)
    post = posterior(f(GPPPInput("f", xtr), p["noise"]), ytr)
    ms = marginals(post(GPPPInput("f", x), 1e-8))
    mean, std = ms.mean, ms.std

    rmse_tr = float(jnp.sqrt(jnp.mean((mean[:n_train] - ytr) ** 2)))
    rmse_te = float(jnp.sqrt(jnp.mean((mean[n_train:] - yte) ** 2)))
    # naive persistence-of-trend baseline: straight line through the
    # training data, no seasonality
    A = jnp.stack([xtr, jnp.ones_like(xtr)], axis=1)
    coef, *_ = jnp.linalg.lstsq(A, ytr)
    rmse_lin = float(
        jnp.sqrt(jnp.mean((coef[0] * xte + coef[1] - yte) ** 2)))
    print(f"train rmse {rmse_tr:.3f}  3-year extrapolation rmse {rmse_te:.3f}"
          f"  (linear-trend baseline {rmse_lin:.3f})")
    print(f"mean posterior std on test years: "
          f"{float(jnp.mean(std[n_train:])):.3f}")

    # self-checks: the NKN must fit the training years tightly and
    # extrapolate the seasonal structure better than the trend-only baseline
    assert rmse_tr < 0.25, rmse_tr
    assert rmse_te < rmse_lin, (rmse_te, rmse_lin)
    if not fast:
        assert rmse_te < 0.6, rmse_te
    print("neural_kernel_network: OK")


if __name__ == "__main__":
    main()
