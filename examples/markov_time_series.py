"""Exact large-N time-series GP via the state-space (Markov) path.

The reference points large-N time series away from itself at
TemporalGPs.jl (`/root/reference/README.md:20`) and hard-errors rather
than materialise big dense covariances (`src/gp/sparse_finite_gp.jl:39-43`).
This workload runs that exact use case natively: a Matérn-mixture GP on
N = 100k (CPU-fast: 20k) irregular time points — logpdf, hyperparameter
training, and posterior marginals all in O(N) work / O(log N) depth
(`stheno_tpu/markov.py`, parallel Kalman on `lax.associative_scan`), a
size where the dense O(N³) path is off the table on any hardware.

Self-checking:
- markov logpdf ≡ dense GPPP logpdf at reduced N (exact-method check);
- Adam on the markov nlml recovers the generating hyperparameters;
- posterior marginals at held-out sites beat the prior RMSE and the
  truth lies inside the 95% band ≥ ~90% of the time.

Run: python examples/markov_time_series.py [--platform cpu] [--fast]
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
from stheno_tpu.graph import GPC
from stheno_tpu.markov import markov_gp_logpdf, markov_gp_posterior_marginals


def make_kernel(logp):
    v1, l1, v2, l2 = jnp.exp(logp)
    return (v1 * st.with_lengthscale(st.Matern32Kernel(), l1)
            + v2 * st.with_lengthscale(st.Matern12Kernel(), l2))


def main():
    fast = "--fast" in sys.argv
    N = 20_000 if fast else 100_000
    noise = 0.1
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 400.0, N)))

    # ground truth: slow Matern32 trend + fast Matern12 wiggle
    logp_true = jnp.log(jnp.asarray([1.5, 8.0, 0.4, 0.5]))
    y = np.asarray(_sample_markov(make_kernel(logp_true), x, noise,
                                  jax.random.PRNGKey(0)))

    # --- exactness check vs the dense path at reduced N -----------------
    ns = 600
    lp_m = float(markov_gp_logpdf(make_kernel(logp_true), x[:ns], y[:ns],
                                  noise))
    f = st.GP(make_kernel(logp_true), gpc=GPC())
    lp_d = float(st.logpdf(f(x[:ns], noise), jnp.asarray(y[:ns])))
    assert abs(lp_m - lp_d) < 1e-7 * abs(lp_d), (lp_m, lp_d)
    print(f"exactness at N={ns}: markov {lp_m:.4f} == dense {lp_d:.4f}")

    # --- train on the full N by Adam on the O(N) nlml -------------------
    yj = jnp.asarray(y)

    @jax.jit
    def nlml(logp):
        return -markov_gp_logpdf(make_kernel(logp), x, yj, noise) / N

    val_grad = jax.jit(jax.value_and_grad(nlml))
    logp = jnp.log(jnp.asarray([1.0, 3.0, 1.0, 1.5]))  # deliberately off
    m = jnp.zeros_like(logp)
    vv = jnp.zeros_like(logp)
    lr, b1, b2 = 0.08, 0.9, 0.999
    t0 = time.time()
    steps = 60 if fast else 80
    for i in range(1, steps + 1):
        v, g = val_grad(logp)
        m = b1 * m + (1 - b1) * g
        vv = b2 * vv + (1 - b2) * g * g
        mh = m / (1 - b1**i)
        vh = vv / (1 - b2**i)
        logp = logp - lr * mh / (jnp.sqrt(vh) + 1e-8)
        if i % 20 == 0:
            print(f"  step {i:3d} nlml/N {float(v):.4f} "
                  f"theta {np.exp(np.asarray(logp)).round(3)}")
    print(f"trained N={N} in {time.time()-t0:.1f}s "
          f"({steps} Adam steps, O(N) logpdf+grad each)")
    err = np.abs(np.asarray(logp - logp_true))
    assert np.all(err < 0.7), f"hyperparameters off in log-space: {err}"
    print(f"recovered {np.exp(np.asarray(logp)).round(3)} "
          f"(truth {np.exp(np.asarray(logp_true)).round(3)})")

    # --- posterior marginals at held-out sites --------------------------
    xs = jnp.asarray(np.sort(rng.uniform(5.0, 395.0, 2000)))
    ys_true = np.interp(np.asarray(xs), np.asarray(x), y)  # dense x: fine
    mean, var = jax.jit(
        lambda lp: markov_gp_posterior_marginals(
            make_kernel(lp), x, yj, noise, x_star=xs))(logp)
    mean, var = np.asarray(mean), np.asarray(var)
    rmse = float(np.sqrt(np.mean((mean - ys_true) ** 2)))
    prior_rmse = float(np.sqrt(np.mean(ys_true**2)))
    band = 1.96 * np.sqrt(var + noise)
    cover = float(np.mean(np.abs(mean - ys_true) < band))
    print(f"held-out rmse {rmse:.4f} (prior {prior_rmse:.4f}); "
          f"95% band coverage {cover:.3f}")
    assert rmse < 0.5 * prior_rmse
    assert cover > 0.9
    print("markov_time_series: OK")


def _sample_markov(kernel, x, noise, key):
    """O(N) prior draw by sequentially propagating the discretised SDE —
    the Markov analogue of `rand` (a dense N-point draw would be O(N³))."""
    from stheno_tpu.markov import _discretise

    A, Q, H, Pinf = _discretise(kernel, x, jnp.float64)
    # jitter the PSD-by-construction process covs for the per-step chol
    eps = 1e-12 * jnp.trace(Pinf)
    eye = jnp.eye(Pinf.shape[0], dtype=Pinf.dtype)
    L = jnp.linalg.cholesky(Q + eps * eye[None])
    zs = jax.random.normal(key, (x.shape[0], Pinf.shape[0]), Pinf.dtype)
    yk = jax.random.normal(jax.random.fold_in(key, 1), x.shape,
                           Pinf.dtype) * jnp.sqrt(noise)

    def step(z, inp):
        Ak, Lk, zk = inp
        z = Ak @ z + Lk @ zk
        return z, H @ z

    _, fs = jax.lax.scan(step, jnp.zeros_like(zs[0]), (A, L, zs))
    return fs + yk


if __name__ == "__main__":
    main()
