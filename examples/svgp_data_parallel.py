"""Data-parallel SVGP classification at data scale (SURVEY.md §2.3 DP row;
VERDICT r2 item 6).

A Bernoulli-likelihood SVGP (Hensman et al. 2015) trained by Adam on
minibatches that are **sharded over a ('data',) mesh axis**: every device
computes its shard's expected log-likelihood against the replicated M×M
inducing factors, one `psum` assembles the unbiased data term, and
`jax.grad` through the collective IS the all-reduced data-parallel
gradient.  The reference delegates non-Gaussian likelihoods and scale to
the Julia ecosystem (README.md:243-258); here both are first-class.

Runs on the 8-virtual-device CPU mesh by default so it validates anywhere;
on a pod slice the same code spans chips over ICI.

Run: python examples/svgp_data_parallel.py [--n 100000] [--steps 60]
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import jax.numpy as jnp
import numpy as np
import optax

import stheno_tpu as st
from stheno_tpu.graph import GPC
from stheno_tpu.inference import BernoulliLikelihood
from stheno_tpu.inference.svgp import SVGP, svgp_init, svgp_posterior
from stheno_tpu.parallel import svgp_elbo_dp, data_mesh, shard_batch


def _arg(flag, default, cast):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def main():
    n_total = _arg("--n", 100_000, int)
    steps = _arg("--steps", 60, int)
    batch = 4096
    m_ind = 48

    mesh = data_mesh(8)
    print(f"mesh: {dict(mesh.shape)}; N={n_total}, |B|={batch}, M={m_ind}")

    # synthetic classification data: latent f(x) = sin(2x)·e^{-x²/8},
    # labels y ~ Bernoulli(Φ(3 f(x)))
    rng = np.random.default_rng(0)
    x_all = rng.uniform(-6, 6, n_total)
    f_true = np.sin(2 * x_all) * np.exp(-(x_all**2) / 8)
    p_true = np.asarray(jax.scipy.special.ndtr(3 * f_true))
    y_all = (rng.uniform(size=n_total) < p_true).astype(np.float64)

    gpc = GPC()
    f = st.GP(1.5 * st.with_lengthscale(st.SEKernel(), 1.0), gpc=gpc)
    z = jnp.linspace(-6, 6, m_ind)
    lik = BernoulliLikelihood()
    fz = f(z, 1e-9)
    q0 = svgp_init(fz)

    params = dict(q_mu=q0.q_mu, q_sqrt=q0.q_sqrt)
    opt = optax.adam(0.15)
    state = opt.init(params)
    scale = n_total / batch

    @jax.jit
    def train_step(params, state, xb, yb):
        def loss(p):
            q = SVGP(fz, p["q_mu"], p["q_sqrt"])
            return -svgp_elbo_dp(
                mesh, q, f(xb, 1e-9), yb, scale=scale, likelihood=lik
            )

        val, g = jax.value_and_grad(loss)(params)
        upd, state2 = opt.update(g, state)
        return optax.apply_updates(params, upd), state2, val

    t0 = time.time()
    val0 = None
    with mesh:
        for it in range(steps):
            idx = rng.integers(0, n_total, batch)
            xb = shard_batch(mesh, jnp.asarray(x_all[idx]))
            yb = shard_batch(mesh, jnp.asarray(y_all[idx]))
            params, state, val = train_step(params, state, xb, yb)
            if val0 is None:
                val0 = float(val)
            if it % 20 == 0:
                print(f"  step {it:4d}  -elbo/N = {float(val)/n_total:.4f}")
    print(f"{steps} sharded steps in {time.time()-t0:.1f}s")

    # predictive check on a held-out grid: the fitted q recovers p(x)
    q = SVGP(fz, params["q_mu"], params["q_sqrt"])
    post = svgp_posterior(q)
    xg = jnp.linspace(-5, 5, 200)
    mu, var = post.mean_and_var(xg)
    p_hat, _ = lik.predictive_mean_var(mu, var)
    f_g = np.sin(2 * np.asarray(xg)) * np.exp(-(np.asarray(xg) ** 2) / 8)
    p_g = np.asarray(jax.scipy.special.ndtr(3 * f_g))
    rmse = float(np.sqrt(np.mean((np.asarray(p_hat) - p_g) ** 2)))
    final = float(val) / n_total
    assert float(val) < float(val0), "ELBO did not improve"
    assert rmse < 0.15, f"predictive rmse {rmse:.3f}"
    print(f"predictive probability rmse vs truth: {rmse:.3f}")
    print("svgp_data_parallel: OK")


if __name__ == "__main__":
    main()
