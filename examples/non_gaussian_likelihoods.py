"""Non-Gaussian observation models — classification and counts.

The reference deliberately scopes these out and points users at Turing
(`/root/reference/README.md:243-258`); here they are first-class
(SURVEY.md §0): the same GPPP graphs compose with

1. **Probit GP classification** via the Laplace approximation
   (`inference.laplace`), with hyperparameters learned by maximising the
   Laplace evidence (gradients flow through the damped-Newton scan);
2. **Log-Gaussian-Cox-style Poisson counts on a composite programme** —
   counts observed through f3 = trend + wiggle; the latent *trend* is read
   off the Laplace posterior by cross-process prediction;
3. **Non-conjugate SVGP** (Hensman et al. 2015) — the minibatch-scalable
   route, trained by Adam on the quadrature ELBO.

Self-checking: held-out classification accuracy, latent recovery
correlation, and ELBO improvement are asserted.

Run: python examples/non_gaussian_likelihoods.py [--platform cpu]
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
from stheno_tpu import GPPPInput, gppp, rand
from stheno_tpu import params as P
from stheno_tpu.graph import GPC
from stheno_tpu.inference import (
    BernoulliLikelihood,
    PoissonLikelihood,
    laplace,
    svgp_init,
    svgp_elbo,
    svgp_posterior,
    fit,
)

rng = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# 1. Probit classification with Laplace + evidence-based hyperparameters
# ---------------------------------------------------------------------------
print("== probit GP classification (Laplace) ==")
N = 120
x = jnp.asarray(np.sort(rng.uniform(-4, 4, N)))
x_test = jnp.linspace(-3.8, 3.8, 200)

gpc = GPC()
f_gen = st.GP(2.0 * st.with_lengthscale(st.SEKernel(), 1.0), gpc=gpc)
f_latent = np.asarray(rand(jax.random.PRNGKey(0), f_gen(jnp.concatenate([x, x_test]), 1e-9)))
f_tr, f_te = f_latent[:N], f_latent[N:]
y = jnp.asarray(rng.uniform(size=N) < jax.scipy.stats.norm.cdf(f_tr), jnp.float64)
y_te = f_te > 0

lik = BernoulliLikelihood()  # probit


def neg_evidence(p):
    gpc = GPC()
    g = st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"]), gpc=gpc)
    return -laplace(g(x, 1e-9), y, lik, num_iters=20).log_evidence


t0 = time.time()
res = fit(neg_evidence, dict(v=P.positive(1.0), l=P.positive(0.5)),
          num_steps=60, learning_rate=0.1)
p_hat = res.params
print(f"  learned: v={float(p_hat['v']):.2f} l={float(p_hat['l']):.2f} "
      f"(evidence fit {time.time()-t0:.1f}s)")

gpc = GPC()
g = st.GP(p_hat["v"] * st.with_lengthscale(st.SEKernel(), p_hat["l"]), gpc=gpc)
fit_res = laplace(g(x, 1e-9), y, lik, num_iters=25)
p_te, _ = lik.predictive_mean_var(
    fit_res.posterior.mean(x_test), fit_res.posterior.var(x_test)
)
acc = float(np.mean((np.asarray(p_te) > 0.5) == np.asarray(y_te)))
print(f"  held-out accuracy: {acc:.3f}   newton decrement "
      f"{float(fit_res.newton_decrement):.2e}")
assert acc > 0.85, acc
assert float(fit_res.newton_decrement) < 1e-8


# ---------------------------------------------------------------------------
# 2. Poisson counts through a composite programme + latent trend recovery
# ---------------------------------------------------------------------------
print("== Poisson counts on f3 = trend + wiggle (Laplace, cross-process) ==")


@gppp
def build(t):
    trend = st.GP(st.with_lengthscale(st.SEKernel(), 2.5))
    wiggle = st.GP(0.3 * st.with_lengthscale(st.Matern32Kernel(), 0.4))
    return dict(trend=trend, wiggle=wiggle, f3=trend + wiggle)


prog = build({})
xc = jnp.asarray(np.sort(rng.uniform(-4, 4, 150)))
joint = rand(
    jax.random.PRNGKey(3),
    prog(st.BlockData(GPPPInput("f3", xc), GPPPInput("trend", xc)), 1e-9),
)
f3_true, trend_true = np.split(np.asarray(joint), 2)
counts = jnp.asarray(rng.poisson(np.exp(f3_true)), jnp.float64)

resP = laplace(prog(GPPPInput("f3", xc), 1e-9), counts, PoissonLikelihood(),
               num_iters=30)
f3_hat = np.asarray(resP.posterior.mean(GPPPInput("f3", xc)))
trend_hat = np.asarray(resP.posterior.mean(GPPPInput("trend", xc)))
corr_f3 = float(np.corrcoef(f3_hat, f3_true)[0, 1])
corr_tr = float(np.corrcoef(trend_hat, trend_true)[0, 1])
print(f"  log-intensity correlation: f3 {corr_f3:.3f}, latent trend {corr_tr:.3f}")
# the observed process is well determined; the trend/wiggle split is only
# partially identifiable from counts, so its bar is looser
assert corr_f3 > 0.85, corr_f3
assert corr_tr > 0.5, corr_tr
assert float(resP.newton_decrement) < 1e-7
# conditioning on counts shrinks the latent trend's predictive variance
v_post = np.asarray(resP.posterior.var(GPPPInput("trend", xc)))
v_prior = np.asarray(prog.var(GPPPInput("trend", xc)))
assert np.all(v_post < v_prior) and np.all(v_post > 0)


# ---------------------------------------------------------------------------
# 3. Non-conjugate SVGP classification (minibatch-scalable route)
# ---------------------------------------------------------------------------
print("== non-conjugate SVGP (Bernoulli ELBO, Adam) ==")
import optax
from stheno_tpu.inference.svgp import SVGP

z = jnp.linspace(-3.8, 3.8, 20)
fz = g(z, 1e-9)  # reuse the evidence-learned kernel
q0 = svgp_init(fz)
e0 = float(svgp_elbo(q0, g(x, 1e-9), y, likelihood=lik))

params = dict(q_mu=q0.q_mu, q_sqrt=q0.q_sqrt)
opt = optax.adam(0.1)
state = opt.init(params)


@jax.jit
def step(params, state):
    def loss(p):
        q = SVGP(fz, p["q_mu"], p["q_sqrt"])
        return -svgp_elbo(q, g(x, 1e-9), y, likelihood=lik)

    val, grads = jax.value_and_grad(loss)(params)
    upd, state = opt.update(grads, state)
    return optax.apply_updates(params, upd), state, val


for i in range(300):
    params, state, val = step(params, state)
e1 = -float(val)
q_fit = SVGP(fz, params["q_mu"], params["q_sqrt"])
post = svgp_posterior(q_fit)
p_sv, _ = lik.predictive_mean_var(post.mean(x_test), post.var(x_test))
acc_sv = float(np.mean((np.asarray(p_sv) > 0.5) == np.asarray(y_te)))
print(f"  ELBO {e0:.1f} → {e1:.1f}; held-out accuracy {acc_sv:.3f}")
assert e1 > e0 + 1.0
assert acc_sv > 0.85, acc_sv

# SVGP and Laplace agree on the predictive decision function
agree = float(np.mean((np.asarray(p_sv) > 0.5) == (np.asarray(p_te) > 0.5)))
print(f"  SVGP/Laplace decision agreement: {agree:.3f}")
assert agree > 0.9, agree

print("OK")
