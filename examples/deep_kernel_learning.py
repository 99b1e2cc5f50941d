"""Deep kernel learning — the reference's flux_integration example analogue:
a neural feature map (flax MLP) feeding a GP kernel, with network weights
and GP hyperparameters trained jointly by exact marginal likelihood.

In the reference this leans on Flux.jl + Zygote; here the MLP is just
another input transform in the kernel (`TransformedKernel`), its parameters
are pytree leaves, and the whole nlml-optimisation loop is one jitted scan.

Run: python examples/deep_kernel_learning.py [--platform cpu]
"""

import sys
import time

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

import stheno_tpu as st
from stheno_tpu import GPPPInput, TransformedKernel, gppp, logpdf, marginals, posterior
from stheno_tpu import params as P
from stheno_tpu.inference import fit


class FeatureNet(nn.Module):
    """Small MLP feature map R -> R^4."""

    @nn.compact
    def __call__(self, x):
        h = x[:, None] if x.ndim == 1 else x
        h = nn.tanh(nn.Dense(16)(h))
        h = nn.tanh(nn.Dense(16)(h))
        return nn.Dense(4)(h)


def main():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    net = FeatureNet()

    # step-function-ish data: hard for a stationary kernel, easy for a
    # learned warp
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, 120)))
    y = jnp.asarray(np.sign(np.asarray(x)) + 0.1 * rng.normal(size=120))

    w0 = net.init(key, x)

    @gppp
    def build(p):
        feat = lambda xx: net.apply(p["w"], xx)
        k = p["v"] * TransformedKernel(st.SEKernel(), feat)
        return dict(f=st.GP(k))

    def nlml(p):
        f = build(p)
        return -logpdf(f(GPPPInput("f", x), p["noise"]), y)

    spec = dict(w=w0, v=P.positive(1.0), noise=P.positive(0.2))
    t0 = time.time()
    res = fit(nlml, spec, num_steps=600, learning_rate=1e-2)
    jax.block_until_ready(res.theta)
    print(
        f"joint NN+GP fit: {time.time()-t0:.1f}s  "
        f"nlml {float(res.losses[0]):.1f} → {float(res.losses[-1]):.1f}"
    )
    assert res.losses[-1] < res.losses[0] - 20

    p = res.params
    f = build(p)
    post = posterior(f(GPPPInput("f", x), p["noise"]), y)
    xp = jnp.linspace(-2.5, 2.5, 201)
    ms = marginals(post(GPPPInput("f", xp), 1e-9))
    pred_sign_acc = float(
        np.mean(np.sign(np.asarray(ms.mean)[np.abs(np.asarray(xp)) > 0.3])
                == np.sign(np.asarray(xp)[np.abs(np.asarray(xp)) > 0.3]))
    )
    print(f"sign accuracy away from the step: {pred_sign_acc:.2%}")
    assert pred_sign_acc > 0.95
    print("deep_kernel_learning: OK")


if __name__ == "__main__":
    main()
