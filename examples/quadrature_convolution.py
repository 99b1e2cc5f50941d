"""Quadrature convolution — the reference's convolutional_gp /
quadrature-convolution examples: a latent process f smoothed by a Gaussian
window via fixed-node quadrature; observing the smoothed process and reading
off the latent is Bayesian deconvolution.

Run: python examples/quadrature_convolution.py [--platform cpu]
"""

import sys

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import GPPPInput, BlockData, gppp, marginals, posterior, rand, split
from stheno_tpu.graph import convolve_quadrature, cross_cov


def gaussian_window(width):
    def w(x, tau):
        d = jnp.asarray(x)[:, None] - jnp.asarray(tau)[None, :]
        return jnp.exp(-0.5 * (d / width) ** 2) / (
            width * jnp.sqrt(2.0 * jnp.pi)
        )

    return w


@gppp
def model():
    f = st.GP(st.with_lengthscale(st.SEKernel(), 0.4))
    nodes = jnp.linspace(-6.0, 6.0, 241)
    Cf = convolve_quadrature(f, gaussian_window(0.5), nodes)
    return dict(f=f, Cf=Cf)


def main():
    key = jax.random.PRNGKey(8)
    rng = np.random.default_rng(8)
    g = model()

    # analytic check: SE(l) convolved twice with a Gaussian(width σw) is an
    # SE with variance-preserving widening: cov(Cf) at lag d equals
    # s² · SE(sqrt(l² + 2σw²)) with s² = l²/(l²+2σw²) ... (1-D Gaussians)
    x = jnp.linspace(-2.0, 2.0, 9)
    K_cf = np.asarray(g["Cf"].cov(x))
    l, sw = 0.4, 0.5
    l_eff = np.sqrt(l**2 + 2 * sw**2)
    s2 = l / l_eff
    d = np.subtract.outer(np.asarray(x), np.asarray(x))
    K_true = s2 * np.exp(-0.5 * (d / l_eff) ** 2)
    err = float(np.max(np.abs(K_cf - K_true)))
    print(f"|cov(Cf) - analytic Gaussian-convolution cov|_inf = {err:.2e}")
    assert err < 5e-4  # quadrature resolution limited

    # deconvolution: observe the SMOOTHED process, recover the latent
    xo = jnp.asarray(np.sort(rng.uniform(-3, 3, 60)))
    yo = rand(key, g(GPPPInput("Cf", xo), 1e-4))
    post = posterior(g(GPPPInput("Cf", xo), 1e-4), yo)

    xp = jnp.linspace(-2.5, 2.5, 101)
    xp_all = BlockData(GPPPInput("f", xp), GPPPInput("Cf", xp))
    ms = marginals(post(xp_all, 1e-9))
    m_f, m_cf = split(xp_all, ms.mean)
    v_f, v_cf = split(xp_all, ms.var)

    assert np.all(np.isfinite(np.asarray(ms.mean)))
    # the latent is less identified than the smoothed observable
    assert float(np.mean(np.asarray(v_f))) > float(np.mean(np.asarray(v_cf)))
    # the smoothed posterior mean is, indeed, smoother (smaller second diffs)
    curv = lambda m: float(np.mean(np.abs(np.diff(np.asarray(m), 2))))
    print(f"mean curvature: latent {curv(m_f):.4f} vs smoothed {curv(m_cf):.4f}")
    assert curv(m_cf) < curv(m_f)
    print("quadrature_convolution: OK")


if __name__ == "__main__":
    main()
