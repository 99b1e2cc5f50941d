"""Big-N exact GP across a device mesh — the distributed path (SURVEY.md
§2.3): kernel-matrix rows sharded over a `('rows',)` mesh, distributed
blocked Cholesky + panel solves via psum/all_gather, with gradients flowing
through the collectives.

Runs on the 8-virtual-device CPU mesh by default so it can be validated
anywhere; on a real pod slice the same code spans chips over ICI.

Run: python examples/big_n_sharded.py
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

import stheno_tpu as st
from stheno_tpu.parallel import rows_mesh, big_gp_logpdf


def main():
    mesh = rows_mesh(8)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    N, B = 2048, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-10, 10, N)))
    from stheno_tpu.graph import GPC

    gpc = GPC()
    f = st.GP(st.with_lengthscale(st.SEKernel(), 1.0), gpc=gpc)
    y = st.rand(jax.random.PRNGKey(0), f(x, 0.1))

    # distributed exact log-marginal-likelihood + hyperparameter gradient
    @jax.jit
    def nlml_and_grad(log_l, log_noise):
        def nlml(ll, ln):
            k = st.with_lengthscale(st.SEKernel(), jnp.exp(ll))
            return -big_gp_logpdf(
                mesh, k, x, y, noise=jnp.exp(ln), block_size=B
            )

        return jax.value_and_grad(nlml, argnums=(0, 1))(log_l, log_noise)

    t0 = time.time()
    val, (g_l, g_n) = nlml_and_grad(jnp.asarray(0.0), jnp.asarray(jnp.log(0.1)))
    jax.block_until_ready(val)
    print(
        f"distributed nlml = {float(val):.2f}  grad=({float(g_l):.3f}, "
        f"{float(g_n):.3f})  [{time.time()-t0:.1f}s incl. compile]"
    )

    # cross-check against the single-device dense path
    lp_ref = st.logpdf(f(x, 0.1), y)
    err = abs(float(val) + float(lp_ref))
    print(f"|distributed - dense| = {err:.2e}")
    assert err < 1e-6

    # a short distributed gradient descent on the hyperparameters
    # (normalised gradients: raw grads scale with N)
    ll, ln = jnp.asarray(0.3), jnp.asarray(jnp.log(0.3))
    for i in range(25):
        v, (gl, gn) = nlml_and_grad(ll, ln)
        norm = jnp.maximum(jnp.sqrt(gl**2 + gn**2), 1.0)
        ll, ln = ll - 0.05 * gl / norm, ln - 0.05 * gn / norm
    print(
        f"after 25 distributed GD steps: l={float(jnp.exp(ll)):.3f} "
        f"noise={float(jnp.exp(ln)):.3f} (truth 1.0, 0.1)"
    )
    assert 0.5 < float(jnp.exp(ll)) < 2.0
    print("big_n_sharded: OK")


if __name__ == "__main__":
    main()
