"""Big-N exact GP across a device mesh — the distributed path (SURVEY.md
§2.3): kernel-matrix rows sharded over a `('rows',)` mesh, distributed
blocked Cholesky + panel solves via psum/all_gather, with gradients flowing
through the collectives.

Runs on the 8-virtual-device CPU mesh by default so it can be validated
anywhere; on a real pod slice the same code spans chips over ICI.

Run: python examples/big_n_sharded.py [--n 32768] [--fast]
(`--n` sets the sharded-GPPP section's N; the default 4096 keeps the CPU
mesh fast — 32k exercises the VERDICT-scale run and takes tens of minutes
on 2 CPU cores, minutes on a real slice.)
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

    fast = "--fast" in sys.argv
    N, B = (512, 64) if fast else (2048, 128)
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
    gd_steps = 10 if fast else 25
    for i in range(gd_steps):
        v, (gl, gn) = nlml_and_grad(ll, ln)
        norm = jnp.maximum(jnp.sqrt(gl**2 + gn**2), 1.0)
        ll, ln = ll - 0.05 * gl / norm, ln - 0.05 * gn / norm
    print(
        f"after {gd_steps} distributed GD steps: l={float(jnp.exp(ll)):.3f} "
        f"noise={float(jnp.exp(ln)):.3f} (truth 1.0, 0.1)"
    )
    assert 0.5 < float(jnp.exp(ll)) < 2.0

    # ----------------------------------------------------------------------
    # Full GPPP path, sharded (parallel/gppp.py): a COMPOSITE programme
    # f3 = f1 + f2 — condition on :f3 across the mesh, predict :f1 marginals
    # from the row-sharded factor (the reference's "process decomposition",
    # at distributed scale).
    # ----------------------------------------------------------------------
    from stheno_tpu import GPPPInput, gppp
    from stheno_tpu.parallel import sharded_logpdf, sharded_posterior, sharded_rand

    @gppp
    def build(theta):
        f1 = st.GP(theta["v"] * st.with_lengthscale(st.SEKernel(), theta["l"]))
        f2 = st.GP(st.Matern32Kernel())
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    theta = dict(v=jnp.asarray(1.5), l=jnp.asarray(1.0))
    # big-N for the sharded run; default moderate so the example stays fast
    # on the CPU mesh — pass --n 32768 for the full-scale demonstration
    Ng = (
        int(sys.argv[sys.argv.index("--n") + 1])
        if "--n" in sys.argv
        else (1024 if fast else 4096)
    )
    xg = jnp.linspace(-10.0, 10.0, Ng)
    xp = jnp.linspace(-8.0, 8.0, 256)
    # panel width: the distributed factorisation unrolls N/Bg panels at
    # trace time, so keep the count ≤ ~32 as N grows (same rule as the
    # single-chip blocked Cholesky)
    Bg = max(B, Ng // 32)

    @jax.jit
    def sample_prior(key):
        return sharded_rand(key, mesh, build(theta)(GPPPInput("f3", xg), 0.1),
                            block_size=Bg)

    yg = sample_prior(jax.random.PRNGKey(1))

    @jax.jit
    def fit_and_predict(theta, yg):
        fth = build(theta)
        fx = fth(GPPPInput("f3", xg), 0.1)
        lp = sharded_logpdf(mesh, fx, yg, block_size=Bg)
        post = sharded_posterior(mesh, fx, yg, block_size=Bg)
        m1, v1 = post.mean_and_var(GPPPInput("f1", xp))
        return lp, m1, v1

    t0 = time.time()
    lp, m1, v1 = fit_and_predict(theta, yg)
    jax.block_until_ready(m1)
    print(
        f"sharded GPPP: N={Ng} logpdf={float(lp):.1f}; predicted :f1 at "
        f"{xp.shape[0]} points [{time.time()-t0:.1f}s incl. compile]"
    )

    # exactness vs the dense path at reduced N (same code path, small N)
    Nd = 512
    xd = jnp.linspace(-10.0, 10.0, Nd)
    fd = build(theta)
    fxd = fd(GPPPInput("f3", xd), 0.1)
    yd = st.rand(jax.random.PRNGKey(2), fxd)
    lp_sh = float(jax.jit(
        lambda y: sharded_logpdf(mesh, fxd, y, block_size=64))(yd))
    lp_d = float(st.logpdf(fxd, yd))
    post_d = st.posterior(fxd, yd)
    m_sh, v_sh = jax.jit(
        lambda y: sharded_posterior(mesh, fxd, y, block_size=64).mean_and_var(
            GPPPInput("f1", xp)
        )
    )(yd)
    m_d, v_d = post_d.mean_and_var(GPPPInput("f1", xp))
    err_lp = abs(lp_sh - lp_d)
    err_m = float(jnp.max(jnp.abs(m_sh - m_d)))
    err_v = float(jnp.max(jnp.abs(v_sh - v_d)))
    print(f"sharded vs dense: |Δlogpdf|={err_lp:.2e} |Δmean|={err_m:.2e} "
          f"|Δvar|={err_v:.2e}")
    assert err_lp < 1e-6 and err_m < 1e-8 and err_v < 1e-8
    print("big_n_sharded: OK")


if __name__ == "__main__":
    main()
