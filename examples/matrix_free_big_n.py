"""Matrix-free exact-GP training + prediction at ring scale.

Where `examples/big_n_sharded.py` shards the *storage* of K (row slabs +
distributed Cholesky), this workload never materialises any N×N object at
all: the kernel exists only as (N/P)×(N/P) blocks streamed through a
`ppermute` ring (`parallel/ring.py`) —

- hyperparameter training on the stochastic log-marginal-likelihood
  (CG quadratic term + SLQ logdet, Hutchinson custom-VJP gradients — the
  BBMM estimator, Gardner et al. 2018, restructured onto the ring);
- exact posterior marginals at prediction points by CG (machine precision,
  no stochasticity).

Reference capability being scaled: logpdf-driven hyperparameter optimisation
+ posterior marginals (examples/getting_started/script.jl) — at N where the
reference's dense path cannot run at all.

Self-checking: recovered hyperparameters near truth; ring posterior ≡ dense
posterior at reduced N.

Run: python examples/matrix_free_big_n.py [--platform cpu] [--fast]
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
from stheno_tpu.parallel import rows_mesh, shard_rows
from stheno_tpu.parallel.ring import ring_gp_logpdf, ring_posterior_mean_var


def main():
    fast = "--fast" in sys.argv
    n_dev = min(8, len(jax.devices()))
    mesh = rows_mesh(n_dev)
    N = 1024 if fast else 4096
    key = jax.random.PRNGKey(0)

    # ground truth: l=0.7, v=1.5, noise=0.1
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(-8, 8, N)))
    k_true = 1.5 * st.with_lengthscale(st.SEKernel(), 0.7)
    f_true = st.GP(k_true, gpc=GPC())
    y = st.rand(key, f_true(x, 0.1))
    x_sh, y_sh = shard_rows(mesh, x), shard_rows(mesh, y)

    def nlml(logp, probe_key):
        v, l, s = jnp.exp(logp)
        k = v * st.with_lengthscale(st.SEKernel(), l)
        return -ring_gp_logpdf(
            mesh, k, x_sh, y_sh, s, probe_key,
            num_probes=8, lanczos_iters=15, tol=1e-8, maxiter=400,
        )

    # Adam on the stochastic objective (fresh probes per step — unbiased
    # gradients; the data term is CG-exact every step)
    import optax

    opt = optax.adam(0.08)
    logp = jnp.log(jnp.asarray([1.0, 1.0, 0.3]))
    state = opt.init(logp)

    @jax.jit
    def train_step(logp, state, probe_key):
        val, g = jax.value_and_grad(nlml)(logp, probe_key)
        upd, state = opt.update(g, state)
        return optax.apply_updates(logp, upd), state, val

    t0 = time.time()
    steps = 20 if fast else 40
    for i in range(steps):
        logp, state, val = train_step(logp, state, jax.random.fold_in(key, i))
    val = float(val)
    v, l, s = [float(z) for z in jnp.exp(logp)]
    print(
        f"matrix-free training: {steps} Adam steps in {time.time()-t0:.1f}s, "
        f"nlml={val:.1f}; v={v:.2f} l={l:.2f} noise={s:.3f} "
        f"(truth 1.5, 0.7, 0.1)"
    )
    assert 0.4 < l < 1.2 and 0.05 < s < 0.2, "hyperparameters off"

    # exact posterior marginals by ring CG at the learned hyperparameters
    k_fit = v * st.with_lengthscale(st.SEKernel(), l)
    xs = jnp.linspace(-6.0, 6.0, 64)
    m, var, (it1, it2) = jax.jit(
        lambda xx, yy: ring_posterior_mean_var(
            mesh, k_fit, xx, yy, s, xs, tol=1e-10, maxiter=600
        )
    )(x_sh, y_sh)
    print(
        f"ring posterior at 64 points: CG iters {int(it1)}/{int(it2)}, "
        f"mean range [{float(m.min()):.2f}, {float(m.max()):.2f}], "
        f"var range [{float(var.min()):.4f}, {float(var.max()):.4f}]"
    )
    assert bool(jnp.all(var > 0)), "negative posterior variance"

    # parity with the dense path at reduced N (same code path, small slice)
    n_red = 512
    xr, yr = x[:n_red], y[:n_red]
    mr, vr, _ = ring_posterior_mean_var(
        mesh, k_fit, shard_rows(mesh, xr), shard_rows(mesh, yr), s, xs,
        tol=1e-12, maxiter=800,
    )
    f = st.GP(k_fit, gpc=GPC())
    post = st.posterior(f(xr, s), yr)
    dm = float(jnp.max(jnp.abs(mr - post.mean(xs))))
    dv = float(jnp.max(jnp.abs(vr - post.var(xs))))
    print(f"ring vs dense posterior at N={n_red}: |Δmean|={dm:.2e} |Δvar|={dv:.2e}")
    assert dm < 1e-6 and dv < 1e-6
    print("matrix_free_big_n: OK")


if __name__ == "__main__":
    main()
