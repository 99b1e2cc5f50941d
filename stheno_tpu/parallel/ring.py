"""Ring blockwise kernel evaluation + matrix-free CG inference — the GP
analogue of ring attention (SURVEY.md §2.3 'SP' row: "ring-pass input shards
so each chip computes its block-row stream without materialising K").

Where `parallel.big` shards the *storage* of K (each chip holds an
(N/P)×N row slab), this module removes the O(N²) storage entirely: the only
kernel blocks ever materialised are (N/P)×(N/P), streamed through a
`ppermute` ring of input shards.  That unlocks exact-GP *iterative*
inference (CG posterior means/variances) at N where even the sharded matrix
does not fit — N=10⁶ needs a 4 TB K but only a 15 GB ring block at P=64.

Communication pattern per matvec: P ring steps, each moving O(N/P) input +
RHS floats over ICI while the MXU computes an (N/P)² kernel block and a
block GEMM — compute O(N²/P²·c) vs bytes O(N/P), so the ring is
compute-bound for any realistic kernel and XLA overlaps the `ppermute` with
the next block's GEMM.

Entry points (pure, differentiable, jit-able):

- `ring_matvec(mesh, kernel, x, v, noise=...)` — y = (K(x,x)+σ²I) v, K-free.
- `pcg_solve(matvec, b)`                       — batched preconditioned CG
  (`lax.while_loop`, static shapes) for any SPD matvec closure.
- `ring_gp_solve(mesh, kernel, x, b, noise)`   — CG through the ring matvec.
- `ring_posterior_mean_var(mesh, kernel, x, y, noise, xs)` — exact posterior
  marginals at `xs` with no N×N object anywhere.

Reference parity: these compute the same posterior quantities as
AbstractGPs' `posterior`/`marginals` (SURVEY.md §3.3) — by Krylov iteration
instead of factorisation, the standard choice at this scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P


def _mm(a, b):
    from stheno_tpu.ops.blocked_cholesky import _mm as mm

    return mm(a, b)


def ring_matvec(mesh, kernel, x, v, noise=None, axis_name="rows"):
    """y = (K(x, x) + noise·I) v without materialising K anywhere.

    `x`: (N,) or (N, D) row-sharded inputs; `v`: (N,) or (N, K) row-sharded
    right-hand sides.  Each of the P ring steps computes one
    (N/P)×(N/P) kernel block against the in-flight input shard and
    `ppermute`s the (input, RHS) pair to the next device.
    """
    n = x.shape[0]
    p = mesh.shape[axis_name]
    if n % p != 0:
        raise ValueError(f"N={n} must divide over {p} devices (pad inputs)")
    vec = v.ndim == 1
    v2 = v[:, None] if vec else v
    perm = [(i, (i + 1) % p) for i in range(p)]

    def body(x_loc, v_loc):
        n_loc = x_loc.shape[0]
        blk_x, blk_v = x_loc, v_loc
        y = jnp.zeros((n_loc, v_loc.shape[1]), v_loc.dtype)
        for s in range(p):
            K_blk = kernel.matrix(x_loc, blk_x)  # (n_loc, n_loc)
            if noise is not None:
                # the diagonal block is in flight exactly at step s == 0 for
                # every rank (each device starts with its own shard)
                if s == 0:
                    K_blk = K_blk + jnp.asarray(noise, K_blk.dtype) * jnp.eye(
                        n_loc, dtype=K_blk.dtype
                    )
            y = y + _mm(K_blk, blk_v.astype(K_blk.dtype)).astype(y.dtype)
            if s < p - 1:
                blk_x = lax.ppermute(blk_x, axis_name, perm)
                blk_v = lax.ppermute(blk_v, axis_name, perm)
        return y

    in_x = P(axis_name) if x.ndim == 1 else P(axis_name, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(in_x, P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    y = fn(x, v2)
    return y[:, 0] if vec else y


def pcg_solve(matvec, b, precond=None, tol=1e-10, maxiter=1000):
    """Solve A x = b for SPD `matvec` by (optionally preconditioned)
    conjugate gradients — batched over RHS columns, static shapes, one
    `lax.while_loop` (TPU-friendly: no host sync per iteration).

    `b`: (N,) or (N, K).  `precond`: closure applying M⁻¹ (e.g. Jacobi).
    Stops when every column's residual norm ≤ tol·‖b‖ or at `maxiter`.
    Returns (x, iterations).
    """
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    M = precond if precond is not None else (lambda r: r)

    bnorm = jnp.sqrt(jnp.sum(b2 * b2, axis=0))
    atol2 = (tol * bnorm) ** 2

    def mv(X):
        out = matvec(X[:, 0] if vec else X)
        return out[:, None] if vec else out

    x0 = jnp.zeros_like(b2)
    r0 = b2
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=0)

    def cond(state):
        _, r, _, _, k = state
        res2 = jnp.sum(r * r, axis=0)
        return (k < maxiter) & jnp.any(res2 > atol2)

    def step(state):
        x, r, pvec, rz, k = state
        Ap = mv(pvec)
        denom = jnp.sum(pvec * Ap, axis=0)
        # converged columns: freeze (alpha = 0) instead of dividing by ~0
        active = jnp.sum(r * r, axis=0) > atol2
        alpha = jnp.where(active, rz / jnp.where(denom == 0, 1.0, denom), 0.0)
        x = x + alpha[None, :] * pvec
        r = r - alpha[None, :] * Ap
        z = M(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        pvec = z + beta[None, :] * pvec
        return x, r, pvec, rz_new, k + 1

    x, r, _, _, iters = lax.while_loop(cond, step, (x0, r0, p0, rz0, 0))
    return (x[:, 0] if vec else x), iters


def ring_gp_solve(
    mesh, kernel, x, b, noise, tol=1e-10, maxiter=1000, axis_name="rows"
):
    """(K(x,x)+σ²I)⁻¹ b by CG over the ring matvec, Jacobi-preconditioned
    (the diagonal k(x,x)+σ² is O(N) — computed locally, no ring needed)."""
    diag = kernel.diag_same(x) + jnp.asarray(noise, x.dtype)

    def precond(r):
        return r / (diag[:, None] if r.ndim == 2 else diag)

    def mv(v):
        return ring_matvec(mesh, kernel, x, v, noise=noise, axis_name=axis_name)

    return pcg_solve(mv, b, precond=precond, tol=tol, maxiter=maxiter)


def ring_posterior_mean_var(
    mesh, kernel, x, y, noise, xs, tol=1e-10, maxiter=1000, axis_name="rows"
):
    """Exact zero-mean GP posterior marginals at `xs` (replicated, Np small)
    given row-sharded training data — no N×N object anywhere.

        mean = Ks α,          α  = (K+σ²I)⁻¹ y            (one CG solve)
        var  = diag(Kss) − Σ_j Ks[:,j]·V[j,:],  V = (K+σ²I)⁻¹ Ksᵀ
                                                (Np-column CG solve)

    The cross matrices only ever exist as (N/P)×Np local slabs.
    """
    alpha, it1 = ring_gp_solve(
        mesh, kernel, x, y, noise, tol=tol, maxiter=maxiter, axis_name=axis_name
    )
    Ks_T = _cross_slab(mesh, kernel, x, xs, axis_name)  # (N, Np) row-sharded
    V, it2 = ring_gp_solve(
        mesh, kernel, x, Ks_T, noise, tol=tol, maxiter=maxiter,
        axis_name=axis_name,
    )

    def reduce_body(Ks_loc, alpha_loc, V_loc):
        m = lax.psum(_mm(Ks_loc.T, alpha_loc[:, None])[:, 0], axis_name)
        q = lax.psum(jnp.sum(Ks_loc * V_loc, axis=0), axis_name)
        return m, q

    in_spec = (P(axis_name, None), P(axis_name), P(axis_name, None))
    m, q = shard_map(
        reduce_body, mesh=mesh, in_specs=in_spec, out_specs=(P(), P()),
    )(Ks_T, alpha, V)
    var = kernel.diag_same(xs) - q
    return m, var, (it1, it2)


def lanczos_tridiag(matvec, V0, m, reorth=True):
    """Batched Lanczos tridiagonalisation: `V0` (N, P) unit-norm start
    columns, `m` iterations (statically unrolled — m is small).

    Returns (alphas (m, P), betas (m-1, P)).  With `reorth` every new
    vector is re-orthogonalised against the stored basis (full
    reorthogonalisation — the f32-stable choice; costs one extra
    (k·N)×P GEMM pair per step).
    """
    v = V0
    v_prev = jnp.zeros_like(V0)
    beta_prev = jnp.zeros(V0.shape[1], V0.dtype)
    alphas, betas, basis = [], [], [V0]
    for k in range(m):
        w = matvec(v) - beta_prev[None, :] * v_prev
        a = jnp.sum(w * v, axis=0)
        w = w - a[None, :] * v
        if reorth:
            Vb = jnp.stack(basis)  # (k+1, N, P)
            proj = jnp.einsum("knp,np->kp", Vb, w)
            w = w - jnp.einsum("knp,kp->np", Vb, proj)
        alphas.append(a)
        if k < m - 1:
            b = jnp.sqrt(jnp.sum(w * w, axis=0))
            betas.append(b)
            v_prev, beta_prev = v, b
            v = w / jnp.maximum(b, jnp.finfo(w.dtype).tiny)[None, :]
            if reorth:
                basis.append(v)
    return jnp.stack(alphas), (
        jnp.stack(betas) if betas else jnp.zeros((0, V0.shape[1]), V0.dtype)
    )


def slq_logdet(matvec, key, n, m=25, num_probes=16, dtype=jnp.float64):
    """Stochastic Lanczos quadrature estimate of log det(A) for SPD `matvec`
    (Ubaru/Chen/Saad 2017 — the standard scalable-GP logdet estimator).

    Rademacher probes z (‖z‖² = n exactly), m-step Lanczos per probe, then
    logdet ≈ (n/P)·Σᵢ Σⱼ (e₁ᵀuⱼ)² log λⱼ(Tᵢ).  Eigenvalues of T are clamped
    below at tiny to keep f32 runs finite.
    """
    Z = jnp.where(
        jax.random.bernoulli(key, 0.5, (n, num_probes)), 1.0, -1.0
    ).astype(dtype)
    V0 = Z / jnp.sqrt(jnp.asarray(n, dtype))
    alphas, betas = lanczos_tridiag(matvec, V0, m)
    # (P, m, m) tridiagonals → eigh (m is tiny)
    T = jnp.zeros((num_probes, m, m), dtype)
    T = T + jax.vmap(jnp.diag)(alphas.T)
    if m > 1:
        off = jax.vmap(lambda b: jnp.diag(b, 1))(betas.T)
        T = T + off + jnp.swapaxes(off, -1, -2)
    w, U = jnp.linalg.eigh(T)
    w = jnp.maximum(w, jnp.finfo(dtype).tiny)
    quad = jnp.sum(U[:, 0, :] ** 2 * jnp.log(w), axis=-1)  # e₁ weights
    return jnp.asarray(n, dtype) * jnp.mean(quad), Z


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _ring_logpdf(mesh, axis_name, num_probes, m, tol, maxiter,
                 kernel, x, y, noise, key):
    val, _ = _ring_logpdf_fwd_impl(
        mesh, axis_name, num_probes, m, tol, maxiter,
        kernel, x, y, noise, key, need_w=False,
    )
    return val


def _ring_logpdf_fwd_impl(mesh, axis_name, num_probes, m, tol, maxiter,
                          kernel, x, y, noise, key, need_w):
    n = x.shape[0]
    dt = y.dtype

    def mv(V):
        return ring_matvec(mesh, kernel, x, V, noise=noise,
                           axis_name=axis_name)

    alpha, _ = ring_gp_solve(mesh, kernel, x, y, noise, tol=tol,
                             maxiter=maxiter, axis_name=axis_name)
    logdet, Z = slq_logdet(mv, key, n, m=m, num_probes=num_probes, dtype=dt)
    val = -0.5 * (
        n * jnp.log(jnp.asarray(2.0 * jnp.pi, dt))
        + logdet
        + jnp.vdot(y, alpha)
    )
    W = None
    if need_w:
        W, _ = ring_gp_solve(mesh, kernel, x, Z, noise, tol=tol,
                             maxiter=maxiter, axis_name=axis_name)
    return val, (alpha, Z, W)


def _ring_logpdf_fwd(mesh, axis_name, num_probes, m, tol, maxiter,
                     kernel, x, y, noise, key):
    val, (alpha, Z, W) = _ring_logpdf_fwd_impl(
        mesh, axis_name, num_probes, m, tol, maxiter,
        kernel, x, y, noise, key, need_w=True,
    )
    return val, (kernel, x, noise, key, alpha, Z, W)


def _ring_logpdf_bwd(mesh, axis_name, num_probes, m, tol, maxiter, res, g):
    kernel, x, noise, key, alpha, Z, W = res

    # d logpdf = ½ αᵀ(dK̂)α − ½ tr(K̂⁻¹ dK̂); Hutchinson for the trace with
    # the SLQ probes: tr(K̂⁻¹ dK̂) ≈ (1/P) Σᵢ wᵢᵀ (dK̂) zᵢ, wᵢ = K̂⁻¹zᵢ.
    # The surrogate below has exactly that gradient at frozen α, W, Z.
    def surrogate(kernel, x, noise):
        Ka = ring_matvec(mesh, kernel, x, alpha, noise=noise,
                         axis_name=axis_name)
        KZ = ring_matvec(mesh, kernel, x, Z, noise=noise,
                         axis_name=axis_name)
        return 0.5 * jnp.vdot(alpha, Ka) - (0.5 / num_probes) * jnp.sum(
            W * KZ
        )

    _, vjp = jax.vjp(surrogate, kernel, x, noise)
    gk, gx, gn = vjp(g)
    gy = -g * alpha
    return gk, gx, gy, gn, jnp.zeros_like(key)


_ring_logpdf.defvjp(_ring_logpdf_fwd, _ring_logpdf_bwd)


def ring_gp_logpdf(mesh, kernel, x, y, noise, key, num_probes=16,
                   lanczos_iters=25, tol=1e-10, maxiter=1000,
                   axis_name="rows"):
    """Stochastic exact-GP log-marginal-likelihood, matrix-free at ring
    scale: quadratic term by CG (machine-precision), logdet by stochastic
    Lanczos quadrature, gradients by the Hutchinson trace estimator reusing
    the SLQ probes (the GPyTorch/BBMM estimator — Gardner et al. 2018 —
    restructured onto the ppermute ring).

    Differentiable w.r.t. kernel hyperparameters, `x`, `y`, `noise` via a
    custom VJP (two ring matvecs per backward — no factorisation anywhere).
    `key` controls the probes: fixed key → deterministic estimate.
    """
    return _ring_logpdf(mesh, axis_name, num_probes, lanczos_iters, tol,
                        maxiter, kernel, x, y, noise, key)


def _cross_slab(mesh, kernel, x, xs, axis_name):
    """K(x, xs) as a row-sharded (N, Np) slab (xs replicated)."""

    def body(x_loc):
        return kernel.matrix(x_loc, xs)

    in_spec = P(axis_name) if x.ndim == 1 else P(axis_name, None)
    return shard_map(
        body, mesh=mesh, in_specs=(in_spec,), out_specs=P(axis_name, None)
    )(x)
