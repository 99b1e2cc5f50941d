"""Sequential Monte Carlo over hyperparameter space (BASELINE.json north-star
component; no reference equivalent — Stheno delegates all inference).

Adaptive-tempering SMC sampler:

- particles move through the tempered family  π_β ∝ prior · likelihood^β;
- β grows adaptively so the effective sample size of the incremental weights
  stays near `ess_target` (bisection on conditional ESS, on-device);
- systematic resampling;
- mutation via `num_mcmc` HMC steps targeting the current tempered density.

TPU-first: particles are a (P, d) array — every stage (weighting, bisection,
resampling, HMC mutation) is batched linear algebra / vmapped leapfrog, so P
in the thousands runs at full MXU/VPU utilisation, and the particle axis can
be sharded over a `('chains',)` mesh (stheno_tpu.parallel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp
from jax import lax

from stheno_tpu.inference.hmc import hmc_kernel


class SMCState(NamedTuple):
    particles: jnp.ndarray  # (P, d)
    log_like: jnp.ndarray  # (P,)
    beta: jnp.ndarray
    log_evidence: jnp.ndarray
    step: jnp.ndarray


class SMCResult(NamedTuple):
    particles: object  # pytree of (P, ...)
    log_evidence: jnp.ndarray
    num_stages: jnp.ndarray
    beta_history: jnp.ndarray


def _systematic_resample(key, weights, n):
    """Systematic resampling: O(P), vectorised (searchsorted)."""
    positions = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    cum = jnp.cumsum(weights)
    cum = cum / cum[-1]
    return jnp.searchsorted(cum, positions)


def _conditional_ess(log_like, beta_old, beta_new):
    lw = (beta_new - beta_old) * log_like
    lw = lw - jnp.max(lw)
    w = jnp.exp(lw)
    return jnp.sum(w) ** 2 / jnp.sum(w * w)


def _next_beta(log_like, beta, ess_target_frac, n_particles, iters=30):
    """Bisection for the largest β' ≤ 1 with cESS ≥ target."""
    target = ess_target_frac * n_particles

    def cond_ok(b):
        return _conditional_ess(log_like, beta, b) >= target

    full = jnp.asarray(1.0, log_like.dtype)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = cond_ok(mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = lax.fori_loop(
        0, iters, body, (beta, full)
    )
    return jnp.where(cond_ok(full), full, lo)


def run_smc(
    key,
    loglike_fn,
    logprior_fn,
    init_particles,
    num_mcmc=5,
    ess_target=0.5,
    max_stages=50,
    hmc_step_size=0.2,
    hmc_num_steps=16,
):
    """Adaptive-tempering SMC.

    `init_particles`: pytree of (P, ...) arrays — prior draws.
    Returns SMCResult with final particles ≈ draws from prior·likelihood,
    plus the log-evidence estimate.
    """
    flat_p, unravel_one = _ravel_particles(init_particles)
    P_, d = flat_p.shape
    dt = flat_p.dtype

    def flat_loglike(q):
        return loglike_fn(unravel_one(q))

    def flat_logprior(q):
        return logprior_fn(unravel_one(q))

    v_loglike = jax.vmap(flat_loglike)

    def make_mutation(beta):
        def logdensity(q):
            return flat_logprior(q) + beta * flat_loglike(q)

        return hmc_kernel(logdensity, num_steps=hmc_num_steps)

    def stage(state: SMCState, key):
        k_beta, k_res, k_mut = jax.random.split(key, 3)
        beta_new = _next_beta(state.log_like, state.beta, ess_target, P_)

        # incremental weights + evidence
        lw = (beta_new - state.beta) * state.log_like
        lw_max = jnp.max(lw)
        w = jnp.exp(lw - lw_max)
        log_evidence = state.log_evidence + lw_max + jnp.log(jnp.mean(w))

        # resample
        idx = _systematic_resample(k_res, w, P_)
        particles = state.particles[idx]

        # mutate with HMC at the new temperature
        step_fn = make_mutation(beta_new)
        inv_mass = jnp.ones((d,), dt)

        def mcmc_iter(carry, kk):
            q, logp, grad = carry
            keys = jax.random.split(kk, P_)
            q, logp, grad, _ = jax.vmap(
                lambda k_, q_, l_, g_: step_fn(
                    k_, q_, l_, g_, jnp.asarray(hmc_step_size, dt), inv_mass
                )
            )(keys, q, logp, grad)
            return (q, logp, grad), None

        ld = lambda q: flat_logprior(q) + beta_new * flat_loglike(q)
        logp0, grad0 = jax.vmap(jax.value_and_grad(ld))(particles)
        mut_keys = jax.random.split(k_mut, num_mcmc)
        (particles, _, _), _ = lax.scan(
            mcmc_iter, (particles, logp0, grad0), mut_keys
        )

        return SMCState(
            particles=particles,
            log_like=v_loglike(particles),
            beta=beta_new,
            log_evidence=log_evidence,
            step=state.step + 1,
        )

    init_state = SMCState(
        particles=flat_p,
        log_like=v_loglike(flat_p),
        beta=jnp.asarray(0.0, dt),
        log_evidence=jnp.asarray(0.0, dt),
        step=jnp.asarray(0, jnp.int32),
    )

    def cond(carry):
        state, _, _ = carry
        return (state.beta < 1.0) & (state.step < max_stages)

    def body(carry):
        state, key, betas = carry
        key, sub = jax.random.split(key)
        state = stage(state, sub)
        betas = betas.at[state.step - 1].set(state.beta)
        return state, key, betas

    betas0 = jnp.full((max_stages,), jnp.nan, dt)
    final, _, betas = lax.while_loop(cond, body, (init_state, key, betas0))

    particles_tree = jax.vmap(unravel_one)(final.particles)
    return SMCResult(
        particles=particles_tree,
        log_evidence=final.log_evidence,
        num_stages=final.step,
        beta_history=betas,
    )


def _ravel_particles(tree):
    """Flatten a pytree of (P, ...) arrays into (P, d) + per-particle
    unravel."""
    leaves = jax.tree_util.tree_leaves(tree)
    P_ = leaves[0].shape[0]
    one = jax.tree_util.tree_map(lambda a: a[0], tree)
    _, unravel_one = jax.flatten_util.ravel_pytree(one)
    flat = jax.vmap(lambda i: jax.flatten_util.ravel_pytree(
        jax.tree_util.tree_map(lambda a: a[i], tree)
    )[0])(jnp.arange(P_))
    return flat, unravel_one
