"""HMC / NUTS — first-class hyperparameter-posterior engines (SURVEY.md §3.6;
the reference delegates this to AdvancedHMC, examples/getting_started/
script.jl:239-263 — NUTS, Stan adaptation, target accept 0.8).

TPU-first design:

- The No-U-Turn sampler is the *iterative, fixed-memory* formulation: a
  checkpoint stack of static size `max_depth` replaces recursion, so the whole
  transition is one `lax.while_loop` nest with static shapes — vmappable over
  thousands of chains and shardable over a `('chains',)` mesh axis
  (stheno_tpu.parallel.chains).  Divergent tree depths across chains are
  handled by the while_loop semantics under vmap (each chain masks off when
  done).
- Multinomial (energy-weighted) progressive sampling within the trajectory,
  biased progressive sampling across doublings, generalized U-turn criterion
  with velocity endpoints — the modern Stan-style sampler.
- Warmup = Stan window adaptation: dual-averaging step size (target accept
  0.8 default, matching the reference's `NesterovDualAveraging(0.8)`) +
  Welford diagonal mass-matrix estimation in doubling windows.

The positions are flat vectors; `run_nuts` adapts pytree positions at the
edge via ravel_pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp
from jax import lax

__all__ = ["nuts_kernel", "hmc_kernel", "run_nuts", "nuts_warmup", "warmup_result", "WarmupState", "NUTSInfo", "window_adaptation_schedule"]


_DIVERGENCE_THRESHOLD = 1000.0


class IntegratorState(NamedTuple):
    q: jnp.ndarray  # position
    r: jnp.ndarray  # momentum
    logp: jnp.ndarray
    grad: jnp.ndarray


def _leapfrog(logdensity_and_grad, state: IntegratorState, eps, inv_mass):
    r = state.r + 0.5 * eps * state.grad
    q = state.q + eps * inv_mass * r
    logp, grad = logdensity_and_grad(q)
    r = r + 0.5 * eps * grad
    return IntegratorState(q, r, logp, grad)


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(r * r * inv_mass)


def _energy(state: IntegratorState, inv_mass):
    return -state.logp + _kinetic(state.r, inv_mass)


def _velocity(r, inv_mass):
    return inv_mass * r


def _is_turning(rho, v_left, v_right):
    """Generalized U-turn criterion with velocity endpoints (Stan)."""
    return (jnp.dot(rho, v_left) <= 0) | (jnp.dot(rho, v_right) <= 0)


def _trailing_ones(n):
    # popcount((n ^ (n+1)) >> 1) == number of trailing 1-bits of n
    return lax.population_count((n ^ (n + 1)) >> 1)


class _SubtreeState(NamedTuple):
    i: jnp.ndarray  # leaf counter within subtree
    z: IntegratorState  # current (rightmost-in-direction) leaf
    cum_rho: jnp.ndarray  # momentum prefix-sum including leaf i
    prop_q: jnp.ndarray  # multinomial proposal within subtree
    prop_logp: jnp.ndarray
    prop_grad: jnp.ndarray
    logw: jnp.ndarray  # logsumexp of leaf weights
    sum_accept: jnp.ndarray  # Σ min(1, e^{H0-H}) for adaptation statistic
    turning: jnp.ndarray
    diverging: jnp.ndarray
    q_ck: jnp.ndarray  # (max_depth+1, d) checkpoint positions... momenta
    r_ck: jnp.ndarray
    cum_ck: jnp.ndarray
    key: jnp.ndarray


def _build_subtree(
    logdensity_and_grad, key, z0, depth, eps, direction, inv_mass, H0, max_depth
):
    """Build a subtree of 2^depth leapfrog leaves starting *after* z0 in
    `direction`, with fixed-memory U-turn checkpointing.

    Returns (z_end, rho_subtree, proposal(q,logp,grad), logw, turning,
    diverging, sum_accept, n_leaves).
    """
    d = z0.q.shape[0]
    n_leaves_max = 1 << depth  # traced int ok with lax.shift_left
    dt = z0.q.dtype

    init = _SubtreeState(
        i=jnp.asarray(0, jnp.int32),
        z=z0,
        cum_rho=jnp.zeros((d,), dt),
        prop_q=z0.q,
        prop_logp=z0.logp,
        prop_grad=z0.grad,
        logw=jnp.asarray(-jnp.inf, dt),
        sum_accept=jnp.asarray(0.0, dt),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        q_ck=jnp.zeros((max_depth + 1, d), dt),
        r_ck=jnp.zeros((max_depth + 1, d), dt),
        cum_ck=jnp.zeros((max_depth + 1, d), dt),
        key=key,
    )

    def cond(s: _SubtreeState):
        return (s.i < n_leaves_max) & ~s.turning & ~s.diverging

    def body(s: _SubtreeState):
        z = _leapfrog(logdensity_and_grad, s.z, direction * eps, inv_mass)
        H = _energy(z, inv_mass)
        delta = H - H0
        # NaN energies (Cholesky failures at extreme hyperparameters, inf
        # positions) count as divergences: ~(delta < thr) is True for NaN.
        diverging = ~(delta < _DIVERGENCE_THRESHOLD)
        logw_leaf = jnp.where(jnp.isnan(delta), -jnp.inf, -delta)
        accept_leaf = jnp.where(
            jnp.isnan(delta), 0.0, jnp.clip(jnp.exp(-delta), max=1.0)
        )
        sum_accept = s.sum_accept + accept_leaf

        # progressive multinomial sampling within the subtree
        logw_new = jnp.logaddexp(s.logw, logw_leaf)
        key, sub = jax.random.split(s.key)
        take = jnp.log(jax.random.uniform(sub, dtype=dt)) < (logw_leaf - logw_new)
        prop_q = jnp.where(take, z.q, s.prop_q)
        prop_logp = jnp.where(take, z.logp, s.prop_logp)
        prop_grad = jnp.where(take, z.grad, s.prop_grad)

        cum_rho = s.cum_rho + z.r
        i = s.i

        # even leaf: store checkpoint at slot popcount(i)
        slot = lax.population_count(i)
        is_even = (i % 2) == 0
        q_ck = jnp.where(is_even, s.q_ck.at[slot].set(z.q), s.q_ck)
        r_ck = jnp.where(is_even, s.r_ck.at[slot].set(z.r), s.r_ck)
        cum_ck = jnp.where(is_even, s.cum_ck.at[slot].set(cum_rho), s.cum_ck)

        # odd leaf: U-turn checks vs checkpoints k..l
        l = lax.population_count(i) - 1
        k = l - _trailing_ones(i) + 1

        def check_slot(j, turning):
            rho_blk = cum_rho - cum_ck[j] + r_ck[j]
            v_s = _velocity(r_ck[j], inv_mass)
            v_n = _velocity(z.r, inv_mass)
            active = (j >= k) & (j <= l)
            return turning | (active & _is_turning(rho_blk, v_s, v_n))

        turning_odd = lax.fori_loop(
            0, max_depth + 1, check_slot, jnp.asarray(False)
        )
        turning = s.turning | (~is_even & turning_odd)

        return _SubtreeState(
            i=i + 1,
            z=z,
            cum_rho=cum_rho,
            prop_q=prop_q,
            prop_logp=prop_logp,
            prop_grad=prop_grad,
            logw=logw_new,
            sum_accept=sum_accept,
            turning=turning,
            diverging=s.diverging | diverging,
            q_ck=q_ck,
            r_ck=r_ck,
            cum_ck=cum_ck,
            key=key,
        )

    out = lax.while_loop(cond, body, init)
    return out


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray
    diverging: jnp.ndarray
    num_leaves: jnp.ndarray
    tree_depth: jnp.ndarray
    energy: jnp.ndarray
    step_size: jnp.ndarray


class _TrajState(NamedTuple):
    j: jnp.ndarray  # doubling round
    z_left: IntegratorState
    z_right: IntegratorState
    rho: jnp.ndarray
    prop_q: jnp.ndarray
    prop_logp: jnp.ndarray
    prop_grad: jnp.ndarray
    logw: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    key: jnp.ndarray


def nuts_kernel(logdensity_fn, max_depth: int = 10):
    """Build a NUTS transition kernel.

    Returns `step(key, q, logp, grad, eps, inv_mass) -> (q', logp', grad',
    NUTSInfo)`; all inputs flat vectors.  jit/vmap-safe.
    """
    ld_and_grad = jax.value_and_grad(logdensity_fn)

    def step(key, q, logp, grad, eps, inv_mass):
        dt = q.dtype
        key_mom, key_traj = jax.random.split(key)
        r0 = jax.random.normal(key_mom, q.shape, dt) / jnp.sqrt(inv_mass)
        z0 = IntegratorState(q, r0, logp, grad)
        H0 = _energy(z0, inv_mass)

        init = _TrajState(
            j=jnp.asarray(0, jnp.int32),
            z_left=z0,
            z_right=z0,
            rho=r0,
            prop_q=q,
            prop_logp=logp,
            prop_grad=grad,
            logw=jnp.asarray(0.0, dt),  # root leaf weight e^{-(H0-H0)} = 1
            sum_accept=jnp.asarray(0.0, dt),
            n_leaves=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            key=key_traj,
        )

        def cond(s: _TrajState):
            return (s.j < max_depth) & ~s.turning & ~s.diverging

        def body(s: _TrajState):
            key, key_dir, key_sub, key_acc = jax.random.split(s.key, 4)
            go_right = jax.random.bernoulli(key_dir)
            direction = jnp.where(go_right, 1.0, -1.0).astype(dt)
            z_start = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, a, b), s.z_right, s.z_left
            )

            sub = _build_subtree(
                ld_and_grad, key_sub, z_start, s.j, eps, direction,
                inv_mass, H0, max_depth,
            )

            bad = sub.turning | sub.diverging
            # biased progressive sampling across the doubling
            accept_new = (
                jnp.log(jax.random.uniform(key_acc, dtype=dt))
                < (sub.logw - s.logw)
            ) & ~bad
            prop_q = jnp.where(accept_new, sub.prop_q, s.prop_q)
            prop_logp = jnp.where(accept_new, sub.prop_logp, s.prop_logp)
            prop_grad = jnp.where(accept_new, sub.prop_grad, s.prop_grad)

            z_left = jax.tree_util.tree_map(
                lambda new, old: jnp.where(go_right | bad, old, new), sub.z, s.z_left
            )
            z_right = jax.tree_util.tree_map(
                lambda new, old: jnp.where(go_right & ~bad, new, old), sub.z, s.z_right
            )

            rho = s.rho + jnp.where(bad, 0.0, sub.cum_rho)
            turning_full = _is_turning(
                rho,
                _velocity(z_left.r, inv_mass),
                _velocity(z_right.r, inv_mass),
            )

            return _TrajState(
                j=s.j + 1,
                z_left=z_left,
                z_right=z_right,
                rho=rho,
                prop_q=prop_q,
                prop_logp=prop_logp,
                prop_grad=prop_grad,
                logw=jnp.logaddexp(s.logw, jnp.where(bad, -jnp.inf, sub.logw)),
                sum_accept=s.sum_accept + sub.sum_accept,
                n_leaves=s.n_leaves + sub.i,
                turning=s.turning | bad | (~bad & turning_full),
                diverging=s.diverging | sub.diverging,
                key=key,
            )

        out = lax.while_loop(cond, body, init)
        accept_prob = out.sum_accept / jnp.maximum(out.n_leaves, 1)
        info = NUTSInfo(
            accept_prob=accept_prob,
            diverging=out.diverging,
            num_leaves=out.n_leaves,
            tree_depth=out.j,
            energy=-out.prop_logp,
            step_size=eps,
        )
        return out.prop_q, out.prop_logp, out.prop_grad, info

    return step


def hmc_kernel(logdensity_fn, num_steps: int = 32):
    """Plain HMC with fixed leapfrog path length and MH acceptance."""
    ld_and_grad = jax.value_and_grad(logdensity_fn)

    def step(key, q, logp, grad, eps, inv_mass):
        dt = q.dtype
        key_mom, key_acc = jax.random.split(key)
        r0 = jax.random.normal(key_mom, q.shape, dt) / jnp.sqrt(inv_mass)
        z0 = IntegratorState(q, r0, logp, grad)
        H0 = _energy(z0, inv_mass)

        def body(_, z):
            return _leapfrog(ld_and_grad, z, eps, inv_mass)

        z = lax.fori_loop(0, num_steps, body, z0)
        H = _energy(z, inv_mass)
        accept_prob = jnp.where(
            jnp.isnan(H), 0.0, jnp.clip(jnp.exp(H0 - H), max=1.0)
        )
        accept = jax.random.uniform(key_acc, dtype=dt) < accept_prob
        qn = jnp.where(accept, z.q, q)
        logpn = jnp.where(accept, z.logp, logp)
        gradn = jnp.where(accept, z.grad, grad)
        info = NUTSInfo(
            accept_prob=accept_prob,
            diverging=(H - H0) > _DIVERGENCE_THRESHOLD,
            num_leaves=jnp.asarray(num_steps, jnp.int32),
            tree_depth=jnp.asarray(0, jnp.int32),
            energy=-logpn,
            step_size=eps,
        )
        return qn, logpn, gradn, info

    return step


# ---------------------------------------------------------------------------
# Adaptation (Stan-style window adaptation)
# ---------------------------------------------------------------------------


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    grad_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def _da_init(eps0):
    eps0 = jnp.asarray(eps0)
    return DualAveragingState(
        log_eps=jnp.log(eps0),
        log_eps_avg=jnp.log(eps0),
        grad_avg=jnp.zeros_like(eps0),
        t=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
    )


def _da_update(s: DualAveragingState, accept_prob, target=0.8):
    gamma, t0, kappa = 0.05, 10.0, 0.75
    t = s.t + 1.0
    g = target - accept_prob
    grad_avg = (1.0 - 1.0 / (t + t0)) * s.grad_avg + g / (t + t0)
    log_eps = s.mu - jnp.sqrt(t) / gamma * grad_avg
    w = t ** (-kappa)
    log_eps_avg = w * log_eps + (1.0 - w) * s.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, grad_avg, t, s.mu)


class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def _welford_init(d, dtype):
    return WelfordState(
        jnp.zeros((), dtype), jnp.zeros((d,), dtype), jnp.zeros((d,), dtype)
    )


def _welford_update(s: WelfordState, x):
    count = s.count + 1.0
    delta = x - s.mean
    mean = s.mean + delta / count
    m2 = s.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def _welford_variance(s: WelfordState):
    # Stan's regularised estimate
    var = s.m2 / jnp.maximum(s.count - 1.0, 1.0)
    shrink = s.count / (s.count + 5.0)
    return shrink * var + 1e-3 * (1.0 - shrink)


def window_adaptation_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Stan's three-phase warmup schedule.  Returns two int arrays of length
    num_warmup: `in_window[i]` (collect covariance) and `window_end[i]`
    (reset mass matrix at step i)."""
    import numpy as np

    in_window = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    if num_warmup < 20:
        return jnp.asarray(in_window), jnp.asarray(window_end)
    if init_buffer + term_buffer + base_window > num_warmup:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.1 * num_warmup)
        base_window = num_warmup - init_buffer - term_buffer
    start = init_buffer
    size = base_window
    while start < num_warmup - term_buffer:
        end = min(start + size, num_warmup - term_buffer)
        # last window absorbs the remainder
        if end + 2 * size > num_warmup - term_buffer:
            end = num_warmup - term_buffer
        in_window[start:end] = True
        window_end[end - 1] = True
        start = end
        size *= 2
    return jnp.asarray(in_window), jnp.asarray(window_end)


def _find_reasonable_eps(ld_and_grad, key, q, logp, grad, inv_mass):
    """Double/halve eps until the one-step accept prob crosses 0.5
    (AdvancedHMC `find_good_eps` parity)."""
    dt = q.dtype
    r0 = jax.random.normal(key, q.shape, dt) / jnp.sqrt(inv_mass)
    z0 = IntegratorState(q, r0, logp, grad)
    H0 = _energy(z0, inv_mass)

    def accept_prob(eps):
        z = _leapfrog(ld_and_grad, z0, eps, inv_mass)
        H = _energy(z, inv_mass)
        return jnp.exp(jnp.clip(H0 - H, max=0.0))

    eps0 = jnp.asarray(1.0, dt)
    p0 = accept_prob(eps0)
    going_up = p0 > 0.5

    def cond(carry):
        eps, p, it = carry
        crossed = jnp.where(going_up, p <= 0.5, p >= 0.5)
        return (~crossed) & (it < 50) & (eps > 1e-10) & (eps < 1e7)

    def body(carry):
        eps, _, it = carry
        eps = jnp.where(going_up, eps * 2.0, eps * 0.5)
        return eps, accept_prob(eps), it + 1

    eps, _, _ = lax.while_loop(cond, body, (eps0, p0, jnp.asarray(0)))
    # step back once on the up-branch so we end on the acceptable side
    return jnp.where(going_up, eps * 0.5, eps)


#: N at/above which `precision='auto'` pins HIGHEST GEMMs for f32
#: likelihoods.  Measured (BASELINE.md round 4): at the library-default HIGH
#: (bf16_3x) precision, exact-GP NUTS at N=4096 f32 silently degrades
#: run-to-run (R̂ 1.4–2.2 observed, 0% divergences — nothing warns) because
#: the signal-variance gradient is cancellation-noise; HIGHEST restored
#: mixing AND delivered 2.3× more ESS/s despite 2×-slower GEMMs.  N ≤ 2048
#: mixes fine at HIGH.
AUTO_HIGHEST_MIN_N = 4096

#: Post-run mixing check threshold (split-R̂).
RHAT_WARN_THRESHOLD = 1.05


def _precision_policy(precision, flat_logdensity, d, dt):
    """Resolve a `precision` argument into (context manager, resolved
    precision | None).

    - None: no scoping (caller manages precision).
    - 'auto': trace the log-density with `jax.eval_shape` inside a
      Cholesky-size recorder (ops.chol.record_chol_sizes); if it factorises
      an f32 covariance of N ≥ AUTO_HIGHEST_MIN_N and the active GEMM
      precision is below HIGHEST, scope HIGHEST over the whole run (warns
      once, actionably).  Closes the silent-wrong-answer footgun of
      VERDICT r4 weak-item 1 at the source.
    - anything else: normalised and scoped as given.
    """
    import warnings
    from contextlib import nullcontext

    from stheno_tpu import config as _cfg
    from stheno_tpu.ops import blocked_cholesky as _bc
    from stheno_tpu.ops import chol as _chol

    if precision is None:
        return nullcontext(), None
    if precision != "auto":
        p = _cfg._norm_precision(precision)
        return _cfg.gemm_precision(p), p
    try:
        with _chol.record_chol_sizes() as sizes:
            jax.eval_shape(flat_logdensity, jax.ShapeDtypeStruct((d,), dt))
    except Exception:
        # a log-density that cannot be shape-traced standalone (e.g. closed
        # over concrete device state being donated) — no policy, no scoping
        return nullcontext(), None
    big_f32 = [n for (n, cdt) in sizes
               if n >= AUTO_HIGHEST_MIN_N and cdt == jnp.dtype(jnp.float32)]
    if big_f32 and _bc._active_prec() != lax.Precision.HIGHEST:
        warnings.warn(
            f"precision='auto': the log-density factorises an "
            f"N={max(big_f32)} float32 covariance, so all GEMMs in this run "
            f"are pinned to HIGHEST precision (at the HIGH/bf16_3x default "
            f"the cancellation-dominated variance gradient silently degrades "
            f"mixing at N>={AUTO_HIGHEST_MIN_N}; HIGHEST measured 2.3x more "
            f"ESS/s — BASELINE.md round 4).  Pass precision=None to opt "
            f"out, or an explicit precision to choose.",
            stacklevel=3,
        )
        return (_cfg.gemm_precision(lax.Precision.HIGHEST),
                lax.Precision.HIGHEST)
    return nullcontext(), None


def _check_mixing(qs, dt, resolved_prec, num_chains, num_samples):
    """Loud, actionable post-run split-R̂ warning (VERDICT r4 weak-item 1:
    `run_nuts` computed diagnostics but nothing connected them to the
    user).  Host-side only — skipped under tracing."""
    import warnings

    if isinstance(qs, jax.core.Tracer) or num_chains < 2 or num_samples < 8:
        return
    from stheno_tpu.inference.diagnostics import potential_scale_reduction
    import numpy as np

    rhat = float(jnp.max(potential_scale_reduction(qs)))
    if not np.isfinite(rhat) or rhat <= RHAT_WARN_THRESHOLD:
        return
    from stheno_tpu.ops import blocked_cholesky as _bc

    prec = resolved_prec if resolved_prec is not None else _bc._active_prec()
    hint = ""
    if (jnp.dtype(dt) == jnp.dtype(jnp.float32)
            and prec != lax.Precision.HIGHEST):
        hint = (
            "  This run's GEMMs ran below HIGHEST precision; exact-GP "
            "posteriors at N>~4096 f32 are known to silently degrade "
            "there (cancellation-noise gradients; BASELINE.md round 4) — "
            "re-run under `with stheno_tpu.config.gemm_precision('highest')` "
            "or leave precision='auto'."
        )
    warnings.warn(
        f"NUTS chains have not mixed: max split-R-hat = {rhat:.3f} > "
        f"{RHAT_WARN_THRESHOLD}.  Treat these draws as unconverged "
        f"(more warmup / reparametrise / check gradients).{hint}",
        stacklevel=3,
    )


class ChainState(NamedTuple):
    """Resumable per-chain sampler state (checkpointable pytree;
    SURVEY.md §5 checkpoint/resume)."""

    q: jnp.ndarray  # (C, d)
    logp: jnp.ndarray  # (C,)
    grad: jnp.ndarray  # (C, d)
    eps: jnp.ndarray  # (C,) post-warmup step sizes
    inv_mass: jnp.ndarray  # (C, d)


class WarmupState(NamedTuple):
    """Resumable MID-warmup state: positions + the full adaptation state
    (dual-averaging + Welford + current mass matrix).  Checkpointable
    pytree — SURVEY.md §5's "(rng key, chain states, adaptation state)"."""

    q: jnp.ndarray  # (C, d)
    logp: jnp.ndarray  # (C,)
    grad: jnp.ndarray  # (C, d)
    da: DualAveragingState  # per-chain scalar leaves (C,)
    wf: WelfordState  # per-chain leaves
    inv_mass: jnp.ndarray  # (C, d)


def _make_warm_body(step_fn, target_accept, d, dt):
    """One Stan-window warmup iteration (shared by the fused warmup in
    `run_nuts` and the segmented `nuts_warmup` — bit-identical by
    construction)."""

    def warm_body(carry, xs):
        (q, logp, grad, da, wf, inv_mass), (k, in_w, w_end) = carry, xs
        eps = jnp.exp(da.log_eps)
        q, logp, grad, info = step_fn(k, q, logp, grad, eps, inv_mass)
        da = _da_update(da, info.accept_prob, target_accept)
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(in_w, a, b), _welford_update(wf, q), wf
        )
        # at window end: reset mass matrix + step size search state
        new_inv = _welford_variance(wf)
        inv_mass = jnp.where(w_end, new_inv, inv_mass)
        da_reset = _da_init(jnp.exp(da.log_eps_avg))
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(w_end, a, b), da_reset, da
        )
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(w_end, a, b), _welford_init(d, dt), wf
        )
        return (q, logp, grad, da, wf, inv_mass), None

    return warm_body


def _is_traced(x):
    # Only genuine tracers select the (start, LENGTH) segment semantics; a
    # concrete jax.Array scalar behaves like a plain int — (start, stop) —
    # so the meaning of `segment` never flips on int-vs-array type
    # (ADVICE.md round 3).
    return isinstance(x, jax.core.Tracer)


def nuts_warmup(
    key,
    logdensity_fn,
    init_position,
    num_warmup,
    num_chains=1,
    max_depth=10,
    target_accept=0.8,
    kernel="nuts",
    num_hmc_steps=32,
    init_jitter=1.0,
    segment=None,
    state: "WarmupState | None" = None,
    precision="auto",
):
    """Stan-window warmup, optionally in resumable segments.

    ``precision``: GEMM-precision policy for the whole warmup — 'auto'
    (default; pins HIGHEST when the log-density factorises a large f32
    covariance, see `_precision_policy`), None (no scoping), or an explicit
    precision.  Pass the SAME value to the matching `run_nuts` call so
    adaptation and sampling trace identically.

    ``segment=(a, b)`` runs warmup iterations [a, b) of the fixed
    `num_warmup`-iteration schedule, resuming from `state` (required when
    a > 0), and returns the updated `WarmupState`.  Inside `jit`, `a` may
    be a traced scalar — the second element is then the static segment
    LENGTH, ``segment=(start, n)`` — so equal-length segments share one
    compiled program.  A traced-start segment that overshoots the schedule
    (start + n > num_warmup) runs the out-of-range iterations as no-ops,
    so a warmup length that does not divide the segment length is safe
    (the final short segment may simply be issued at full length).
    Given the SAME
    top-level `key` (the one you will also pass to `run_nuts`), any
    segmentation — including none — produces bit-identical adaptation to
    `run_nuts`'s internal warmup: per-iteration keys are the [a, b) slice
    of the same split, and the window schedule is sliced statically.

    Why: (a) pod-scale warmups are long-running and should checkpoint
    mid-warmup (`inference.checkpoint` persists the state — SURVEY.md §5);
    (b) relayed devices bound single-execution time, so each segment stays
    a short XLA program.

    Finish with ``warmup_result(state)`` → `ChainState` for
    ``run_nuts(key, ..., resume_state=...)`` (which then reproduces the
    uninterrupted run's draws bit-for-bit).
    """
    if num_warmup < 1:
        # the traced-segment path clamps indices with min(idx, num_warmup-1),
        # which would read slot -1 of an empty schedule (ADVICE r4); a
        # zero-warmup run is `run_nuts(..., resume_state=...)`'s job
        raise ValueError(f"nuts_warmup requires num_warmup >= 1, got {num_warmup}")
    flat0, unravel = jax.flatten_util.ravel_pytree(init_position)
    d = flat0.shape[0]
    dt = flat0.dtype

    def flat_logdensity(qf):
        return logdensity_fn(unravel(qf))

    ld_and_grad = jax.value_and_grad(flat_logdensity)
    step_fn = (
        nuts_kernel(flat_logdensity, max_depth=max_depth)
        if kernel == "nuts"
        else hmc_kernel(flat_logdensity, num_steps=num_hmc_steps)
    )
    a, b = segment if segment is not None else (0, num_warmup)
    seg_len = int(b) - int(a) if not _is_traced(a) else None
    if seg_len is not None:
        if not (0 <= int(a) < int(b) <= num_warmup):
            raise ValueError(f"segment {segment} outside [0, {num_warmup})")
        if int(a) > 0 and state is None:
            raise ValueError(
                "resuming a warmup segment (a > 0) requires `state`"
            )
    else:
        # traced start: the second element is the static segment LENGTH
        # (segment=(start, n)) — a stop value cannot be introspected under
        # tracing.  Requires `state` (the start-0 initialisation branch is
        # a Python-level decision).
        seg_len = int(b)
        if state is None:
            raise ValueError("a traced segment start requires `state`")
    num_steps = int(b - a) if not _is_traced(a) else seg_len

    in_window, window_end = window_adaptation_schedule(num_warmup)
    warm_body = _make_warm_body(step_fn, target_accept, d, dt)

    key_init, key_run = jax.random.split(key)
    chain_keys = jax.random.split(key_run, num_chains)

    def chain_init(chain_key, q0):
        _, k_eps, _, _ = jax.random.split(chain_key, 4)
        logp0, grad0 = ld_and_grad(q0)
        inv_mass0 = jnp.ones((d,), dt)
        eps0 = _find_reasonable_eps(
            ld_and_grad, k_eps, q0, logp0, grad0, inv_mass0
        )
        return WarmupState(
            q0, logp0, grad0, _da_init(eps0), _welford_init(d, dt), inv_mass0
        )

    def masked_body(carry, xs):
        # Iterations with index ≥ num_warmup are no-ops: a traced-start
        # segment whose window overshoots the schedule (start + length >
        # num_warmup) must NOT run extra, misaligned warmup iterations
        # (ADVICE.md round 3 — dynamic_slice clamping silently shifted the
        # window schedule while the fold_in keys kept advancing).  For
        # in-range iterations `where(valid=True, new, old) = new` exactly,
        # so bit-exact segmented≡fused equivalence is preserved.
        k, in_w, w_end, valid = xs
        new_carry, _ = warm_body(carry, (k, in_w, w_end))
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(valid, n, o), new_carry, carry
        )
        return carry, None

    def chain_segment(chain_key, st):
        _, _, k_warm, _ = jax.random.split(chain_key, 4)
        idx = jnp.asarray(a, jnp.int32) + jnp.arange(num_steps, dtype=jnp.int32)
        valid = idx < num_warmup
        idx_c = jnp.minimum(idx, num_warmup - 1)
        warm_keys = jax.vmap(lambda i: jax.random.fold_in(k_warm, i))(idx_c)
        in_w = jnp.take(in_window, idx_c)
        w_end = jnp.take(window_end, idx_c)
        carry = (st.q, st.logp, st.grad, st.da, st.wf, st.inv_mass)
        carry, _ = lax.scan(
            masked_body, carry, (warm_keys, in_w, w_end, valid)
        )
        return WarmupState(*carry)

    prec_ctx, _ = _precision_policy(precision, flat_logdensity, d, dt)
    with prec_ctx:
        if (not _is_traced(a)) and int(a) == 0:
            q_inits = flat0[None, :] + init_jitter * jax.random.normal(
                key_init, (num_chains, d), dt
            ).at[0].set(0.0)
            state = jax.vmap(chain_init)(chain_keys, q_inits)
        return jax.vmap(chain_segment)(chain_keys, state)


def warmup_result(state: WarmupState) -> ChainState:
    """Adapted `ChainState` (eps = averaged dual-averaging step size) for
    `run_nuts(..., resume_state=...)`."""
    return ChainState(
        q=state.q,
        logp=state.logp,
        grad=state.grad,
        eps=jnp.exp(state.da.log_eps_avg),
        inv_mass=state.inv_mass,
    )


def run_nuts(
    key,
    logdensity_fn,
    init_position,
    num_warmup=500,
    num_samples=500,
    num_chains=1,
    max_depth=10,
    target_accept=0.8,
    kernel="nuts",
    num_hmc_steps=32,
    init_jitter=1.0,
    return_state=False,
    resume_state: "ChainState | None" = None,
    sample_offset=0,
    precision="auto",
    check_rhat=True,
):
    """Run warmup + sampling for `num_chains` chains, vmapped.

    ``precision``: GEMM-precision policy for the whole run — 'auto'
    (default) traces the log-density once with `jax.eval_shape` and pins
    HIGHEST when it factorises an f32 covariance of N ≥
    `AUTO_HIGHEST_MIN_N` (the measured mixing cliff, BASELINE.md round 4);
    None disables scoping; an explicit precision is applied as given.

    ``check_rhat``: after sampling (outside jit only), compute split-R̂
    over the flat position dimensions and warn loudly if max R̂ exceeds
    `RHAT_WARN_THRESHOLD` — with a precision hint when the run's GEMMs were
    below HIGHEST on an f32 posterior.

    `init_position` may be a flat vector or any pytree; chains are
    initialised by jittering it with N(0, init_jitter²) in unconstrained
    space (chain 0 starts exactly at `init_position`).

    Returns `(samples, info)` where `samples` has shape
    (num_chains, num_samples, d) (or pytree-of-(C,S,...)) and `info` is a
    NUTSInfo of (num_chains, num_samples) arrays.

    Checkpoint/resume: pass `return_state=True` to additionally receive a
    `ChainState`; a later call with `resume_state=state` skips warmup and
    continues sampling from it (combine with inference.checkpoint to persist
    across process restarts).  Per-draw keys are `fold_in(k_samp, offset+i)`,
    so a resumed run given the SAME top-level `key` and
    `sample_offset=<draws already taken>` reproduces the uninterrupted run's
    draws bit-for-bit (tested in tests/test_inference.py).
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(init_position)
    d = flat0.shape[0]
    dt = flat0.dtype

    def flat_logdensity(qf):
        return logdensity_fn(unravel(qf))

    ld_and_grad = jax.value_and_grad(flat_logdensity)
    step_fn = (
        nuts_kernel(flat_logdensity, max_depth=max_depth)
        if kernel == "nuts"
        else hmc_kernel(flat_logdensity, num_steps=num_hmc_steps)
    )

    in_window, window_end = window_adaptation_schedule(num_warmup)

    def _samp_keys(k_samp):
        # deterministic per-draw-index keys: checkpoint/resume with the same
        # top-level key + sample_offset continues the exact key sequence
        idx = sample_offset + jnp.arange(num_samples)
        return jax.vmap(lambda i: jax.random.fold_in(k_samp, i))(idx)

    warm_body = _make_warm_body(step_fn, target_accept, d, dt)

    def single_chain(chain_key, q0):
        k_init, k_eps, k_warm, k_samp = jax.random.split(chain_key, 4)
        logp0, grad0 = ld_and_grad(q0)
        inv_mass0 = jnp.ones((d,), dt)
        eps0 = _find_reasonable_eps(ld_and_grad, k_eps, q0, logp0, grad0, inv_mass0)

        warm_keys = jax.vmap(
            lambda i: jax.random.fold_in(k_warm, i)
        )(jnp.arange(num_warmup))
        init_carry = (
            q0, logp0, grad0, _da_init(eps0), _welford_init(d, dt), inv_mass0
        )
        (q, logp, grad, da, _, inv_mass), _ = lax.scan(
            warm_body, init_carry, (warm_keys, in_window, window_end)
        )
        eps_final = jnp.exp(da.log_eps_avg)

        # ---- sampling scan ----
        def samp_body(carry, k):
            q, logp, grad = carry
            q, logp, grad, info = step_fn(k, q, logp, grad, eps_final, inv_mass)
            return (q, logp, grad), (q, info)

        samp_keys = _samp_keys(k_samp)
        (q, logp, grad), (qs, infos) = lax.scan(
            samp_body, (q, logp, grad), samp_keys
        )
        return qs, infos, (q, logp, grad, eps_final, inv_mass)

    def sample_only(chain_key, q0, logp0, grad0, eps_final, inv_mass):
        def samp_body(carry, k):
            q, logp, grad = carry
            q, logp, grad, info = step_fn(k, q, logp, grad, eps_final, inv_mass)
            return (q, logp, grad), (q, info)

        # derive k_samp exactly as single_chain does, so a resumed run with
        # the same top-level key continues the same per-draw key sequence
        _, _, _, k_samp = jax.random.split(chain_key, 4)
        samp_keys = _samp_keys(k_samp)
        (q, logp, grad), (qs, infos) = lax.scan(
            samp_body, (q0, logp0, grad0), samp_keys
        )
        return qs, infos, (q, logp, grad, eps_final, inv_mass)

    key_init, key_run = jax.random.split(key)
    chain_keys = jax.random.split(key_run, num_chains)

    prec_ctx, resolved_prec = _precision_policy(
        precision, flat_logdensity, d, dt
    )
    with prec_ctx:
        if resume_state is not None:
            qs, infos, fin = jax.vmap(sample_only)(
                chain_keys,
                resume_state.q,
                resume_state.logp,
                resume_state.grad,
                resume_state.eps,
                resume_state.inv_mass,
            )
        else:
            q_inits = flat0[None, :] + init_jitter * jax.random.normal(
                key_init, (num_chains, d), dt
            ).at[0].set(0.0)
            qs, infos, fin = jax.vmap(single_chain)(chain_keys, q_inits)

    if check_rhat:
        _check_mixing(qs, dt, resolved_prec, num_chains, num_samples)
    samples = jax.vmap(jax.vmap(unravel))(qs)
    if return_state:
        state = ChainState(
            q=fin[0], logp=fin[1], grad=fin[2], eps=fin[3], inv_mass=fin[4]
        )
        return samples, infos, state
    return samples, infos
