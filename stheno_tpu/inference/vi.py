"""Variational / marginal-likelihood optimisation loops.

The reference delegates hyperparameter learning to Optim (BFGS/NelderMead) +
ParameterHandling (examples/getting_started/script.jl:111-117, 203-212) and
pseudo-point ELBO optimisation to the same machinery
(examples/gppp_and_pseudo_points).  Here both are first-class:

- `fit(objective, spec, ...)` — optax-based minimisation of any scalar
  objective over a constrained parameter spec (stheno_tpu.params), with the
  whole `num_steps` loop compiled into ONE `lax.scan` under jit (no
  host↔device ping-pong per step — on TPU the optimiser loop runs entirely
  on-device).
- `fit_lbfgs` — optax L-BFGS for the deterministic nlml objectives the
  reference fits with Optim.LBFGS.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from stheno_tpu import params as P


class FitResult(NamedTuple):
    params: dict
    theta: jnp.ndarray
    losses: jnp.ndarray


def fit(
    objective,
    spec,
    num_steps=500,
    optimizer=None,
    learning_rate=5e-2,
    unroll=1,
    log_every=0,
):
    """Minimise `objective(constrained_params)` over the free leaves of
    `spec`.  Returns FitResult(final constrained params, flat theta, loss
    trace).  The whole loop is one jitted lax.scan; `log_every=N` streams the
    loss to stderr every N steps via an async host callback."""
    theta0, unflatten = P.init(spec)
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    loss_fn = lambda th: objective(unflatten(th))
    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def run(theta0):
        state0 = opt.init(theta0)

        def step(carry, i):
            theta, state = carry
            loss, g = vg(theta)
            updates, state = opt.update(g, state, theta)
            theta = optax.apply_updates(theta, updates)
            if log_every:
                from stheno_tpu.utils.logging import log_scalars

                log_scalars("fit", step=i, every=log_every, loss=loss)
            return (theta, state), loss

        (theta, _), losses = jax.lax.scan(
            step, (theta0, state0), jnp.arange(num_steps), unroll=unroll
        )
        return theta, losses

    theta, losses = run(theta0)
    return FitResult(unflatten(theta), theta, losses)


def fit_lbfgs(objective, spec, num_steps=100):
    """L-BFGS minimisation (the reference's Optim.LBFGS path,
    getting_started:203-212)."""
    theta0, unflatten = P.init(spec)
    loss_fn = lambda th: objective(unflatten(th))
    opt = optax.lbfgs()
    vg = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def run(theta0):
        state0 = opt.init(theta0)

        def step(carry, _):
            theta, state = carry
            loss, g = vg(theta, state=state)
            updates, state = opt.update(
                g, state, theta, value=loss, grad=g, value_fn=loss_fn
            )
            theta = optax.apply_updates(theta, updates)
            return (theta, state), loss

        (theta, _), losses = jax.lax.scan(
            step, (theta0, state0), None, length=num_steps
        )
        return theta, losses

    theta, losses = run(theta0)
    return FitResult(unflatten(theta), theta, losses)
