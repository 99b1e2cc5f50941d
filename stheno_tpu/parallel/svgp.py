"""Data-parallel SVGP training (VERDICT r2 item 6; SURVEY.md §2.3 DP row).

The uncollapsed SVGP bound (inference/svgp.py) is a sum of per-point
expected log-likelihoods minus one KL — exactly the shape data parallelism
wants: shard the minibatch over a ``('data',)`` mesh axis, compute each
shard's partial data term against the (replicated, M×M-small) inducing
factors, and `psum`.  Gradients flow through the collective, so one
`jax.grad` of the sharded bound IS the all-reduced data-parallel gradient —
no separate gradient aggregation step.

``svgp_elbo_dp`` is numerically identical to `svgp_elbo` on the same batch
(tested to ~1e-8 in f64), so the single-device training loop transfers
unchanged: swap the loss, place the batch row-sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from stheno_tpu.inputs import BlockData, GPPPInput
from stheno_tpu.finite_gp import DiagNoise
from stheno_tpu.inference.svgp import SVGP, _q_marginals, _svgp_factors


def data_mesh(p=None, axis_name="data"):
    """1-D mesh over all (or the first p) devices for batch sharding."""
    devs = jax.devices() if p is None else jax.devices()[:p]
    return jax.sharding.Mesh(devs, (axis_name,))


def shard_batch(mesh, arr, axis_name="data"):
    """Place a (N, ...) batch array row-sharded over `axis_name`."""
    spec = P(axis_name, *([None] * (jnp.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _split_inputs(x):
    """(raw array, rebuild) for the supported tagged-input forms."""
    if isinstance(x, GPPPInput):
        if isinstance(x.x, (GPPPInput, BlockData)):
            raise NotImplementedError(
                "svgp_elbo_dp: nested tagged inputs are not shardable as one "
                "batch axis — shard the underlying programme's inputs"
            )
        return jnp.asarray(x.x), lambda a, _p=x.p: GPPPInput(_p, a)
    if isinstance(x, BlockData):
        raise NotImplementedError(
            "svgp_elbo_dp: BlockData batches are ragged; shard per block"
        )
    return jnp.asarray(x), lambda a: a


def svgp_elbo_dp(mesh, svgp: SVGP, fx, y, scale=1.0, likelihood=None,
                 axis_name="data"):
    """`svgp_elbo` with the minibatch sharded over `axis_name`.

    `fx`/`y` are the global minibatch (inputs may be raw arrays or
    `GPPPInput`; N must divide over the axis).  The inducing-point factors
    (M×M) are computed once and replicated; each device evaluates its batch
    shard's expected log-likelihood; a `psum` assembles the data term.
    Value and gradients (hyperparameters, variational parameters, noise)
    match the single-device `svgp_elbo` exactly.
    """
    x_arr, rebuild = _split_inputs(fx.x)
    n = x_arr.shape[0]
    p = mesh.shape[axis_name]
    if n % p != 0:
        raise ValueError(f"batch size {n} must divide over {p} devices")

    Luu, q_sqrt = _svgp_factors(svgp)
    y = jnp.asarray(y)

    if likelihood is None:
        if not isinstance(fx.noise, DiagNoise):
            raise TypeError(
                "svgp_elbo_dp requires diagonal observation noise "
                "(or pass an explicit likelihood=)"
            )
        noise_diag = fx.noise.diag(n)  # (N,), sharded alongside the batch
    else:
        noise_diag = jnp.zeros((n,), y.dtype)  # unused placeholder

    # shard_map re-unflattens its inputs, which breaks the `is`-identity
    # between fx.f and svgp.fz.f that the same-programme check relies on —
    # when they are the same object (the common GPPP case), reuse the single
    # unflattened copy inside the body instead of passing fx.f separately.
    same_f = fx.f is svgp.fz.f

    def body(repl, x_loc, y_loc, s_loc):
        svgp_r, f_r, Luu_r, q_sqrt_r = repl
        if same_f:
            f_r = svgp_r.fz.f
        mu, var = _q_marginals(svgp_r, Luu_r, q_sqrt_r, f_r, rebuild(x_loc))
        if likelihood is not None:
            ell_loc = likelihood.variational_expectation(mu, var, y_loc)
        else:
            two_pi = jnp.asarray(2.0 * jnp.pi, dtype=mu.dtype)
            ell_loc = jnp.sum(
                -0.5 * (
                    jnp.log(two_pi * s_loc)
                    + (y_loc - mu) ** 2 / s_loc
                    + var / s_loc
                )
            )
        return lax.psum(ell_loc, axis_name)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    ell = fn((svgp, fx.f, Luu, q_sqrt), x_arr, y, noise_diag)

    m = svgp.q_mu.shape[0]
    dq = jnp.diagonal(jnp.tril(svgp.q_sqrt))
    kl = 0.5 * (
        jnp.vdot(svgp.q_mu, svgp.q_mu)
        + jnp.vdot(jnp.tril(svgp.q_sqrt), jnp.tril(svgp.q_sqrt))
        - m
        - 2.0 * jnp.sum(jnp.log(jnp.abs(dq)))
    )
    return scale * ell - kl


__all__ = ["svgp_elbo_dp", "data_mesh", "shard_batch"]
