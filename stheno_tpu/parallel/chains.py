"""Chain / particle parallelism — DP over a `('chains',)` mesh axis
(SURVEY.md §2.3).

NUTS chains are embarrassingly parallel (per-chain adaptation), so the
sharded runner simply places the chain axis on the mesh and lets XLA
partition the vmapped program — no collectives in the hot loop; cross-chain
diagnostics (R̂ / ESS) are computed afterwards on the sharded sample array,
with XLA inserting the (tiny) collectives.

`run_smc_sharded` shards the particle axis; resampling indexes across the
axis, which XLA lowers to all-to-all collective permutes over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stheno_tpu.inference.hmc import run_nuts
from stheno_tpu.inference.smc import SMCResult, run_smc


def run_nuts_sharded(
    key,
    logdensity_fn,
    init_position,
    mesh,
    num_warmup=500,
    num_samples=500,
    num_chains=None,
    axis_name="chains",
    **kwargs,
):
    """`inference.run_nuts` with the chain axis sharded over `mesh`.

    `num_chains` defaults to one chain per device; it must be a multiple of
    the mesh axis size.  Returns (samples, info) with the leading chain axis
    sharded over the mesh (device-resident; pull to host only what you need).
    """
    n_dev = mesh.shape[axis_name]
    num_chains = num_chains if num_chains is not None else n_dev
    if num_chains % n_dev != 0:
        raise ValueError(f"num_chains={num_chains} not divisible by mesh axis {n_dev}")

    chain_sharding = NamedSharding(mesh, P(axis_name))

    def run(key):
        return run_nuts(
            key,
            logdensity_fn,
            init_position,
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_chains=num_chains,
            **kwargs,
        )

    # Let XLA partition the embarrassingly-parallel chain vmap: constrain the
    # chain axis of every output to the mesh (a single sharding acts as a
    # prefix applying to every output leaf).
    run_jit = jax.jit(run, out_shardings=chain_sharding)
    return run_jit(key)


def run_smc_sharded(
    key,
    loglike_fn,
    logprior_fn,
    init_particles,
    mesh,
    axis_name="chains",
    **kwargs,
):
    """`inference.run_smc` with the particle axis sharded over `mesh`.

    The particle axis is both *placed* sharded on entry and *constrained*
    sharded on exit (`out_shardings` on the particles leaf), so XLA keeps the
    mutation/resampling loop partitioned over `axis_name` rather than
    silently gathering; the scalar outputs (log-evidence, stage count) are
    replicated.
    """
    particle_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    init_particles = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, particle_sharding), init_particles
    )

    def run(key, particles):
        return run_smc(key, loglike_fn, logprior_fn, particles, **kwargs)

    out_shardings = SMCResult(
        particles=jax.tree_util.tree_map(
            lambda _: particle_sharding, init_particles
        ),
        log_evidence=replicated,
        num_stages=replicated,
        beta_history=replicated,
    )
    return jax.jit(run, out_shardings=out_shardings)(key, init_particles)
