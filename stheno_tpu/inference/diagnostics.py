"""Sampler diagnostics: split-R̂ and bulk ESS (first-class here because
ESS/s is a north-star metric — SURVEY.md §5 'Metrics').

Implementations follow the standard Vehtari et al. (2021) rank-normalised
formulations in their basic (non-rank) form; FFT autocorrelation via jnp.fft
so the whole diagnostic runs on-device.
"""

from __future__ import annotations

import jax.numpy as jnp


def split_chains(x):
    """(C, S, ...) -> (2C, S//2, ...)"""
    c, s = x.shape[0], x.shape[1]
    half = s // 2
    return jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)


def potential_scale_reduction(x):
    """Split-R̂ for (C, S) or (C, S, D) chains; returns scalar or (D,)."""
    x = split_chains(x)
    c, s = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=1)
    chain_var = jnp.var(x, axis=1, ddof=1)
    between = s * jnp.var(chain_mean, axis=0, ddof=1)
    within = jnp.mean(chain_var, axis=0)
    var_est = (s - 1) / s * within + between / s
    return jnp.sqrt(var_est / within)


def _autocov(x):
    """Per-chain autocovariance via FFT: x is (C, S); returns (C, S)."""
    c, s = x.shape
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    n_fft = 2 * s
    f = jnp.fft.rfft(xc, n=n_fft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=1)[:, :s]
    return acov / s


def effective_sample_size(x):
    """Bulk ESS for (C, S) or (C, S, D); returns scalar or (D,).

    Uses Geyer's initial monotone positive sequence over chain-averaged
    autocorrelations (the Stan estimator).
    """
    if x.ndim == 3:
        return jnp.stack(
            [effective_sample_size(x[..., i]) for i in range(x.shape[-1])]
        )
    x = split_chains(x)
    c, s = x.shape
    if s < 4:
        # too few draws for the Geyer pairing (t_max = 0 → empty argmin);
        # an ESS estimate would be meaningless — be explicit
        return jnp.asarray(jnp.nan, x.dtype)
    acov = _autocov(x)  # (C, S)
    chain_var = acov[:, 0] * s / (s - 1.0)
    within = jnp.mean(chain_var)
    mean_acov = jnp.mean(acov, axis=0)
    between = jnp.var(jnp.mean(x, axis=1), ddof=1)
    var_est = (s - 1.0) / s * within + between

    rho = 1.0 - (within - mean_acov) / var_est  # (S,)
    rho = rho.at[0].set(1.0)

    # Geyer pairs: P_t = rho_{2t} + rho_{2t+1}; truncate at first negative,
    # enforce monotone decrease.
    t_max = s // 2
    pairs = rho[0 : 2 * t_max : 2] + rho[1 : 2 * t_max : 2]  # (t_max,)
    pos = pairs > 0
    first_neg = jnp.argmin(pos)  # index of first False (0 if all True→handle)
    all_pos = jnp.all(pos)
    cutoff = jnp.where(all_pos, t_max, first_neg)
    mask = jnp.arange(t_max) < cutoff
    pairs_mono = jnp.minimum.accumulate(jnp.where(mask, pairs, jnp.inf))
    pairs = jnp.where(mask, jnp.maximum(pairs_mono, 0.0), 0.0)
    tau = -1.0 + 2.0 * jnp.sum(pairs)
    ess = c * s / jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(s))))
    return jnp.minimum(ess, jnp.asarray(float(c * s)))
