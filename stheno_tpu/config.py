"""Global numeric policy.

The reference library is Float64-on-CPU throughout; on TPU fp64 has no MXU
support, so the policy here is dtype-polymorphic code paths:

- all statistics (mean / cov / var) inherit the dtype of the inputs and
  hyperparameters under JAX's usual promotion rules;
- Cholesky / logpdf accumulate in the widest available float (f64 when
  ``jax.config.jax_enable_x64`` is on -- the default in the test-suite -- and
  f32 otherwise);
- `default_jitter` scales with the working dtype so that posteriors remain PSD
  in f32 on TPU without drowning signal in f64 on CPU.

Parity anchor: Float32/Float64 eltype-stability tests in the reference
(test/gp/util.jl:76-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Default observation noise applied by ``f(x)`` when none is given.  The
#: reference's AbstractGPs uses 1e-18 (f64); we pick per-dtype values that act
#: as pure numerical jitter.
_DEFAULT_JITTER = {
    jnp.dtype(jnp.float64): 1e-12,
    jnp.dtype(jnp.float32): 1e-6,
    jnp.dtype(jnp.bfloat16): 1e-3,
}


def default_float():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_jitter(dtype) -> float:
    return _DEFAULT_JITTER.get(jnp.dtype(dtype), 1e-6)
