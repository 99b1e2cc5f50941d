"""Constrained-parameter handling — the ParameterHandling.jl equivalent
(reference usage: `positive`, `fixed`, `value_flatten` in
examples/getting_started/script.jl:123-150 and
examples/extended_mauna_loa/script.jl:161-189).

A parameter spec is a pytree whose leaves are either plain arrays
(unconstrained) or `Param` wrappers carrying a bijector:

    spec = dict(
        var=positive(1.0),
        ell=positive(0.5, lb=1e-3),
        w=bounded(0.3, 0.0, 1.0),
        mean=jnp.asarray(0.0),          # unconstrained
        z=fixed(jnp.linspace(0, 1, 8)), # excluded from optimisation
    )
    theta0, unflatten = init(spec)      # flat unconstrained vector
    params = unflatten(theta0)          # dict of constrained values

All transforms are smooth and jit/grad-safe; `unflatten` is a pure function
suitable for use inside `jit`-traced objectives (the `build_model(θ)`
pattern, SURVEY.md §3.6).
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field


@pytree_dataclass
class Param:
    """A value with a constraint bijector.

    `raw` is the unconstrained representation; `transform`/`inverse` map
    raw ↔ constrained.
    """

    raw: jnp.ndarray
    transform: object = static_field()
    inverse: object = static_field()

    @property
    def value(self):
        return self.transform(self.raw)


@pytree_dataclass
class Fixed:
    """A value excluded from the flat optimisation vector
    (ParameterHandling `fixed`)."""

    value: jnp.ndarray


def positive(init, lb=0.0):
    """Strictly-positive parameter via exp, with optional lower bound:
    value = exp(raw) + lb   (ParameterHandling `positive(init, exp, lb)`,
    reference getting_started:134)."""
    init = jnp.asarray(init, dtype=float)
    lb = jnp.asarray(lb, dtype=init.dtype)
    raw = jnp.log(init - lb)
    return Param(
        raw,
        transform=lambda r: jnp.exp(r) + lb,
        inverse=lambda v: jnp.log(v - lb),
    )


def softplus_positive(init, lb=0.0):
    """Positive parameter via softplus — flatter tails than exp, often more
    stable for NUTS."""
    init = jnp.asarray(init, dtype=float)
    lb = jnp.asarray(lb, dtype=init.dtype)
    raw = _softplus_inv(init - lb)
    return Param(
        raw,
        transform=lambda r: jax.nn.softplus(r) + lb,
        inverse=lambda v: _softplus_inv(v - lb),
    )


def _softplus_inv(v):
    # log(exp(v) - 1), stable for large v
    return v + jnp.log(-jnp.expm1(-v))


def bounded(init, lo, hi):
    """Parameter in (lo, hi) via a scaled logistic."""
    init = jnp.asarray(init, dtype=float)
    lo = jnp.asarray(lo, dtype=init.dtype)
    hi = jnp.asarray(hi, dtype=init.dtype)
    u0 = (init - lo) / (hi - lo)
    raw = jnp.log(u0) - jnp.log1p(-u0)
    return Param(
        raw,
        transform=lambda r: lo + (hi - lo) * jax.nn.sigmoid(r),
        inverse=lambda v: (
            jnp.log((v - lo) / (hi - lo)) - jnp.log1p(-(v - lo) / (hi - lo))
        ),
    )


def fixed(value):
    return Fixed(jnp.asarray(value))


def _is_spec_leaf(x):
    return isinstance(x, (Param, Fixed))


def constrain(spec):
    """Map a spec pytree to its constrained values (Param→value,
    Fixed→value, arrays pass through)."""
    return jax.tree_util.tree_map(
        lambda p: p.value if _is_spec_leaf(p) else p, spec,
        is_leaf=_is_spec_leaf,
    )


def init(spec):
    """Flatten a spec into (theta0, unflatten):

    - `theta0`: flat unconstrained vector over all non-Fixed leaves;
    - `unflatten(theta)`: pure fn mapping a flat vector back to the
      *constrained-value* pytree (Fixed values baked in).

    Equivalent to ParameterHandling's `value_flatten`.
    """
    free = jax.tree_util.tree_map(
        lambda p: None if isinstance(p, Fixed) else (
            p.raw if isinstance(p, Param) else jnp.asarray(p, dtype=float)
        ),
        spec,
        is_leaf=_is_spec_leaf,
    )
    theta0, unravel = jax.flatten_util.ravel_pytree(free)

    def unflatten(theta):
        raw = unravel(theta)
        return _merge(spec, raw)

    def _merge(s, r):
        if isinstance(s, Fixed):
            return s.value
        if isinstance(s, Param):
            return s.transform(r)
        if isinstance(s, dict):
            return {k: _merge(s[k], r[k]) for k in s}
        if isinstance(s, (list, tuple)):
            return type(s)(_merge(a, b) for a, b in zip(s, r))
        return r  # plain unconstrained array

    return theta0, unflatten
