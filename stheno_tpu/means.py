"""Mean functions (zero / constant / custom), parity with AbstractGPs.jl's
ZeroMean / ConstMean / CustomMean behavioral surface (`GP(m, k)`; reference
layer 1, SURVEY.md §1)."""

from __future__ import annotations

import jax.numpy as jnp

from stheno_tpu.tree import is_pytree_callable, pytree_dataclass, static_field
from stheno_tpu.ops.pairwise import ensure_2d


class MeanFunction:
    def __call__(self, x):  # pragma: no cover - interface
        raise NotImplementedError


@pytree_dataclass
class ZeroMean(MeanFunction):
    def __call__(self, x):
        x = jnp.asarray(x)
        return jnp.zeros((x.shape[0],), dtype=ensure_2d(x).dtype)


@pytree_dataclass
class ConstMean(MeanFunction):
    c: jnp.ndarray

    def __call__(self, x):
        x = jnp.asarray(x)
        return jnp.broadcast_to(jnp.asarray(self.c), (x.shape[0],))


@pytree_dataclass
class FunctionMean(MeanFunction):
    """m(x) = fn(x) applied per input point; `fn` maps (N,[D]) -> (N,).

    `fn` is a pytree child: pass a `graph.ParamFn(fn, params)` (or any
    registered pytree callable) to make the mean's parameters traced and
    differentiable; opaque callables are coerced to static aux on entry
    (`as_mean`)."""

    fn: object = None

    def __call__(self, x):
        return jnp.asarray(self.fn(jnp.asarray(x)))


def as_mean(m) -> MeanFunction:
    """Coerce `GP(mean, kernel)`-style mean specs: None/0 → zero, scalar →
    const, callable → custom (the AbstractGPs `GP` constructor contract)."""
    if m is None:
        return ZeroMean()
    if isinstance(m, MeanFunction):
        return m
    if callable(m):
        if is_pytree_callable(m):
            return FunctionMean(m)
        from stheno_tpu.graph import StaticFn

        return FunctionMean(StaticFn(m))
    return ConstMean(jnp.asarray(m))
