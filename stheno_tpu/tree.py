"""Pytree-dataclass helper.

Every structural object in the framework (kernels, mean functions, process-graph
nodes, input collections, finite GPs, posteriors) is an immutable frozen
dataclass registered as a JAX pytree.  Numeric hyperparameters are pytree
*leaves* (so `jax.grad` / `jit` / `vmap` see them), while structural metadata
(process ids, static index tuples, Python callables) is *auxiliary data*.

Fields are declared static via ``field(metadata=dict(static=True))`` or the
``static_field()`` shorthand.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field

import jax


def static_field(**kwargs):
    """A dataclass field treated as pytree aux data (static under jit)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return field(metadata=metadata, **kwargs)


def is_pytree_callable(f) -> bool:
    """True if `f` is a callable that flattens into pytree structure (a
    registered dataclass like a warp or `ParamFn`) rather than an opaque
    leaf — i.e. its numeric fields are visible to jit/grad."""
    if not callable(f):
        return False
    leaves = jax.tree_util.tree_leaves(f)
    return not (len(leaves) == 1 and leaves[0] is f)


def pytree_dataclass(cls=None, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields marked with ``static_field()`` become aux data; all other fields are
    pytree children.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)
