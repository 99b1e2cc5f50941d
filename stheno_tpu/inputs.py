"""Tagged / blocked input collections (reference layer 2,
src/input_collection_types.jl).

- `GPPPInput(p, x)`   — tags an input array with the process name it should be
  routed to (src/input_collection_types.jl:24-33).
- `BlockData(xs...)`  — strictly-ordered ragged concatenation of heterogeneous
  input collections (src/input_collection_types.jl:61-91).
- `split(x, y)`       — splits stacked outputs back into per-block pieces
  (src/gaussian_process_probabilistic_programme.jl:121-135).

TPU-first notes: block sizes are *static* (they come from array shapes at
trace time), so all routing/splitting is index arithmetic resolved during
tracing — nothing dynamic reaches XLA.  Process tags are static aux data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field


def input_dtype(*xs, default=jnp.float32):
    """Result dtype of the numeric leaves of input collections (process-name
    strings in collected `[(name, point), ...]` inputs are skipped)."""
    leaves = [
        l
        for x in xs
        for l in jax.tree_util.tree_leaves(x)
        if not isinstance(l, str)
    ]
    if not leaves:
        return default
    # promote against `default` so integer inputs still yield a float dtype
    return jnp.result_type(*leaves, default)


@pytree_dataclass
class GPPPInput:
    """Inputs `x` tagged with the process name `p` of a GPPP.

    `x` is usually an array, but may itself be a GPPPInput/BlockData when the
    tagged process is a wrapped GPPP (nested programmes — reference
    test/gaussian_process_probabilistic_programme.jl:107-120)."""

    p: str = static_field()
    x: object = None

    def __len__(self):
        if isinstance(self.x, (GPPPInput, BlockData)):
            return len(self.x)
        return int(jnp.shape(self.x)[0])


@pytree_dataclass
class BlockData:
    """A strictly-ordered collection of input blocks (ragged concatenation).

    Blocks may be `GPPPInput`s (the common case when indexing a GPPP) or raw
    arrays (when used with `cross`).
    """

    blocks: tuple

    def __init__(self, *blocks):
        # Accept BlockData(b1, b2, ...) and BlockData([b1, b2]).
        if len(blocks) == 1 and isinstance(blocks[0], (list, tuple)):
            blocks = tuple(blocks[0])
        object.__setattr__(self, "blocks", tuple(blocks))

    def __len__(self):
        return sum(_block_len(b) for b in self.blocks)

    @property
    def block_sizes(self):
        return tuple(_block_len(b) for b in self.blocks)


def _block_len(b) -> int:
    if isinstance(b, (GPPPInput, BlockData)):
        return len(b)
    if isinstance(b, (list, tuple)):
        # a "collected" block: [(name, point), ...]
        return len(b)
    return int(jnp.shape(b)[0])


def input_length(x) -> int:
    """Number of points in any supported input collection."""
    if isinstance(x, (GPPPInput, BlockData)):
        return len(x)
    if isinstance(x, (list, tuple)):
        # a "collected" [(name, point), ...] vector
        return len(x)
    return int(jnp.shape(x)[0])


def split(x, y):
    """Split stacked outputs `y` (a (N,) vector or (N, S) matrix of samples)
    into per-block pieces matching the blocks of `x`.

    Parity: `Base.split(x::BlockData, Y)` at
    src/gaussian_process_probabilistic_programme.jl:121-135.
    """
    if not isinstance(x, BlockData):
        raise TypeError("split expects a BlockData as its first argument")
    y = jnp.asarray(y)
    n = len(x)
    if y.shape[0] != n:
        raise ValueError(f"Expected len(x) == y.shape[0]; got {n} vs {y.shape[0]}")
    out = []
    off = 0
    for size in x.block_sizes:
        out.append(y[off : off + size])
        off += size
    return out


def vcat(*xs):
    """Concatenate GPPPInputs into a BlockData (reference
    `Base.vcat(::GPPPInput...)`, src/input_collection_types.jl:93-95)."""
    return BlockData(*xs)


def ColVecs(X):
    """KernelFunctions.jl `ColVecs` convention: a D×N matrix whose COLUMNS
    are the input points.  Returns the framework's native (N, D) layout."""
    X = jnp.asarray(X)
    if X.ndim != 2:
        raise ValueError("ColVecs expects a 2-D matrix (D, N)")
    return X.T


def RowVecs(X):
    """KernelFunctions.jl `RowVecs` convention: an N×D matrix whose ROWS are
    the input points — already the native layout."""
    X = jnp.asarray(X)
    if X.ndim != 2:
        raise ValueError("RowVecs expects a 2-D matrix (N, D)")
    return X
