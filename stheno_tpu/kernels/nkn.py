"""Neural Kernel Network — a differentiable compositional kernel.

Parity target: the reference's neural-kernel-network example
(`examples/flux_integration/neural_kernel_network/time_series.jl`:
`Primitive(...)` + `Chain(LinearLayer, product, ...)` over 8 primitive
kernels, trained by exact marginal likelihood).  Algorithm: Sun et al. 2018,
"Differentiable Compositional Kernel Learning for Gaussian Processes".

The construction: evaluate P primitive kernels pointwise, then push the
P-vector of kernel values through a tiny network whose operations are
closed over PSD kernels —

- ``LinearLayer``: nonnegative-weighted linear combination (+ nonnegative
  bias = adding a constant kernel); weights are stored in log-scale
  (trained unconstrained, exponentiated on apply — the reference stores
  its LinearLayer parameters the same way);
- ``ProductLayer``: products of adjacent pairs (kernel closure under
  pointwise product).

So every unit of every layer is itself a valid PSD kernel, and the whole
network output is one.

TPU-first: primitive Gram blocks are stacked on a trailing axis
(N, M, P) and each layer is one batched matmul / reshape-product over that
axis — XLA fuses the elementwise epilogues, nothing materialises per-unit
N×N intermediates beyond the (N, M, width) activations.  Everything is a
frozen pytree dataclass: the log-weights AND the primitive kernels'
hyperparameters are leaves, so `jax.grad` of an nlml trains them jointly.

The O(N) `diag` path maps the same network over (N, P) primitive diagonals
(reference internals.md:12-24 marginal-cost rule).
"""

from __future__ import annotations

import jax.numpy as jnp

from stheno_tpu.kernels.base import Kernel
from stheno_tpu.tree import pytree_dataclass, static_field

__all__ = ["LinearLayer", "ProductLayer", "NeuralKernelNetwork"]


@pytree_dataclass
class LinearLayer:
    """feats (..., in) -> (..., out) via exp(log_w) @ feats + exp(log_b).

    Nonnegativity of the exponentiated weights keeps every output unit a
    conic combination of kernels (hence PSD).  `log_b=None` omits the bias
    (no constant-kernel offset).
    """

    log_w: jnp.ndarray  # (out, in)
    log_b: jnp.ndarray | None = None  # (out,)

    def __call__(self, feats):
        out = feats @ jnp.exp(self.log_w).T
        if self.log_b is not None:
            out = out + jnp.exp(self.log_b)
        return out

    @staticmethod
    def init(key, n_in, n_out, bias=True, dtype=jnp.float64):
        """Near-uniform positive mixing weights (log(1/n_in) + jitter)."""
        import jax

        kw, kb = jax.random.split(key)
        log_w = (
            jnp.full((n_out, n_in), -jnp.log(float(n_in)), dtype)
            + 0.1 * jax.random.normal(kw, (n_out, n_in), dtype)
        )
        log_b = (
            jnp.full((n_out,), -4.0, dtype)
            + 0.1 * jax.random.normal(kb, (n_out,), dtype)
        ) if bias else None
        return LinearLayer(log_w, log_b)


@pytree_dataclass
class ProductLayer:
    """feats (..., P) -> (..., P / stride): products of adjacent groups.

    The reference's `product` step (pairwise products halving the width)."""

    stride: int = static_field(default=2)

    def __call__(self, feats):
        p = feats.shape[-1]
        assert p % self.stride == 0, (
            f"ProductLayer stride {self.stride} does not divide width {p}"
        )
        shaped = feats.reshape(*feats.shape[:-1], p // self.stride, self.stride)
        return jnp.prod(shaped, axis=-1)


@pytree_dataclass
class NeuralKernelNetwork(Kernel):
    """k(x, y) = network(k_1(x, y), ..., k_P(x, y)).

    `primitives`: tuple of base kernels; `layers`: tuple of LinearLayer /
    ProductLayer (any callable pytree mapping (..., w_i) -> (..., w_{i+1}));
    the final width must be 1.
    """

    primitives: tuple  # of Kernel
    layers: tuple  # of layer pytrees

    def _apply(self, feats):
        for layer in self.layers:
            feats = layer(feats)
        assert feats.shape[-1] == 1, (
            f"NKN layers must end at width 1, got {feats.shape[-1]}"
        )
        return feats[..., 0]

    def matrix(self, x, y):
        feats = jnp.stack([k.matrix(x, y) for k in self.primitives], axis=-1)
        return self._apply(feats)

    def matrix_same(self, x):
        # primitives' own matrix_same pins stationary diagonals exactly
        feats = jnp.stack([k.matrix_same(x) for k in self.primitives], axis=-1)
        return self._apply(feats)

    def diag(self, x, y):
        feats = jnp.stack([k.diag(x, y) for k in self.primitives], axis=-1)
        return self._apply(feats)

    def diag_same(self, x):
        feats = jnp.stack([k.diag_same(x) for k in self.primitives], axis=-1)
        return self._apply(feats)
