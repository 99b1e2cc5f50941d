"""Kernel abstraction + algebra (layer 0 of SURVEY.md).

Replicates the *behavior* of the KernelFunctions.jl surface that Stheno.jl
reexports (src/Stheno.jl:6): `kernelmatrix(k, x[, y])`, `kernelmatrix_diag`,
kernel algebra (`+`, `*`, scaling, input transforms, `with_lengthscale`).

TPU-first design: a kernel is a frozen pytree dataclass whose numeric
hyperparameters are leaves (differentiable, jit-traceable).  Every kernel
implements two static-shape primitives:

- ``matrix(x, y) -> (N, M)``  — full pairwise block (MXU matmul + fused
  elementwise epilogue, see stheno_tpu.ops.pairwise);
- ``diag(x, y)  -> (N,)``     — the O(N) elementwise path, load-bearing for
  marginal variances (reference docs/src/internals.md:12-24).

Inputs are arrays shaped (N,) or (N, D) — the JAX-native replacement for the
reference's ColVecs/RowVecs convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field
from stheno_tpu.ops import pairwise


class Kernel:
    """Base class for positive-definite kernels.

    Subclasses implement ``matrix(x, y)`` and ``diag(x, y)``.  Algebra:
    ``k1 + k2``, ``k1 * k2``, ``2.0 * k`` (variance scaling ``σ² k``).
    """

    # -- primitives ---------------------------------------------------------
    def matrix(self, x, y):  # pragma: no cover - interface
        raise NotImplementedError

    def diag(self, x, y):  # pragma: no cover - interface
        raise NotImplementedError

    def matrix_same(self, x):
        """K(x, x) — overridable so stationary kernels can pin the diagonal
        exactly (the matmul sqdist identity leaves ~eps noise at d=0)."""
        return self.matrix(x, x)

    def diag_same(self, x):
        """diag K(x, x) — exact for stationary kernels (k(0))."""
        return self.diag(x, x)

    # -- sugar --------------------------------------------------------------
    def __call__(self, x, y=None):
        return kernelmatrix(self, x, y)

    def __add__(self, other):
        if isinstance(other, Kernel):
            return SumKernel(self, other)
        return NotImplemented

    def __mul__(self, other):
        if isinstance(other, Kernel):
            return ProductKernel(self, other)
        return ScaledKernel(jnp.asarray(other), self)

    def __rmul__(self, other):
        return ScaledKernel(jnp.asarray(other), self)


def kernelmatrix(k: Kernel, x, y=None):
    """Dense pairwise kernel matrix K[i, j] = k(x_i, y_j).

    Parity: KernelFunctions.jl `kernelmatrix` (used by the reference's atomic
    GP cov at src/gp/atomic_gp.jl:30-34).
    """
    if y is None:
        return k.matrix_same(x)
    return k.matrix(x, y)


def kernelmatrix_diag(k: Kernel, x, y=None):
    """Elementwise diagonal k(x_i, y_i) — O(N), never materialises K."""
    if y is None:
        return k.diag_same(x)
    return k.diag(x, y)


# ---------------------------------------------------------------------------
# Algebra
# ---------------------------------------------------------------------------


@pytree_dataclass
class SumKernel(Kernel):
    left: Kernel
    right: Kernel

    def matrix(self, x, y):
        return self.left.matrix(x, y) + self.right.matrix(x, y)

    def diag(self, x, y):
        return self.left.diag(x, y) + self.right.diag(x, y)

    def matrix_same(self, x):
        return self.left.matrix_same(x) + self.right.matrix_same(x)

    def diag_same(self, x):
        return self.left.diag_same(x) + self.right.diag_same(x)


@pytree_dataclass
class ProductKernel(Kernel):
    left: Kernel
    right: Kernel

    def matrix(self, x, y):
        return self.left.matrix(x, y) * self.right.matrix(x, y)

    def diag(self, x, y):
        return self.left.diag(x, y) * self.right.diag(x, y)

    def matrix_same(self, x):
        return self.left.matrix_same(x) * self.right.matrix_same(x)

    def diag_same(self, x):
        return self.left.diag_same(x) * self.right.diag_same(x)


@pytree_dataclass
class ScaledKernel(Kernel):
    """σ² · k  (KernelFunctions.jl `ScaledKernel`)."""

    variance: jnp.ndarray
    kernel: Kernel

    def matrix(self, x, y):
        return self.variance * self.kernel.matrix(x, y)

    def diag(self, x, y):
        return self.variance * self.kernel.diag(x, y)

    def matrix_same(self, x):
        return self.variance * self.kernel.matrix_same(x)

    def diag_same(self, x):
        return self.variance * self.kernel.diag_same(x)


@pytree_dataclass
class TransformedKernel(Kernel):
    """k(t(x), t(y)) for an input transform `t` (a Warp; see graph.py).

    KernelFunctions.jl equivalent: `k ∘ ScaleTransform(...)` etc.
    """

    kernel: Kernel
    transform: object  # a Warp (pytree) or plain callable

    def matrix(self, x, y):
        return self.kernel.matrix(self.transform(x), self.transform(y))

    def diag(self, x, y):
        return self.kernel.diag(self.transform(x), self.transform(y))

    def matrix_same(self, x):
        return self.kernel.matrix_same(self.transform(x))

    def diag_same(self, x):
        return self.kernel.diag_same(self.transform(x))


def with_lengthscale(k: Kernel, lengthscale):
    """k with inputs divided by `lengthscale` (scalar or per-dim vector).

    Parity: KernelFunctions.jl `with_lengthscale`, used pervasively in the
    reference examples (e.g. examples/extended_mauna_loa/script.jl:120-137).
    """
    ell = jnp.asarray(lengthscale)
    return TransformedKernel(k, _LengthscaleTransform(ell))


@pytree_dataclass
class _LengthscaleTransform:
    lengthscale: jnp.ndarray

    def __call__(self, x):
        x = jnp.asarray(x)
        if x.ndim <= 1 or self.lengthscale.ndim == 0:
            return x / self.lengthscale
        return x / self.lengthscale[None, :]
