"""The kernel zoo (parity with the KernelFunctions.jl kernels the reference
exercises; see SURVEY.md §2.2 "Kernel zoo": SE, Matern12/32/52, Exponential,
White, Constant, Linear, RationalQuadratic, Periodic, polynomial).

All stationary kernels route through the MXU-friendly pairwise ops in
stheno_tpu.ops.pairwise; XLA fuses each elementwise epilogue into the distance
matmul's consumer, so adding a kernel here is pure epilogue code: subclass
`StationaryKernel` and implement `_from_sqdist` (or `_from_dist`).

The matmul sqdist identity leaves O(eps) noise at zero distance, so the
same-input paths (`matrix_same` / `diag_same`) pin the diagonal to the exact
k(0) — this keeps `var ≡ diag(cov)` and PSD checks bit-clean (reference test
pattern test/test_util.jl:151-167).
"""

from __future__ import annotations

import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field
from stheno_tpu.kernels.base import Kernel
from stheno_tpu.ops import pairwise


class StationaryKernel(Kernel):
    """Kernel that is a function of the (squared) distance.

    Implement `_from_sqdist(sq)` (elementwise).  Kernels more naturally
    expressed in the plain distance implement `_from_dist(d)` and set
    `_use_dist = True` (sqrt is taken with a safe gradient at 0).
    """

    _use_dist = False

    def _from_sqdist(self, sq):
        eps = jnp.finfo(sq.dtype).eps ** 2
        d = jnp.sqrt(jnp.maximum(sq, eps)) * (sq > 0)
        return self._from_dist(d)

    def _from_dist(self, d):  # pragma: no cover - interface
        raise NotImplementedError

    def matrix(self, x, y):
        return self._from_sqdist(pairwise.pairwise_sqdist(x, y))

    def diag(self, x, y):
        return self._from_sqdist(pairwise.sqdist_diag(x, y))

    def matrix_same(self, x):
        sq = pairwise.pairwise_sqdist(x, x)
        n = sq.shape[0]
        # Pin the diagonal to exactly zero distance.
        sq = sq * (1.0 - jnp.eye(n, dtype=sq.dtype))
        return self._from_sqdist(sq)

    def diag_same(self, x):
        n = jnp.shape(x)[0]
        dt = pairwise.ensure_2d(x).dtype
        return self._from_sqdist(jnp.zeros((n,), dtype=dt))


# ---------------------------------------------------------------------------
# Stationary kernels
# ---------------------------------------------------------------------------


@pytree_dataclass
class SEKernel(StationaryKernel):
    """Squared-exponential: exp(-||x - y||² / 2)."""

    def _from_sqdist(self, sq):
        return jnp.exp(-0.5 * sq)


#: KernelFunctions.jl aliases.
SqExponentialKernel = SEKernel
RBFKernel = SEKernel
GaussianKernel = SEKernel


@pytree_dataclass
class Matern12Kernel(StationaryKernel):
    """exp(-||x - y||) — a.k.a. the exponential / Ornstein-Uhlenbeck kernel."""

    def _from_dist(self, d):
        return jnp.exp(-d)


ExponentialKernel = Matern12Kernel


@pytree_dataclass
class Matern32Kernel(StationaryKernel):
    """(1 + √3 d) exp(-√3 d)."""

    def _from_dist(self, d):
        d3 = jnp.sqrt(3.0).astype(d.dtype) * d
        return (1.0 + d3) * jnp.exp(-d3)


@pytree_dataclass
class Matern52Kernel(StationaryKernel):
    """(1 + √5 d + 5 d²/3) exp(-√5 d)."""

    def _from_dist(self, d):
        d5 = jnp.sqrt(5.0).astype(d.dtype) * d
        return (1.0 + d5 + d5 * d5 / 3.0) * jnp.exp(-d5)


@pytree_dataclass
class RationalQuadraticKernel(StationaryKernel):
    """(1 + d²/(2α))^(-α)."""

    alpha: jnp.ndarray

    def _from_sqdist(self, sq):
        return (1.0 + sq / (2.0 * self.alpha)) ** (-self.alpha)


@pytree_dataclass
class GammaExponentialKernel(StationaryKernel):
    """exp(-d^γ), γ ∈ (0, 2]."""

    gamma: jnp.ndarray

    def _from_dist(self, d):
        return jnp.exp(-(d**self.gamma))


@pytree_dataclass
class CosineKernel(StationaryKernel):
    """cos(π ||x - y||)."""

    def _from_dist(self, d):
        return jnp.cos(jnp.pi * d)


@pytree_dataclass
class PeriodicKernel(Kernel):
    """exp(-0.5 Σ_d (sin(π (x_d - y_d)) / r_d)²) — KernelFunctions.jl form.

    The reference models usually get periodicity via the `periodic` input warp
    (2-D cos/sin embedding, compose.jl:93-99); both routes are provided.
    """

    r: jnp.ndarray

    def _from_diff(self, dx):
        s = jnp.sin(jnp.pi * dx) / self.r
        return jnp.exp(-0.5 * jnp.sum(s * s, axis=-1))

    def matrix(self, x, y):
        x = pairwise.ensure_2d(x)
        y = pairwise.ensure_2d(y)
        return self._from_diff(x[:, None, :] - y[None, :, :])

    def diag(self, x, y):
        return self._from_diff(pairwise.ensure_2d(x) - pairwise.ensure_2d(y))

    def diag_same(self, x):
        x = pairwise.ensure_2d(x)
        return jnp.ones((x.shape[0],), dtype=x.dtype)


# ---------------------------------------------------------------------------
# Non-stationary kernels
# ---------------------------------------------------------------------------


@pytree_dataclass
class WhiteKernel(Kernel):
    """k(x, y) = δ(x == y).

    Cross-matrix entries compare input *values* elementwise (exactly the
    KernelFunctions.jl semantics); the same-input kernelmatrix of distinct
    points is the identity.
    """

    def matrix(self, x, y):
        x2 = pairwise.ensure_2d(x)
        y2 = pairwise.ensure_2d(y)
        eq = jnp.all(x2[:, None, :] == y2[None, :, :], axis=-1)
        return eq.astype(x2.dtype)

    def diag(self, x, y):
        x2 = pairwise.ensure_2d(x)
        y2 = pairwise.ensure_2d(y)
        return jnp.all(x2 == y2, axis=-1).astype(x2.dtype)

    def matrix_same(self, x):
        n = jnp.shape(x)[0]
        return jnp.eye(n, dtype=pairwise.ensure_2d(x).dtype)

    def diag_same(self, x):
        n = jnp.shape(x)[0]
        return jnp.ones((n,), dtype=pairwise.ensure_2d(x).dtype)


@pytree_dataclass
class ConstantKernel(Kernel):
    """k(x, y) = c."""

    c: jnp.ndarray

    def matrix(self, x, y):
        n = jnp.shape(x)[0]
        m = jnp.shape(y)[0]
        return jnp.broadcast_to(jnp.asarray(self.c), (n, m))

    def diag(self, x, y):
        return jnp.broadcast_to(jnp.asarray(self.c), (jnp.shape(x)[0],))


@pytree_dataclass
class ZeroKernel(Kernel):
    """k(x, y) = 0 (used by the reference's bench harness)."""

    def matrix(self, x, y):
        dt = jnp.result_type(jnp.asarray(x).dtype, jnp.asarray(y).dtype)
        return jnp.zeros((jnp.shape(x)[0], jnp.shape(y)[0]), dtype=dt)

    def diag(self, x, y):
        dt = jnp.result_type(jnp.asarray(x).dtype, jnp.asarray(y).dtype)
        return jnp.zeros((jnp.shape(x)[0],), dtype=dt)


@pytree_dataclass
class LinearKernel(Kernel):
    """k(x, y) = <x, y> + c  (c defaults to 0)."""

    c: jnp.ndarray = 0.0

    def matrix(self, x, y):
        return pairwise.pairwise_dot(x, y) + self.c

    def diag(self, x, y):
        return pairwise.dot_diag(x, y) + self.c


@pytree_dataclass
class PolynomialKernel(Kernel):
    """k(x, y) = (<x, y> + c)^degree."""

    c: jnp.ndarray
    degree: int = static_field(default=2)

    def matrix(self, x, y):
        return (pairwise.pairwise_dot(x, y) + self.c) ** self.degree

    def diag(self, x, y):
        return (pairwise.dot_diag(x, y) + self.c) ** self.degree


@pytree_dataclass
class ExponentiatedKernel(Kernel):
    """k(x, y) = exp(<x, y>)  (KernelFunctions.jl ExponentiatedKernel)."""

    def matrix(self, x, y):
        return jnp.exp(pairwise.pairwise_dot(x, y))

    def diag(self, x, y):
        return jnp.exp(pairwise.dot_diag(x, y))


@pytree_dataclass
class WienerKernel(Kernel):
    """Brownian-motion kernel k(x, y) = min(x, y) on scalar inputs ≥ 0
    (KernelFunctions.jl WienerKernel i=0).  Nonstationary — exercises the
    conformance suite's PSD/diag checks off the stationary fast path."""

    def _vals(self, x):
        return pairwise.ensure_2d(x)[:, 0]

    def matrix(self, x, y):
        xv, yv = self._vals(x), self._vals(y)
        return jnp.minimum(xv[:, None], yv[None, :])

    def diag(self, x, y):
        return jnp.minimum(self._vals(x), self._vals(y))


@pytree_dataclass
class FBMKernel(Kernel):
    """Fractional Brownian motion with Hurst index h ∈ (0, 1):

        k(x, y) = ½ (‖x‖²ʰ + ‖y‖²ʰ − ‖x−y‖²ʰ)

    (KernelFunctions.jl FBMKernel; h = 0.5 recovers Wiener on R₊)."""

    h: jnp.ndarray = 0.5

    def _pow(self, sq):
        # |·|^{2h} from the squared quantity, with a zero-safe gradient
        eps = jnp.finfo(sq.dtype).eps ** 2
        return jnp.where(sq > 0, jnp.maximum(sq, eps) ** self.h, 0.0)

    def matrix(self, x, y):
        x2 = pairwise.dot_diag(x, x)
        y2 = pairwise.dot_diag(y, y)
        d2 = pairwise.pairwise_sqdist(x, y)
        return 0.5 * (
            self._pow(x2)[:, None] + self._pow(y2)[None, :] - self._pow(d2)
        )

    def diag(self, x, y):
        x2 = pairwise.dot_diag(x, x)
        y2 = pairwise.dot_diag(y, y)
        d2 = pairwise.sqdist_diag(x, y)
        return 0.5 * (self._pow(x2) + self._pow(y2) - self._pow(d2))

    def matrix_same(self, x):
        x2 = pairwise.dot_diag(x, x)
        d2 = pairwise.pairwise_sqdist(x, x)
        n = d2.shape[0]
        d2 = d2 * (1.0 - jnp.eye(n, dtype=d2.dtype))  # exact zero diagonal
        p = self._pow(x2)
        return 0.5 * (p[:, None] + p[None, :] - self._pow(d2))

    def diag_same(self, x):
        return self._pow(pairwise.dot_diag(x, x))


@pytree_dataclass
class NeuralNetworkKernel(Kernel):
    """Neural-network (arcsine) kernel, Williams (1998):

        k(x, y) = asin( <x, y> / √((1 + ‖x‖²)(1 + ‖y‖²)) )

    (KernelFunctions.jl NeuralNetworkKernel)."""

    def matrix(self, x, y):
        dot = pairwise.pairwise_dot(x, y)
        nx = 1.0 + pairwise.dot_diag(x, x)
        ny = 1.0 + pairwise.dot_diag(y, y)
        a = dot / jnp.sqrt(nx[:, None] * ny[None, :])
        return jnp.arcsin(jnp.clip(a, -1.0, 1.0))

    def diag(self, x, y):
        dot = pairwise.dot_diag(x, y)
        nx = 1.0 + pairwise.dot_diag(x, x)
        ny = 1.0 + pairwise.dot_diag(y, y)
        return jnp.arcsin(jnp.clip(dot / jnp.sqrt(nx * ny), -1.0, 1.0))
