"""The process-graph IR — layers 3 & 4 of SURVEY.md.

Replaces the reference's mutable-dispatch design (`AtomicGP`/`DerivedGP` +
Julia multiple dispatch over `(op, args)` tuples, src/gp/atomic_gp.jl,
src/gp/derived_gp.jl, src/affine_transformations/*) with an immutable DAG of
pytree dataclasses traversed by pure functions at *trace time*: by the time
XLA sees anything, the whole graph has been unrolled into one fused tensor
program of kernel-matrix blocks.

Node ids and the cross-covariance recursion
-------------------------------------------
Every node carries a topological index `n` assigned by a `GPC` counter at
construction — identical semantics to the reference (src/gp/util.jl:18-25).
The heart of the library is `cross_cov(f, g, x, x2)` (mirroring
src/gp/derived_gp.jl:31-44):

- same index                          → the node's own pairwise rule;
- an *atomic* node with larger index  → identically zero (independence by
  construction, src/gp/atomic_gp.jl:36-41);
- otherwise                           → distribute into the args of the
  higher-index node (each op class implements the left/right distribution
  rules of src/affine_transformations/{addition,product,compose,cross}.jl).

All `var*` methods are O(N) diagonal paths that never materialise an N×N
matrix (load-bearing; reference docs/src/internals.md:12-24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stheno_tpu.tree import is_pytree_callable, pytree_dataclass, static_field
from stheno_tpu.kernels.base import Kernel, kernelmatrix, kernelmatrix_diag
from stheno_tpu.means import MeanFunction, as_mean
from stheno_tpu.inputs import BlockData, input_length
from stheno_tpu.ops.pairwise import ensure_2d


# ---------------------------------------------------------------------------
# GPC — the topological-index counter (src/gp/util.jl:18-25)
# ---------------------------------------------------------------------------


class GPC:
    """Mutable counter assigning topological indices to graph nodes.

    All GPCs compare equal / hash identically so that a rebuilt model does not
    invalidate jit caches; programme-membership checks use identity (`is`),
    exactly like the reference's `@assert fa.gpc === fb.gpc`.

    Footgun (deliberate trade-off): because membership is object identity,
    a graph-bearing pytree that crosses a serialisation boundary (e.g.
    checkpoint round-trip of a model object, NOT of sampler state) loses
    programme membership — combining a restored process with one from the
    original programme raises.  The supported pattern is the reference's own:
    models are cheap pure functions of θ — checkpoint θ and rebuild via the
    `@gppp` builder, never pickle process graphs (SURVEY.md §5 "checkpoint").
    """

    __slots__ = ("n",)

    def __init__(self):
        self.n = 0

    def next_index(self) -> int:
        self.n += 1
        return self.n

    def __eq__(self, other):
        return isinstance(other, GPC)

    def __hash__(self):
        return 0

    # Context-manager sugar: `with GPC() as gpc: f = GP(SEKernel())`.
    def __enter__(self):
        _GPC_STACK.append(self)
        return self

    def __exit__(self, *exc):
        _GPC_STACK.pop()
        return False


_GPC_STACK: list = []


def _current_gpc() -> GPC:
    if not _GPC_STACK:
        raise RuntimeError(
            "GP(...) requires an active GPC. Either pass gpc= explicitly, "
            "build the model inside a @gppp-decorated function, or use "
            "`with GPC() as gpc:`."
        )
    return _GPC_STACK[-1]


def _check_same_gpc(*fs):
    gpc = fs[0].gpc
    for f in fs[1:]:
        if f.gpc is not gpc:
            raise ValueError(
                "Cannot combine GPs from different programmes (GPCs). "
                "(reference parity: addition.jl:9, cross.jl:42-46)"
            )
    return gpc


def _zeros_dtype(*inputs):
    from stheno_tpu.inputs import input_dtype

    return input_dtype(*inputs)


# ---------------------------------------------------------------------------
# Callable coercion: function-valued shifts / scalings / warps
# ---------------------------------------------------------------------------
#
# The reference differentiates through `b.(x)` / `σ.(x)` via Zygote
# (src/affine_transformations/addition.jl:62-87, product.jl:27-38).  Here a
# function-valued op argument is stored as a *pytree child*, so any numeric
# parameters it carries are traced: pass a `ParamFn(fn, params)` (or any
# registered pytree callable, e.g. a warp dataclass) and `jax.grad` flows
# into its params.  Opaque Python callables are wrapped as leafless
# `StaticFn`s — exactly the old static-aux behavior.


@pytree_dataclass
class StaticFn:
    """An opaque callable held as static aux data (no traced parameters)."""

    fn: object = static_field()

    def __call__(self, x):
        return self.fn(x)


@pytree_dataclass
class ParamFn:
    """`fn(params, x)` with `params` a traced pytree — a differentiable
    function-valued scaling/shift/warp argument.

        sigma = ParamFn(lambda p, x: p["a"] * jnp.tanh(x), {"a": theta})
        g = sigma * f        # d logpdf / d theta flows through sigma
    """

    fn: object = static_field()
    params: object = None

    def __call__(self, x):
        return self.fn(self.params, x)


def as_callable_tree(f):
    """Coerce a function-valued op argument into a pytree callable."""
    if not callable(f):
        raise TypeError(f"expected a callable, got {type(f)}")
    if is_pytree_callable(f):
        return f
    return StaticFn(f)


# ---------------------------------------------------------------------------
# Abstract process
# ---------------------------------------------------------------------------


class AbstractProcess:
    """A (prior) Gaussian process node inside a programme.

    Interface (x, x2 are input collections; plain arrays for ordinary nodes,
    BlockData for Cross nodes):

    - ``mean(x) -> (N,)``
    - ``cov(x) -> (N, N)``            unary covariance
    - ``cov2(x, x2) -> (N, M)``       same process, two input sets
    - ``var(x) -> (N,)``              marginal variance, O(N)
    - ``var2(x, x2) -> (N,)``         paired diag of cov2, O(N)

    plus the cross-distribution rules ``_cross_cov_l/_r`` and
    ``_cross_var_l/_r`` used by the module-level recursion.
    """

    #: True for leaf nodes (AtomicGP / WrappedGP): cross-cov between two
    #: distinct leaves is identically zero (independence by construction,
    #: src/gp/atomic_gp.jl:36-41).
    _is_atomic = False

    # -- arithmetic sugar (the affine-transformation user API) -------------
    def __add__(self, other):
        if isinstance(other, AbstractProcess):
            _check_same_gpc(self, other)
            return SumGP(self, other, n=self.gpc.next_index(), gpc=self.gpc)
        if callable(other):
            return AddFnGP(
                as_callable_tree(other), self,
                n=self.gpc.next_index(), gpc=self.gpc,
            )
        return AddConstGP(jnp.asarray(other), self, n=self.gpc.next_index(), gpc=self.gpc)

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, AbstractProcess):
            return self + (-other)
        return self + (-jnp.asarray(other))

    def __rsub__(self, other):
        return other + (-self)

    def __mul__(self, other):
        if isinstance(other, AbstractProcess):
            raise TypeError("Cannot multiply two GPs together. (product.jl:13)")
        if callable(other):
            return ScaledFnGP(
                as_callable_tree(other), self,
                n=self.gpc.next_index(), gpc=self.gpc,
            )
        return ScaledGP(jnp.asarray(other), self, n=self.gpc.next_index(), gpc=self.gpc)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __neg__(self):
        return (-1.0) * self

    def __matmul__(self, warp):
        """`f @ warp` — input composition, the `f ∘ g` of compose.jl:8."""
        return compose(self, warp)

    # -- FiniteGP construction ---------------------------------------------
    def __call__(self, x, noise=None):
        from stheno_tpu.finite_gp import FiniteGP

        return FiniteGP(self, x, noise)


# ---------------------------------------------------------------------------
# Leaf node
# ---------------------------------------------------------------------------


@pytree_dataclass
class AtomicGP(AbstractProcess):
    """Leaf process: mean function + kernel + topological index.

    Merges the reference's `GP(m, k)` (AbstractGPs) with its `atomic` wrapper
    (src/gp/atomic_gp.jl:11-22).  Cross-covariance between two *distinct*
    atomics is identically zero (independence by construction,
    src/gp/atomic_gp.jl:36-41) — enforced in `cross_cov` below.
    """

    mean_fn: MeanFunction
    kernel: Kernel
    n: int = static_field()
    gpc: GPC = static_field()

    _is_atomic = True

    def mean(self, x):
        return self.mean_fn(x)

    def cov(self, x):
        return kernelmatrix(self.kernel, x)

    def cov2(self, x, x2):
        return kernelmatrix(self.kernel, x, x2)

    def var(self, x):
        return kernelmatrix_diag(self.kernel, x)

    def var2(self, x, x2):
        return kernelmatrix_diag(self.kernel, x, x2)

    # Atomic nodes never distribute: the dispatcher handles them.
    def _cross_cov_l(self, other, x, x2):  # pragma: no cover
        raise AssertionError("unreachable: atomic cross handled by cross_cov")

    _cross_cov_r = _cross_cov_l
    _cross_var_l = _cross_cov_l
    _cross_var_r = _cross_cov_l


def GP(mean_or_kernel, kernel=None, gpc=None) -> AtomicGP:
    """`GP(kernel)` or `GP(mean, kernel)` — create an atomic process.

    The `gpc` defaults to the active programme context (set by `@gppp` /
    `with GPC()`), replacing the reference macro's rewrite of `GP(...)` into
    `atomic(GP(...), gpc)` (gaussian_process_probabilistic_programme.jl:193-197).
    """
    if kernel is None:
        mean, kern = None, mean_or_kernel
    else:
        mean, kern = mean_or_kernel, kernel
    if not isinstance(kern, Kernel):
        raise TypeError(f"expected a Kernel, got {type(kern)}")
    gpc = gpc if gpc is not None else _current_gpc()
    return AtomicGP(as_mean(mean), kern, n=gpc.next_index(), gpc=gpc)


_STATS_INTERFACE = ("mean", "cov", "cov2", "var", "var2")


@pytree_dataclass
class WrappedGP(AbstractProcess):
    """Leaf node wrapping ANY process-like object — a GPPP, a PosteriorGP,
    an ApproxPosteriorGP, or a process from *another* programme — as an
    independent atomic of this programme.

    This is the reference's generic `atomic(gp::AbstractGP, gpc)`
    (src/gp/atomic_gp.jl:11-22): the wrapped object keeps its internal
    structure (a wrapped GPPP still routes tagged inputs; a wrapped posterior
    still carries its conditioning), but *as seen by this programme* it is a
    fresh independent leaf — cross-cov against any other leaf is zero.
    Enables nested GPPPs and iterated conditioning across programmes
    (reference test/gaussian_process_probabilistic_programme.jl:107-120).
    """

    wrapped: object
    n: int = static_field()
    gpc: GPC = static_field()

    _is_atomic = True

    def mean(self, x):
        return self.wrapped.mean(x)

    def cov(self, x):
        return self.wrapped.cov(x)

    def cov2(self, x, x2):
        return self.wrapped.cov2(x, x2)

    def var(self, x):
        return self.wrapped.var(x)

    def var2(self, x, x2):
        return self.wrapped.var2(x, x2)

    def _cross_cov_l(self, other, x, x2):  # pragma: no cover
        raise AssertionError("unreachable: atomic cross handled by cross_cov")

    _cross_cov_r = _cross_cov_l
    _cross_var_l = _cross_cov_l
    _cross_var_r = _cross_cov_l


def atomic(gp, gpc=None) -> AbstractProcess:
    """Wrap/renumber a process into the programme `gpc` (reference `atomic`,
    src/gp/atomic_gp.jl:11-22).  Accepts:

    - an `AtomicGP` — re-registered with a fresh index;
    - a `(mean, kernel)` pair;
    - ANY object implementing the stats interface (mean/cov/cov2/var/var2):
      a GPPP, PosteriorGP, ApproxPosteriorGP, or a derived process from
      another programme — wrapped as an independent `WrappedGP` leaf.
    """
    gpc = gpc if gpc is not None else _current_gpc()
    if isinstance(gp, AtomicGP):
        return AtomicGP(gp.mean_fn, gp.kernel, n=gpc.next_index(), gpc=gpc)
    if isinstance(gp, tuple) and len(gp) == 2:
        return AtomicGP(as_mean(gp[0]), gp[1], n=gpc.next_index(), gpc=gpc)
    if all(hasattr(gp, m) for m in _STATS_INTERFACE):
        return WrappedGP(gp, n=gpc.next_index(), gpc=gpc)
    raise TypeError(
        "atomic expects an AtomicGP, a (mean, kernel) tuple, or any object "
        "implementing mean/cov/cov2/var/var2 (GPPP, PosteriorGP, ...)"
    )


# ---------------------------------------------------------------------------
# Sum of two processes (addition.jl:8-54)
# ---------------------------------------------------------------------------


@pytree_dataclass
class SumGP(AbstractProcess):
    left: AbstractProcess
    right: AbstractProcess
    n: int = static_field()
    gpc: GPC = static_field()

    def mean(self, x):
        return self.left.mean(x) + self.right.mean(x)

    def cov(self, x):
        return (
            self.left.cov(x)
            + self.right.cov(x)
            + cross_cov(self.left, self.right, x, x)
            + cross_cov(self.right, self.left, x, x)
        )

    def cov2(self, x, x2):
        return (
            self.left.cov2(x, x2)
            + self.right.cov2(x, x2)
            + cross_cov(self.left, self.right, x, x2)
            + cross_cov(self.right, self.left, x, x2)
        )

    def var(self, x):
        return (
            self.left.var(x)
            + self.right.var(x)
            + cross_var(self.left, self.right, x, x)
            + cross_var(self.right, self.left, x, x)
        )

    def var2(self, x, x2):
        return (
            self.left.var2(x, x2)
            + self.right.var2(x, x2)
            + cross_var(self.left, self.right, x, x2)
            + cross_var(self.right, self.left, x, x2)
        )

    def _cross_cov_l(self, other, x, x2):
        return cross_cov(self.left, other, x, x2) + cross_cov(self.right, other, x, x2)

    def _cross_cov_r(self, other, x, x2):
        return cross_cov(other, self.left, x, x2) + cross_cov(other, self.right, x, x2)

    def _cross_var_l(self, other, x, x2):
        return cross_var(self.left, other, x, x2) + cross_var(self.right, other, x, x2)

    def _cross_var_r(self, other, x, x2):
        return cross_var(other, self.left, x, x2) + cross_var(other, self.right, x, x2)


# ---------------------------------------------------------------------------
# Constant / known-function mean shifts (addition.jl:62-87)
# ---------------------------------------------------------------------------


class _PassthroughCov(AbstractProcess):
    """Shared cov rules for ops that only shift the mean."""

    def cov(self, x):
        return self.f.cov(x)

    def cov2(self, x, x2):
        return self.f.cov2(x, x2)

    def var(self, x):
        return self.f.var(x)

    def var2(self, x, x2):
        return self.f.var2(x, x2)

    def _cross_cov_l(self, other, x, x2):
        return cross_cov(self.f, other, x, x2)

    def _cross_cov_r(self, other, x, x2):
        return cross_cov(other, self.f, x, x2)

    def _cross_var_l(self, other, x, x2):
        return cross_var(self.f, other, x, x2)

    def _cross_var_r(self, other, x, x2):
        return cross_var(other, self.f, x, x2)


@pytree_dataclass
class AddConstGP(_PassthroughCov):
    """`b + f` for a constant b — shifts the mean, cov unchanged."""

    b: jnp.ndarray
    f: AbstractProcess
    n: int = static_field()
    gpc: GPC = static_field()

    def mean(self, x):
        return self.b + self.f.mean(x)


@pytree_dataclass
class AddFnGP(_PassthroughCov):
    """`b + f` for a deterministic function b mapping (N,[D]) -> (N,).

    `b` is a pytree callable (ParamFn / StaticFn / warp dataclass): any
    numeric parameters it carries are traced and differentiable (the
    reference differentiates `b.(x)` via Zygote, addition.jl:62-87)."""

    b: object = None
    f: AbstractProcess = None
    n: int = static_field(default=-1)
    gpc: GPC = static_field(default=None)

    def mean(self, x):
        return jnp.asarray(self.b(jnp.asarray(x))) + self.f.mean(x)


# ---------------------------------------------------------------------------
# Scaling (product.jl:11-73)
# ---------------------------------------------------------------------------


@pytree_dataclass
class ScaledGP(AbstractProcess):
    """`σ * f` for a constant σ."""

    sigma: jnp.ndarray
    f: AbstractProcess
    n: int = static_field()
    gpc: GPC = static_field()

    def mean(self, x):
        return self.sigma * self.f.mean(x)

    def cov(self, x):
        return (self.sigma**2) * self.f.cov(x)

    def cov2(self, x, x2):
        return (self.sigma**2) * self.f.cov2(x, x2)

    def var(self, x):
        return (self.sigma**2) * self.f.var(x)

    def var2(self, x, x2):
        return (self.sigma**2) * self.f.var2(x, x2)

    def _cross_cov_l(self, other, x, x2):
        return self.sigma * cross_cov(self.f, other, x, x2)

    def _cross_cov_r(self, other, x, x2):
        return cross_cov(other, self.f, x, x2) * self.sigma

    def _cross_var_l(self, other, x, x2):
        return self.sigma * cross_var(self.f, other, x, x2)

    def _cross_var_r(self, other, x, x2):
        return cross_var(other, self.f, x, x2) * self.sigma


@pytree_dataclass
class ScaledFnGP(AbstractProcess):
    """`σ * f` for a deterministic function σ mapping (N,[D]) -> (N,).

    `sigma` is a pytree callable (ParamFn / StaticFn): its numeric
    parameters are traced and differentiable (reference: Zygote through
    `σ.(x)`, product.jl:27-38)."""

    sigma: object = None
    f: AbstractProcess = None
    n: int = static_field(default=-1)
    gpc: GPC = static_field(default=None)

    def _s(self, x):
        return jnp.asarray(self.sigma(jnp.asarray(x)))

    def mean(self, x):
        return self._s(x) * self.f.mean(x)

    def cov(self, x):
        s = self._s(x)
        return s[:, None] * self.f.cov(x) * s[None, :]

    def cov2(self, x, x2):
        return self._s(x)[:, None] * self.f.cov2(x, x2) * self._s(x2)[None, :]

    def var(self, x):
        return self._s(x) ** 2 * self.f.var(x)

    def var2(self, x, x2):
        return self._s(x) * self.f.var2(x, x2) * self._s(x2)

    def _cross_cov_l(self, other, x, x2):
        return self._s(x)[:, None] * cross_cov(self.f, other, x, x2)

    def _cross_cov_r(self, other, x, x2):
        return cross_cov(other, self.f, x, x2) * self._s(x2)[None, :]

    def _cross_var_l(self, other, x, x2):
        return self._s(x) * cross_var(self.f, other, x, x2)

    def _cross_var_r(self, other, x, x2):
        return cross_var(other, self.f, x, x2) * self._s(x2)


# ---------------------------------------------------------------------------
# Input warps + composition (compose.jl)
# ---------------------------------------------------------------------------


@pytree_dataclass
class Stretch:
    """x ↦ l·x (scalar / per-dim vector / matrix l) — compose.jl:36-42."""

    l: jnp.ndarray

    def __call__(self, x):
        x = jnp.asarray(x)
        l = jnp.asarray(self.l)
        if l.ndim == 2:
            return ensure_2d(x) @ l.T
        if l.ndim == 1 and x.ndim == 2:
            return x * l[None, :]
        return l * x


@pytree_dataclass
class Select:
    """x ↦ x[..., idx] — projects f into higher-dim input space
    (compose.jl:72-77).  An integer idx yields scalar-per-point inputs."""

    idx: object = static_field()

    def __call__(self, x):
        x = ensure_2d(x)
        if isinstance(self.idx, int):
            return x[:, self.idx]
        return x[:, jnp.asarray(self.idx)]


@pytree_dataclass
class Periodic:
    """t ↦ [cos(2π f t), sin(2π f t)] embedding — compose.jl:93-99."""

    freq: jnp.ndarray

    def __call__(self, x):
        x = jnp.asarray(x)
        if x.ndim == 2 and x.shape[1] == 1:
            x = x[:, 0]
        w = 2.0 * jnp.pi * self.freq
        return jnp.stack([jnp.cos(w * x), jnp.sin(w * x)], axis=-1)


@pytree_dataclass
class Shift:
    """x ↦ x - a — compose.jl:114-119."""

    a: jnp.ndarray

    def __call__(self, x):
        x = jnp.asarray(x)
        a = jnp.asarray(self.a)
        if x.ndim == 2 and a.ndim == 1:
            return x - a[None, :]
        return x - a


@pytree_dataclass
class FnWarp:
    """Arbitrary vectorized input map (N,[D]) -> (N,[D']).

    `fn` is a pytree callable: wrap parameterised warps in `ParamFn` to make
    their parameters traced/differentiable."""

    fn: object = None

    def __call__(self, x):
        return self.fn(jnp.asarray(x))


@pytree_dataclass
class CompositeGP(AbstractProcess):
    """f ∘ g: statistics of `f` evaluated at warped inputs g(x)
    (compose.jl:8-28)."""

    f: AbstractProcess
    warp: object
    n: int = static_field()
    gpc: GPC = static_field()

    def _w(self, x):
        return self.warp(x)

    def mean(self, x):
        return self.f.mean(self._w(x))

    def cov(self, x):
        return self.f.cov(self._w(x))

    def cov2(self, x, x2):
        return self.f.cov2(self._w(x), self._w(x2))

    def var(self, x):
        return self.f.var(self._w(x))

    def var2(self, x, x2):
        return self.f.var2(self._w(x), self._w(x2))

    def _cross_cov_l(self, other, x, x2):
        return cross_cov(self.f, other, self._w(x), x2)

    def _cross_cov_r(self, other, x, x2):
        return cross_cov(other, self.f, x, self._w(x2))

    def _cross_var_l(self, other, x, x2):
        return cross_var(self.f, other, self._w(x), x2)

    def _cross_var_r(self, other, x, x2):
        return cross_var(other, self.f, x, self._w(x2))


def compose(f: AbstractProcess, warp) -> CompositeGP:
    """`f ∘ warp` (reference `∘`, compose.jl:8)."""
    if not isinstance(
        warp, (Stretch, Select, Periodic, Shift, FnWarp)
    ) and callable(warp):
        warp = FnWarp(as_callable_tree(warp))
    return CompositeGP(f, warp, n=f.gpc.next_index(), gpc=f.gpc)


def stretch(f: AbstractProcess, l) -> CompositeGP:
    """`stretch(f, l)(x) == f(l x)` — lengthscale 1/l (compose.jl:57-59)."""
    return compose(f, Stretch(jnp.asarray(l)))


def select(f: AbstractProcess, idx) -> CompositeGP:
    """Select input dims `idx` (compose.jl:84)."""
    return compose(f, Select(idx))


def periodic(f: AbstractProcess, freq) -> CompositeGP:
    """Periodic process with frequency `freq` via 2-D embedding
    (compose.jl:106)."""
    return compose(f, Periodic(jnp.asarray(freq)))


def shift(f: AbstractProcess, a) -> CompositeGP:
    """`shift(f, a)(x) = f(x - a)` (compose.jl:127)."""
    return compose(f, Shift(jnp.asarray(a)))


def additive_gp(fs, indices=None) -> AbstractProcess:
    """Σ_d f_d(x[indices_d]) — additive GP across input dims
    (additive_gp.jl:10-29)."""
    fs = list(fs)
    if indices is None:
        indices = list(range(len(fs)))
    if len(fs) != len(indices):
        raise ValueError("length(fs) must equal length(indices)")
    projected = [select(f, idx) for f, idx in zip(fs, indices)]
    out = projected[0]
    for p in projected[1:]:
        out = out + p
    return out


# ---------------------------------------------------------------------------
# Derivative processes (reference examples/differentiation — there a "correct,
# albeit unbearably slow" finite-difference affine transformation; here EXACT
# via nested jvp through the kernel, at matmul cost)
# ---------------------------------------------------------------------------


def _jvp_ones(fn, x):
    """Per-point derivative of a pointwise map via one jvp with unit
    tangents: valid because every statistic's dependence on the i-th input
    point is confined to row/entry i."""
    return jax.jvp(fn, (x,), (jnp.ones_like(x),))[1]


@pytree_dataclass
class DerivativeGP(AbstractProcess):
    """f′ — the derivative process of a once-differentiable 1-D process.

    Statistics are exact derivatives of the parent's statistics:
      mean′(x) = ∂ₓ mean(x);  cov(f′,f′)(x,y) = ∂ₓ∂_y k(x,y);
      cov(f′,g)(x,y) = ∂ₓ k_fg(x,y)
    computed by (nested) jvp at trace time — so they compose with every
    kernel, warp, and op in the graph, and with conditioning ("observe f,
    predict f′" and the reverse).
    """

    f: AbstractProcess
    n: int = static_field()
    gpc: GPC = static_field()

    def mean(self, x):
        return _jvp_ones(self.f.mean, x)

    def cov(self, x):
        return self.cov2(x, x)

    def cov2(self, x, x2):
        def dx_rows(xx):
            return _jvp_ones(lambda yy: self.f.cov2(xx, yy), x2)

        return _jvp_ones(dx_rows, x)

    def var(self, x):
        return self.var2(x, x)

    def var2(self, x, x2):
        def dx_rows(xx):
            return _jvp_ones(lambda yy: self.f.var2(xx, yy), x2)

        return _jvp_ones(dx_rows, x)

    def _cross_cov_l(self, other, x, x2):
        return _jvp_ones(lambda xx: cross_cov(self.f, other, xx, x2), x)

    def _cross_cov_r(self, other, x, x2):
        return _jvp_ones(lambda yy: cross_cov(other, self.f, x, yy), x2)

    def _cross_var_l(self, other, x, x2):
        return _jvp_ones(lambda xx: cross_var(self.f, other, xx, x2), x)

    def _cross_var_r(self, other, x, x2):
        return _jvp_ones(lambda yy: cross_var(other, self.f, x, yy), x2)


def derivative(f: AbstractProcess) -> DerivativeGP:
    """The derivative process f′ (1-D inputs).  Composes freely: sums,
    scalings, warps, second derivatives (`derivative(derivative(f))`),
    conditioning across f and f′."""
    return DerivativeGP(f, n=f.gpc.next_index(), gpc=f.gpc)


# ---------------------------------------------------------------------------
# Quadrature convolution (reference examples/convolutional_gp and
# examples/quadrature-convolution): (Cf)(x) = ∫ w(x, τ) f(τ) dτ approximated
# on fixed quadrature nodes — a linear functional of f, so all statistics
# are weight-matrix contractions of the parent's (MXU matmuls).
# ---------------------------------------------------------------------------


@pytree_dataclass
class ConvolvedGP(AbstractProcess):
    """(Cf)(x) ≈ Σ_j w(x, τ_j) Δ_j f(τ_j) over static quadrature nodes τ.

    `weight_fn(x, tau) -> (N, Q)` evaluates the smoothing window between
    each output point and each node (vectorised); `nodes` are the quadrature
    points (Q,) or (Q, D); `deltas` the quadrature weights (Q,).
    """

    f: AbstractProcess
    nodes: jnp.ndarray
    deltas: jnp.ndarray
    weight_fn: object = static_field()
    n: int = static_field(default=-1)
    gpc: GPC = static_field(default=None)

    def _w(self, x):
        return jnp.asarray(self.weight_fn(jnp.asarray(x), self.nodes)) * self.deltas[None, :]

    def mean(self, x):
        return self._w(x) @ self.f.mean(self.nodes)

    def cov(self, x):
        W = self._w(x)
        return W @ self.f.cov(self.nodes) @ W.T

    def cov2(self, x, x2):
        return self._w(x) @ self.f.cov(self.nodes) @ self._w(x2).T

    def var(self, x):
        W = self._w(x)
        return jnp.sum((W @ self.f.cov(self.nodes)) * W, axis=1)

    def var2(self, x, x2):
        W = self._w(x)
        W2 = self._w(x2)
        return jnp.sum((W @ self.f.cov(self.nodes)) * W2, axis=1)

    def _cross_cov_l(self, other, x, x2):
        return self._w(x) @ cross_cov(self.f, other, self.nodes, x2)

    def _cross_cov_r(self, other, x, x2):
        return cross_cov(other, self.f, x, self.nodes) @ self._w(x2).T

    def _cross_var_l(self, other, x, x2):
        return jnp.sum(
            self._w(x) * cross_cov(self.f, other, self.nodes, x2).T, axis=1
        )

    def _cross_var_r(self, other, x, x2):
        return jnp.sum(
            cross_cov(other, self.f, x, self.nodes) * self._w(x2), axis=1
        )


def convolve_quadrature(f: AbstractProcess, weight_fn, nodes, deltas=None):
    """Convolve `f` with the window `weight_fn` on quadrature `nodes`.

    `deltas` defaults to trapezoid weights on a uniform 1-D grid.  The
    result is a full graph citizen: it conditions jointly with f and every
    derived process (deconvolution = observe Cf, predict f).
    """
    nodes = jnp.asarray(nodes)
    if deltas is None:
        if nodes.ndim != 1:
            raise ValueError("provide explicit deltas for non-1D nodes")
        dx = nodes[1] - nodes[0]
        deltas = jnp.full(nodes.shape, dx).at[0].set(0.5 * dx).at[-1].set(0.5 * dx)
    return ConvolvedGP(
        f,
        nodes,
        jnp.asarray(deltas),
        weight_fn,
        n=f.gpc.next_index(),
        gpc=f.gpc,
    )


# ---------------------------------------------------------------------------
# Cross — stacking processes over BlockData (cross.jl:37-93)
# ---------------------------------------------------------------------------


@pytree_dataclass
class CrossGP(AbstractProcess):
    """A single process over BlockData formed by stacking `fs`.

    Block assembly happens at trace time with static block sizes; the
    reference's BlockArrays `mortar`/`_collect` glue (cross.jl:8-22) becomes
    plain `jnp.concatenate`/`jnp.block`, which XLA fuses for free (no custom
    rrules needed — JAX differentiates concatenate natively).
    """

    fs: tuple
    n: int = static_field()
    gpc: GPC = static_field()

    def _blocks(self, x: BlockData):
        if not isinstance(x, BlockData):
            raise TypeError("CrossGP expects BlockData inputs")
        if len(x.blocks) != len(self.fs):
            raise ValueError(
                f"BlockData has {len(x.blocks)} blocks but cross has "
                f"{len(self.fs)} processes"
            )
        return x.blocks

    def mean(self, x):
        bs = self._blocks(x)
        return jnp.concatenate([f.mean(b) for f, b in zip(self.fs, bs)])

    def cov(self, x):
        return self.cov2(x, x)

    def cov2(self, x, x2):
        bs = self._blocks(x)
        bs2 = self._blocks(x2) if isinstance(x2, BlockData) else None
        if bs2 is None:
            raise TypeError("CrossGP.cov2 expects BlockData on both sides")
        rows = []
        for fi, bi in zip(self.fs, bs):
            rows.append([cross_cov(fi, fj, bi, bj) for fj, bj in zip(self.fs, bs2)])
        return jnp.block(rows)

    def var(self, x):
        bs = self._blocks(x)
        return jnp.concatenate([f.var(b) for f, b in zip(self.fs, bs)])

    def var2(self, x, x2):
        bs = self._blocks(x)
        bs2 = self._blocks(x2)
        return jnp.concatenate(
            [f.var2(b, b2) for f, b, b2 in zip(self.fs, bs, bs2)]
        )

    def _cross_cov_l(self, other, x, x2):
        bs = self._blocks(x)
        return jnp.concatenate(
            [cross_cov(f, other, b, x2) for f, b in zip(self.fs, bs)], axis=0
        )

    def _cross_cov_r(self, other, x, x2):
        bs2 = self._blocks(x2)
        return jnp.concatenate(
            [cross_cov(other, f, x, b) for f, b in zip(self.fs, bs2)], axis=1
        )

    def _cross_var_l(self, other, x, x2):
        # Paired diag: slice the flat x2 to match each block (an O(N) path —
        # the reference falls back to diag(cov(...)) here, cross.jl:88-93).
        # When x2 is itself BlockData (cross-vs-cross with mismatched block
        # structure) fall back to the dense diag, as the reference does.
        if isinstance(x2, BlockData):
            return jnp.diagonal(self._cross_cov_l(other, x, x2))
        bs = self._blocks(x)
        out, off = [], 0
        for f, b in zip(self.fs, bs):
            nb = input_length(b)
            out.append(cross_var(f, other, b, x2[off : off + nb]))
            off += nb
        return jnp.concatenate(out)

    def _cross_var_r(self, other, x, x2):
        if isinstance(x, BlockData):
            return jnp.diagonal(self._cross_cov_r(other, x, x2))
        bs2 = self._blocks(x2)
        out, off = [], 0
        for f, b2 in zip(self.fs, bs2):
            nb = input_length(b2)
            out.append(cross_var(other, f, x[off : off + nb], b2))
            off += nb
        return jnp.concatenate(out)


def cross(fs) -> CrossGP:
    """Stack a collection of same-programme processes into one process over
    BlockData (cross.jl:37-40; internal API, used by GPPP routing)."""
    fs = tuple(fs)
    if len(fs) < 1:
        raise ValueError("cross requires at least one process")
    gpc = _check_same_gpc(*fs)
    return CrossGP(fs, n=gpc.next_index(), gpc=gpc)


# ---------------------------------------------------------------------------
# The pairwise-covariance recursion (src/gp/derived_gp.jl:31-59)
# ---------------------------------------------------------------------------


def cross_cov(f: AbstractProcess, g: AbstractProcess, x, x2):
    """cov(f(x), g(x2)) between any two processes in the same programme."""
    if f.gpc is not g.gpc:
        raise ValueError("cross_cov requires processes from the same programme")
    if f.n == g.n:
        return f.cov2(x, x2)
    if f._is_atomic and f.n > g.n or g._is_atomic and g.n > f.n:
        dt = _zeros_dtype(x, x2)
        return jnp.zeros((input_length(x), input_length(x2)), dtype=dt)
    if f.n >= g.n:
        return f._cross_cov_l(g, x, x2)
    return g._cross_cov_r(f, x, x2)


def cross_var(f: AbstractProcess, g: AbstractProcess, x, x2):
    """Paired diagonal of cross_cov — O(N), never materialises the matrix."""
    if f.gpc is not g.gpc:
        raise ValueError("cross_var requires processes from the same programme")
    if f.n == g.n:
        return f.var2(x, x2)
    if f._is_atomic and f.n > g.n or g._is_atomic and g.n > f.n:
        dt = _zeros_dtype(x, x2)
        return jnp.zeros((input_length(x),), dtype=dt)
    if f.n >= g.n:
        return f._cross_var_l(g, x, x2)
    return g._cross_var_r(f, x, x2)
