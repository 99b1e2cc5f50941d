"""Pathwise (decoupled) sampling — functional prior draws + Matheron update.

Beyond the reference's sampling surface: `rand(key, fx)` (SURVEY.md §3.4)
draws a *finite-dimensional* sample via a Cholesky of the Np×Np predictive
covariance — O(Np³) per new design and no way to evaluate one coherent
sample at new points later.  This module implements *function-space*
sampling (Wilson et al. 2020, "Efficiently sampling functions from Gaussian
process posteriors"):

1. **Prior samples as functions.**  Every atomic leaf gets a random-Fourier
   feature (RFF) basis drawn from its kernel's spectral measure; a prior
   draw is  f_s(·) = m(·) + Σ_i w_si φ_i(·)  with w ~ N(0, I).  Because the
   process graph is *affine*, a joint functional draw of an entire GPPP
   follows by composing the leaf draws through the graph — sums add sample
   functions, scalings multiply, warps re-index, derivatives differentiate
   the sample path (exactly, via jvp), convolutions quadrature it.  All
   correlations between processes are preserved because each leaf is
   sampled once and shared.
2. **Pathwise conditioning (Matheron's rule).**  Given observations
   y = f(X) + ε,   f_s|y(·) = f_s(·) + K(·,X)(K+Σ)⁻¹(y − f_s(X) − ε_s)
   turns S prior function draws into S *posterior* function draws with ONE
   N×N factorisation, after which evaluating a coherent posterior sample at
   n new points costs O(S·n·(N+F)) — no Np×Np covariance, no second
   Cholesky, cross-process evaluation included.

TPU-first: the basis evaluation is a (n,d)×(d,F) matmul + cos epilogue and
the update is one GEMM per query — all MXU work with static shapes; S and F
are compile-time constants.

Accuracy: exact in distribution up to the O(1/√F) RFF approximation of the
prior (tested statistically in tests/test_sampling.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field
from stheno_tpu.kernels import base as _kb
from stheno_tpu.kernels import zoo as _kz
from stheno_tpu.ops.pairwise import ensure_2d
from stheno_tpu import graph as _g
from stheno_tpu.inputs import BlockData, GPPPInput
from stheno_tpu.ops import chol as _chol


# ---------------------------------------------------------------------------
# Spectral feature bases
# ---------------------------------------------------------------------------


@pytree_dataclass
class FourierBasis:
    """φ_i(x) = scale_i · cos(ω_iᵀ t(x) + b_i);  E[φ(x)ᵀφ(y)] = k(x,y).

    `transform` composes any non-linear input transforms found while
    descending the kernel (linear lengthscale transforms are folded directly
    into ω)."""

    omega: jnp.ndarray  # (F, d)
    phase: jnp.ndarray  # (F,)
    scale: jnp.ndarray  # (F,)
    transform: object = static_field(default=None)

    @property
    def num_features(self):
        return self.omega.shape[0]

    def __call__(self, x):
        if self.transform is not None:
            x = self.transform(x)
        x2 = ensure_2d(x)
        proj = x2 @ self.omega.T + self.phase[None, :]
        return jnp.cos(proj) * self.scale[None, :]


def _matern_omega(key, num_features, dim, nu, dtype):
    """ω ~ t_{2ν}(0, I): the Matérn-ν spectral measure at unit lengthscale
    in this zoo's convention (S(ω) ∝ (2ν + ‖ω‖²)^{-(ν+D/2)}; e.g. ν=1/2 →
    Cauchy scale 1, the Fourier transform of k(d)=e^{-d})."""
    kz, ku = jax.random.split(key)
    z = jax.random.normal(kz, (num_features, dim), dtype)
    df = 2.0 * nu
    u = 2.0 * jax.random.gamma(ku, df / 2.0, (num_features, 1)).astype(dtype)
    return z * jnp.sqrt(df / u)


def spectral_features(kernel, key, num_features, input_dim=1, dtype=None):
    """Draw a `FourierBasis` from `kernel`'s spectral measure.

    Supported: SE, Matérn-1/2/3/2/5/2, RationalQuadratic, Cosine, and any
    scaling / lengthscale / sum / product / non-linear-input-transform
    composition of them.  Non-stationary kernels (Linear, Wiener, FBM,
    NeuralNetwork, Periodic) have no translation-invariant spectral measure
    — they raise, and pathwise sampling falls back to the dense `rand`."""
    dt = dtype or jnp.result_type(float)
    F, d = num_features, input_dim

    if isinstance(kernel, _kz.SEKernel):
        om = jax.random.normal(key, (F, d), dt)
    elif isinstance(kernel, _kz.Matern12Kernel):
        om = _matern_omega(key, F, d, 0.5, dt)
    elif isinstance(kernel, _kz.Matern32Kernel):
        om = _matern_omega(key, F, d, 1.5, dt)
    elif isinstance(kernel, _kz.Matern52Kernel):
        om = _matern_omega(key, F, d, 2.5, dt)
    elif isinstance(kernel, _kz.RationalQuadraticKernel):
        # RQ = Gamma(α, rate α) scale mixture of SE over the precision
        kz_, ku = jax.random.split(key)
        z = jax.random.normal(kz_, (F, d), dt)
        s = jax.random.gamma(ku, kernel.alpha, (F, 1)).astype(dt) / kernel.alpha
        om = z * jnp.sqrt(s)
    elif isinstance(kernel, _kz.CosineKernel):
        # deterministic line spectrum at ±π (this zoo's cos(π d); the
        # pairwise kernel is cos(π‖x−y‖), which for d>1 is NOT cos(πΣdx_i)
        # — no product spectral measure exists, so refuse rather than
        # silently approximate the wrong kernel.
        if d > 1:
            raise NotImplementedError(
                "CosineKernel spectral basis is only defined for 1-D inputs"
            )
        om = jnp.full((F, d), jnp.asarray(jnp.pi, dt))
    elif isinstance(kernel, _kb.ScaledKernel):
        base = spectral_features(kernel.kernel, key, F, d, dt)
        return FourierBasis(
            base.omega,
            base.phase,
            base.scale * jnp.sqrt(jnp.asarray(kernel.variance, dt)),
            base.transform,
        )
    elif isinstance(kernel, _kb.TransformedKernel):
        t = kernel.transform
        if isinstance(t, _kb._LengthscaleTransform):
            base = spectral_features(kernel.kernel, key, F, d, dt)
            ell = jnp.asarray(t.lengthscale, dt)
            if base.transform is None:
                # k(x/ℓ, y/ℓ) with linear features ⇒ fold into ω exactly
                om = base.omega / (ell if ell.ndim == 0 else ell[None, :])
                return FourierBasis(om, base.phase, base.scale, None)
            # inner kernel carries a non-linear input map T:
            # cos(ωᵀT(x/ℓ)) ≠ cos((ω/ℓ)ᵀT(x)) — compose the division into
            # the basis input map instead of folding into ω.
            inner = base.transform
            tf = lambda x, _i=inner, _e=ell: _i(jnp.asarray(x) / _e)
            return FourierBasis(base.omega, base.phase, base.scale, tf)
        # non-linear input transform: compose into the basis input map
        base = spectral_features(kernel.kernel, key, F, d, dt)
        inner = base.transform
        tf = t if inner is None else (lambda x, _t=t, _i=inner: _i(_t(x)))
        return FourierBasis(base.omega, base.phase, base.scale, tf)
    elif isinstance(kernel, _kb.SumKernel):
        k1, k2 = jax.random.split(key)
        f1 = F // 2
        b1 = spectral_features(kernel.left, k1, f1, d, dt)
        b2 = spectral_features(kernel.right, k2, F - f1, d, dt)
        if b1.transform is not None or b2.transform is not None:
            raise NotImplementedError(
                "sum of input-transformed kernels in one spectral basis"
            )
        # each block normalises by its own F, so concatenation is exact
        return FourierBasis(
            jnp.concatenate([b1.omega, b2.omega]),
            jnp.concatenate([b1.phase, b2.phase]),
            jnp.concatenate([b1.scale, b2.scale]),
            None,
        )
    elif isinstance(kernel, _kb.ProductKernel):
        # spectral measure of a product is the convolution: ω = ω₁ + ω₂
        k1, k2 = jax.random.split(key)
        b1 = spectral_features(kernel.left, k1, F, d, dt)
        b2 = spectral_features(kernel.right, k2, F, d, dt)
        if b1.transform is not None or b2.transform is not None:
            raise NotImplementedError(
                "product of input-transformed kernels in one spectral basis"
            )
        # scale_i = √(2 vᵢ/F) each → product needs √(2 v₁v₂/F)
        scale = b1.scale * b2.scale * jnp.sqrt(jnp.asarray(F / 2.0, dt))
        return FourierBasis(b1.omega + b2.omega, b1.phase, scale, None)
    else:
        raise NotImplementedError(
            f"no spectral measure for {type(kernel).__name__}; "
            "pathwise sampling supports stationary kernels "
            "(SE/Matérn/RQ/Cosine and their algebra)"
        )

    kp = jax.random.fold_in(key, 7)
    phase = jax.random.uniform(kp, (F,), dt, 0.0, 2.0 * jnp.pi)
    scale = jnp.full((F,), jnp.sqrt(jnp.asarray(2.0 / F, dt)))
    return FourierBasis(om, phase, scale, None)


# ---------------------------------------------------------------------------
# Functional prior draws over a process graph / programme
# ---------------------------------------------------------------------------


class PriorFunctionSamples:
    """S joint functional draws of a process or whole programme.

    Call with raw inputs (plain process) or tagged inputs
    (GPPPInput/BlockData for a GPPP) → (S, n) sample-path values.  The same
    object evaluates ONE coherent set of sample paths at any inputs, any
    process."""

    def __init__(self, root, leaf_draws, num_samples):
        self._root = root
        self._leaf = leaf_draws  # id -> (basis, weights (S,F), mean_fn)
        self.num_samples = num_samples

    def __call__(self, x):
        return self._eval(self._root, x)

    def _eval(self, f, x):
        from stheno_tpu.gppp import GPPP

        if isinstance(f, GPPP):
            node, v = f.extract(x)
            return self._eval(node, v)
        if isinstance(f, _g.AtomicGP):
            basis, w, mean_fn = self._leaf[f.n]
            return mean_fn(x)[None, :] + w @ basis(x).T
        if isinstance(f, _g.SumGP):
            return self._eval(f.left, x) + self._eval(f.right, x)
        if isinstance(f, _g.AddConstGP):
            return f.b + self._eval(f.f, x)
        if isinstance(f, _g.AddFnGP):
            return jnp.asarray(f.b(jnp.asarray(x)))[None, :] + self._eval(f.f, x)
        if isinstance(f, _g.ScaledGP):
            return f.sigma * self._eval(f.f, x)
        if isinstance(f, _g.ScaledFnGP):
            return f._s(x)[None, :] * self._eval(f.f, x)
        if isinstance(f, _g.CompositeGP):
            return self._eval(f.f, f._w(x))
        if isinstance(f, _g.ConvolvedGP):
            return self._eval(f.f, f.nodes) @ f._w(x).T
        if isinstance(f, _g.DerivativeGP):
            return _g._jvp_ones(lambda xx: self._eval(f.f, xx), jnp.asarray(x))
        if isinstance(f, _g.CrossGP):
            bs = f._blocks(x)
            return jnp.concatenate(
                [self._eval(fi, b) for fi, b in zip(f.fs, bs)], axis=1
            )
        raise NotImplementedError(
            f"pathwise sampling through {type(f).__name__}"
        )


_UNARY_NODES = (
    _g.AddConstGP,
    _g.AddFnGP,
    _g.ScaledGP,
    _g.ScaledFnGP,
    _g.CompositeGP,
    _g.ConvolvedGP,
    _g.DerivativeGP,
)


def _collect_atomics(f, out):
    from stheno_tpu.gppp import GPPP

    if isinstance(f, GPPP):
        for p in f.processes.values():
            _collect_atomics(p, out)
    elif isinstance(f, _g.AtomicGP):
        out[f.n] = f
    elif isinstance(f, _g.SumGP):
        _collect_atomics(f.left, out)
        _collect_atomics(f.right, out)
    elif isinstance(f, _g.CrossGP):
        for fi in f.fs:
            _collect_atomics(fi, out)
    elif isinstance(f, _UNARY_NODES):
        _collect_atomics(f.f, out)
    else:
        raise NotImplementedError(
            f"pathwise sampling through {type(f).__name__}"
        )


def prior_samples(f, key, num_samples, num_features=1024, input_dim=1,
                  dtype=None):
    """Draw S functional prior samples of process/programme `f` (RFF).

    Every atomic leaf of the graph gets one shared basis + weight draw, so
    evaluations at different inputs and different (derived) processes are
    samples of the JOINT prior.  Returns a `PriorFunctionSamples` callable.
    """
    leaves = {}
    _collect_atomics(f, leaves)
    if not leaves:
        raise ValueError("no atomic leaves found to sample")
    draws = {}
    for i, (nid, leaf) in enumerate(sorted(leaves.items())):
        kb, kw = jax.random.split(jax.random.fold_in(key, i))
        basis = spectral_features(
            leaf.kernel, kb, num_features, input_dim, dtype
        )
        w = jax.random.normal(
            kw, (num_samples, basis.num_features), basis.omega.dtype
        )
        draws[nid] = (basis, w, leaf.mean)
    return PriorFunctionSamples(f, draws, num_samples)


# ---------------------------------------------------------------------------
# Pathwise conditioning (Matheron update)
# ---------------------------------------------------------------------------


class PosteriorFunctionSamples:
    """S coherent posterior function draws:  f_s(·) + K(·,X) v_s."""

    def __init__(self, prior_fn, fx, V):
        self._prior = prior_fn
        self._fx = fx
        self._V = V  # (N, S)
        self.num_samples = prior_fn.num_samples

    def __call__(self, x):
        from stheno_tpu.finite_gp import _cross_cov_any

        Kxs = _cross_cov_any(self._fx.f, self._fx.x, self._fx.f, x)  # (N, n)
        return self._prior(x) + (Kxs.T @ self._V).T


def pathwise_conditioned_samples(fx, y, key, num_samples, num_features=1024,
                                 input_dim=1, dtype=None):
    """S posterior function draws given observations `y` of `fx` = f(X, Σ)
    — Matheron's rule on RFF prior paths (Wilson et al. 2020, eq. 13):

        f_s|y(·) = f_s(·) + K(·,X)(K+Σ)⁻¹(y − f_s(X) − ε_s),  ε_s ~ N(0,Σ)

    One (K+Σ) factorisation total; each evaluation afterwards is one GEMM.
    Works across processes of a GPPP: observe `f3`, evaluate the same
    posterior sample on `f1`."""
    from stheno_tpu.finite_gp import DiagNoise, FullNoise

    k_prior, k_eps = jax.random.split(key)
    prior_fn = prior_samples(
        fx.f, k_prior, num_samples, num_features, input_dim, dtype
    )
    F_X = prior_fn(fx.x)  # (S, N)
    n = F_X.shape[1]
    if isinstance(fx.noise, DiagNoise):
        eps = jnp.sqrt(fx.noise.diag(n))[None, :] * jax.random.normal(
            k_eps, F_X.shape, F_X.dtype
        )
    elif isinstance(fx.noise, FullNoise):
        Ln = _chol.cholesky_psd(fx.noise.cov)
        eps = (Ln @ jax.random.normal(k_eps, (n, prior_fn.num_samples),
                                      F_X.dtype)).T
    else:  # pragma: no cover - as_noise guarantees the two cases above
        raise TypeError(f"unsupported noise {type(fx.noise).__name__}")
    L = _chol.cholesky_psd(fx.cov())
    resid = (jnp.asarray(y)[None, :] - F_X - eps).T  # (N, S)
    V = _chol.chol_solve(L, resid)
    return PosteriorFunctionSamples(prior_fn, fx, V)


__all__ = [
    "FourierBasis",
    "spectral_features",
    "prior_samples",
    "PriorFunctionSamples",
    "pathwise_conditioned_samples",
    "PosteriorFunctionSamples",
]
