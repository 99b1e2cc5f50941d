"""Hot-path ops: blocked Cholesky / solves vs lax references, Pallas fused
kernelmatrix (interpret mode on CPU) vs the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu.ops.blocked_cholesky import (
    blocked_cholesky,
    blocked_solve_lower,
    blocked_solve_upper_T,
)
from stheno_tpu.experimental.pallas.kernelmatrix import pairwise_kernelmatrix


def _psd(rng, n):
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n,block,base", [(512, 256, 256), (1024, 512, 256), (768, 256, 128)])
def test_blocked_cholesky_matches_lax(rng, n, block, base):
    K = _psd(rng, n)
    L = blocked_cholesky(K, block=block, base=base)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, atol=1e-7 * n)


def test_blocked_solves(rng):
    n = 512
    K = _psd(rng, n)
    L = blocked_cholesky(K, block=256, base=128)
    b = jnp.asarray(rng.normal(size=n))
    x = blocked_solve_lower(L, b, block=128)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(L), np.asarray(b)), atol=1e-8
    )
    xt = blocked_solve_upper_T(L, b, block=128)
    np.testing.assert_allclose(
        np.asarray(xt), np.linalg.solve(np.asarray(L).T, np.asarray(b)), atol=1e-8
    )
    # matrix rhs
    Bm = jnp.asarray(rng.normal(size=(n, 3)))
    Xm = blocked_solve_lower(L, Bm, block=128)
    np.testing.assert_allclose(
        np.asarray(Xm), np.linalg.solve(np.asarray(L), np.asarray(Bm)), atol=1e-8
    )


def test_blocked_cholesky_grad(rng):
    """Differentiability of the unrolled factorisation."""
    n = 256
    K = _psd(rng, n)

    def f_blocked(s):
        return jnp.sum(blocked_cholesky(K * s, block=128, base=64))

    def f_lax(s):
        return jnp.sum(jnp.linalg.cholesky(K * s))

    g1 = jax.grad(f_blocked)(jnp.asarray(1.0))
    g2 = jax.grad(f_lax)(jnp.asarray(1.0))
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-8)


@pytest.mark.parametrize("name,kern", [
    ("se", st.SEKernel()),
    ("matern12", st.Matern12Kernel()),
    ("matern32", st.Matern32Kernel()),
    ("matern52", st.Matern52Kernel()),
])
@pytest.mark.parametrize("dim", [1, 3])
def test_pallas_kernelmatrix_interpret(rng, name, kern, dim):
    n, m = 256, 128
    x = jnp.asarray(
        rng.normal(size=(n, dim)) if dim > 1 else rng.normal(size=n),
        dtype=jnp.float32,
    )
    y = jnp.asarray(
        rng.normal(size=(m, dim)) if dim > 1 else rng.normal(size=m),
        dtype=jnp.float32,
    )
    K = pairwise_kernelmatrix(x, y, name=name, tile_m=128, tile_n=128)
    K_ref = st.kernelmatrix(kern, x, y)
    # 2e-4: the Pallas kernel uses the matmul-identity sqdist in f32, while
    # the library's D=1 reference path is the exact direct difference
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=2e-4)
    # same-input path with exact diagonal
    Kxx = pairwise_kernelmatrix(x, name=name, tile_m=128, tile_n=128)
    np.testing.assert_allclose(np.diagonal(Kxx), np.ones(n), atol=1e-6)


def test_pallas_kernelmatrix_ard(rng):
    x = jnp.asarray(rng.normal(size=(256, 2)), dtype=jnp.float32)
    ell = jnp.asarray([0.5, 2.0], dtype=jnp.float32)
    K = pairwise_kernelmatrix(x, name="se", lengthscale=ell, variance=2.0,
                              tile_m=128, tile_n=128)
    K_ref = 2.0 * st.kernelmatrix(st.with_lengthscale(st.SEKernel(), ell), x)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-5)


def test_blocked_cholesky_custom_vjp_random_cotangent(rng):
    """Custom VJP vs lax autodiff under an arbitrary cotangent."""
    n = 256
    K = _psd(rng, n)
    ct = jnp.asarray(rng.normal(size=(n, n)))

    _, vjp_b = jax.vjp(lambda A: blocked_cholesky(A, block=128, base=64), K)
    _, vjp_l = jax.vjp(jnp.linalg.cholesky, K)
    gb = vjp_b(ct)[0]
    gl = vjp_l(ct)[0]
    # conventions may differ by symmetrization; compare symmetrized pullbacks
    gb_s = 0.5 * (gb + gb.T)
    gl_s = 0.5 * (gl + gl.T)
    np.testing.assert_allclose(np.asarray(gb_s), np.asarray(gl_s), atol=1e-8)


@pytest.mark.parametrize(
    "bwd_base,via_inv,mode,bwd_block",
    [
        (256, True, "rec", 1024),
        (512, True, "rec", 1024),
        (1024, True, "rec", 1024),
        (256, False, "rec", 1024),
        (512, False, "rec", 1024),
        # iterative symmetric panel sweep (n³/3 MACs), several panel widths
        # incl. non-dividing (fallback) and full-size (single panel)
        (256, True, "iter", 256),
        (256, True, "iter", 512),
        (256, False, "iter", 512),
        (512, True, "iter", 448),
        (256, True, "iter", 1024),
        # fused panel sweep (solve-free backward): several panel widths
        # incl. non-dividing (fallback to rec) and full-size (single panel)
        (256, True, "fused", 256),
        (256, True, "fused", 512),
        (512, True, "fused", 448),
        (128, True, "fused", 128),
        (256, True, "fused", 1024),
    ],
)
def test_blocked_cholesky_bwd_knob_configs(rng, bwd_base, via_inv, mode, bwd_block):
    """Every `set_bwd_params` configuration (incl. the non-default ones that
    only perf probes used to exercise) must produce gradients matching lax
    autodiff (ADVICE.md round 1)."""
    from stheno_tpu.ops import blocked_cholesky as bc

    n = 1024
    K = _psd(rng, n)
    ct = jnp.asarray(rng.normal(size=(n, n)))
    prev = bc.set_bwd_params(base=bwd_base, via_inv=via_inv, mode=mode, block=bwd_block)
    try:
        _, vjp_b = jax.vjp(lambda A: blocked_cholesky(A, block=512, base=256), K)
        gb = vjp_b(ct)[0]
    finally:
        bc.set_bwd_params(*prev)
    _, vjp_l = jax.vjp(jnp.linalg.cholesky, K)
    gl = vjp_l(ct)[0]
    gb_s = 0.5 * (gb + gb.T)
    gl_s = 0.5 * (gl + gl.T)
    np.testing.assert_allclose(np.asarray(gb_s), np.asarray(gl_s), atol=2e-8 * n)


def _collect_primitive_shapes(jaxpr, name, out):
    """All input shapes of `name` eqns, recursing into sub-jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == name:
            out.append(eqn.invars[0].aval.shape)
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", v)
            if hasattr(sub, "eqns"):
                _collect_primitive_shapes(sub, name, out)
            elif isinstance(v, (list, tuple)):
                for w in v:
                    sw = getattr(w, "jaxpr", w)
                    if hasattr(sw, "eqns"):
                        _collect_primitive_shapes(sw, name, out)


@pytest.mark.parametrize("n", [
    1100,
    pytest.param(1500, marks=pytest.mark.slow),
    pytest.param(2100, marks=pytest.mark.slow),
])
def test_ragged_n_routes_blocked_with_padding(rng, n):
    """A ragged N above the panel width must ride the blocked path via
    identity padding — NOT silently fall back to the un-blocked lax
    Cholesky (VERDICT r3 weak-item 4).  Checked structurally (no full-size
    `cholesky` primitive in the jaxpr; base cases ≤256 only) and
    numerically (factor + logpdf grads match the dense oracle)."""
    import scipy.linalg

    from stheno_tpu import config as cfg
    from stheno_tpu.ops import chol as C

    K = _psd(rng, n)
    with cfg.chol_backend("blocked"):
        # structural: every cholesky primitive in the traced graph is a
        # base case (≤ the 1024 panel), never the full ragged size —
        # i.e. the blocked path was taken via padding, not the lax fallback
        jaxpr = jax.make_jaxpr(lambda A: C.cholesky_psd(A, 1e-9))(K)
        shapes = []
        _collect_primitive_shapes(jaxpr.jaxpr, "cholesky", shapes)
        assert shapes, "expected base-case cholesky primitives"
        assert all(s[-1] <= 1024 for s in shapes), shapes

        L = C.cholesky_psd(K, 1e-9)
        L_ref = scipy.linalg.cholesky(np.asarray(K) + 1e-9 * np.eye(n),
                                      lower=True)
        np.testing.assert_allclose(np.asarray(L), L_ref, atol=1e-8)

        # solves at ragged n (forward + closed-form adjoints) vs oracle
        b = jnp.asarray(rng.normal(size=(n,)))
        x = C.solve_lower(L, b)
        np.testing.assert_allclose(
            np.asarray(x), scipy.linalg.solve_triangular(L_ref, b, lower=True),
            atol=1e-8)
        y = jnp.asarray(rng.normal(size=(n,)))

        def lp(A):
            return C.mvn_logpdf_chol(y, jnp.zeros_like(y), C.cholesky_psd(A, 1e-9))

        g_blocked = jax.grad(lp)(K)
    with cfg.chol_backend("lax"):
        g_lax = jax.grad(lp)(K)
    np.testing.assert_allclose(np.asarray(g_blocked), np.asarray(g_lax),
                               atol=1e-8)


@pytest.mark.parametrize(
    "mode,bwd_base,bwd_block",
    [
        ("iter", 512, 1024),  # solve granularity 512 == fwd panel width
        ("fused", 256, 512),  # fused panel width == fwd panel width
    ],
)
def test_backward_reuses_forward_inverses(rng, mode, bwd_base, bwd_block):
    """When the backward's solve granularity aligns with the forward's
    panel width, the saved diagonal-block inverses are reused (round 4).
    Gradient parity with lax autodiff must hold on the reuse path."""
    from stheno_tpu.ops import blocked_cholesky as bc

    n = 2048
    K = _psd(rng, n)
    ct = jnp.asarray(rng.normal(size=(n, n)))
    prev = bc.set_bwd_params(base=bwd_base, via_inv=True, mode=mode,
                             block=bwd_block)
    try:
        _, vjp_b = jax.vjp(
            lambda A: blocked_cholesky(A, block=512, base=256), K)
        gb = vjp_b(ct)[0]
    finally:
        bc.set_bwd_params(*prev)
    _, vjp_l = jax.vjp(jnp.linalg.cholesky, K)
    gl = vjp_l(ct)[0]
    np.testing.assert_allclose(
        np.asarray(0.5 * (gb + gb.T)), np.asarray(0.5 * (gl + gl.T)),
        atol=2e-8 * n)


def test_cholesky_psd_lower_triangle_semantics(rng):
    """`cholesky_psd`'s blocked route factors tril(K) — the reference's
    `cholesky(Symmetric(K))` semantics (one triangle, never averaged).  On
    a deliberately ASYMMETRIC input the value must match LAPACK's
    lower-triangle read; on symmetric inputs gradients must match the lax
    route."""
    import scipy.linalg

    from stheno_tpu import config as cfg
    from stheno_tpu.ops import chol as C

    n = 1024
    K_asym = _psd(rng, n) + 0.05 * jnp.asarray(rng.normal(size=(n, n)))
    y = jnp.asarray(rng.normal(size=(n,)))

    with cfg.chol_backend("blocked"):
        L = C.cholesky_psd(K_asym, 1e-9)
    np.testing.assert_allclose(
        np.asarray(L),
        scipy.linalg.cholesky(
            np.asarray(K_asym) + 1e-9 * np.eye(n), lower=True),
        atol=1e-8,
    )

    # symmetric input: value AND logpdf gradient agree across backends
    K = _psd(rng, n)

    def lp(A):
        return C.mvn_logpdf_chol(
            y, jnp.zeros_like(y), C.cholesky_psd(A, 1e-9))

    with cfg.chol_backend("blocked"):
        g_blocked = jax.grad(lp)(K)
    with cfg.chol_backend("lax"):
        g_lax = jax.grad(lp)(K)
    np.testing.assert_allclose(np.asarray(g_blocked), np.asarray(g_lax),
                               atol=1e-8)


def test_blocked_sym_fold_machinery(rng):
    """`blocked_cholesky(sym=True)` (the explicit averaging fold — off the
    default path since round 5, kept as API) still factors 0.5·(A+Aᵀ)
    exactly, with matching gradients."""
    import scipy.linalg

    n = 1024
    K = _psd(rng, n) + 0.05 * jnp.asarray(rng.normal(size=(n, n)))  # asym
    K_sym = np.asarray(0.5 * (K + K.T))
    L = blocked_cholesky(K, 512, 256, True)
    np.testing.assert_allclose(
        np.asarray(L), scipy.linalg.cholesky(K_sym, lower=True), atol=1e-8)

    ct = jnp.asarray(rng.normal(size=(n, n)))
    _, vjp_b = jax.vjp(lambda A: blocked_cholesky(A, 512, 256, True), K)
    gb = vjp_b(ct)[0]
    _, vjp_l = jax.vjp(
        lambda A: jnp.linalg.cholesky(0.5 * (A + A.T)), K)
    gl = vjp_l(ct)[0]
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gl), atol=1e-8)


def test_pallas_chol_block_and_tri_inv(rng):
    """In-VMEM base-case kernels vs numpy (interpret mode on CPU)."""
    from stheno_tpu.experimental.pallas.chol_block import (
        chol_block_auto,
        tri_inv_block_auto,
    )

    for n in (128, 256):
        K = np.asarray(_psd(rng, n), dtype=np.float32)
        L_ref = np.linalg.cholesky(K)
        L = np.asarray(chol_block_auto(jnp.asarray(K)))
        np.testing.assert_allclose(L, L_ref, atol=2e-4 * np.abs(L_ref).max())
        M = np.asarray(tri_inv_block_auto(jnp.asarray(L_ref)))
        np.testing.assert_allclose(M @ L_ref, np.eye(n), atol=5e-5)


def test_blocked_cholesky_with_pallas_bases(rng):
    """Full blocked factorisation with the Pallas base factoriser and base
    triangular inverse swapped in (the TPU fast path) matches lax."""
    from stheno_tpu.ops import blocked_cholesky as bc
    from stheno_tpu.experimental.pallas.chol_block import (
        chol_block_auto,
        tri_inv_block_auto,
    )

    K = jnp.asarray(np.asarray(_psd(rng, 512), dtype=np.float32))
    p1 = bc.set_base_cholesky(chol_block_auto)
    p2 = bc.set_base_tri_inv(tri_inv_block_auto)
    try:
        L = bc._blocked_cholesky_impl(K, block=256, base=128)
    finally:
        bc.set_base_cholesky(p1)
        bc.set_base_tri_inv(p2)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(L_ref),
        atol=2e-4 * float(jnp.abs(L_ref).max()))


def test_fused_logpdf_matches_unfused(rng):
    """Closed-form-gradient logpdf (the TPU large-N path) ≡ the
    Cholesky-VJP path, for values and all gradients (f64)."""
    from stheno_tpu.ops import chol as C

    n = 256
    K = jnp.asarray(np.asarray(_psd(rng, n)))
    y = jnp.asarray(rng.normal(size=n))
    m = jnp.asarray(rng.normal(size=n))

    def f_old(K, y, m):
        return C.mvn_logpdf_chol(y, m, C.cholesky_psd(K))

    def f_new(K, y, m):
        return C._mvn_logpdf_fused(C.symmetrize(K), y - m)

    v0, g0 = jax.value_and_grad(f_old, argnums=(0, 1, 2))(K, y, m)
    v1, g1 = jax.value_and_grad(f_new, argnums=(0, 1, 2))(K, y, m)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-12)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=1e-12 * float(jnp.abs(a).max()))


def test_blocked_lauum(rng):
    from stheno_tpu.ops.blocked_cholesky import blocked_lauum

    n = 384
    L = jnp.linalg.cholesky(jnp.asarray(np.asarray(_psd(rng, n))))
    M = jnp.linalg.inv(L) * jnp.tri(n)
    S = blocked_lauum(M, block=128)
    np.testing.assert_allclose(
        np.asarray(S), np.asarray(M.T @ M), atol=1e-12)


def test_solve_lower_blocked_routing_parity(rng):
    """With the blocked backend forced, ops.chol.solve_lower must match lax
    for vector / multi-RHS and both transposes (the large-N TPU routing)."""
    from stheno_tpu.ops import chol as c

    n = 512
    K = _psd(rng, n)
    L = jnp.linalg.cholesky(K)
    b1 = jnp.asarray(rng.normal(size=n))
    b2 = jnp.asarray(rng.normal(size=(n, 3)))
    prev = c.CHOL_BACKEND
    c.CHOL_BACKEND = "blocked"
    try:
        for b in (b1, b2):
            for trans in (False, True):
                got = c.solve_lower(L, b, trans=trans)
                b2d = b[:, None] if b.ndim == 1 else b
                ref = jax.lax.linalg.triangular_solve(
                    L, b2d, left_side=True, lower=True, transpose_a=trans
                )
                ref = ref[:, 0] if b.ndim == 1 else ref
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), atol=1e-9
                )
    finally:
        c.CHOL_BACKEND = prev


def test_fwd_skips_inverse_stack_when_bwd_cannot_reuse(rng):
    """The forward only materialises the panel-inverse residual stack when
    the ACTIVE backward configuration can consume it (ADVICE r4): via_inv
    solves or the fused mode, at matching precision."""
    from stheno_tpu import config as cfg
    from stheno_tpu.ops import blocked_cholesky as bc

    K = _psd(rng, 1024)

    def residual_invs():
        _, (_, invs) = bc._blocked_cholesky_fwd(K, 512, 256, False)
        return invs

    assert residual_invs() is not None  # default: iter + via_inv=True
    with cfg.bwd_params(via_inv=False, mode="iter"):
        assert residual_invs() is None  # TRSM path never touches them
    with cfg.bwd_params(via_inv=False, mode="fused"):
        assert residual_invs() is not None  # fused slices them directly
    with cfg.bwd_precision("highest"):
        # differing backward precision: inverses built at fwd precision
        # must not be reused (nor collected)
        assert residual_invs() is None
    with cfg.bwd_precision("high"):
        assert residual_invs() is not None  # same as fwd precision: fine


def test_bwd_precision_override_grad_parity(rng):
    """Gradient parity with lax autodiff when the backward runs under a
    scoped precision override differing from the forward (the invs-reuse
    disable path, ADVICE r4)."""
    from stheno_tpu import config as cfg

    n = 1024
    K = _psd(rng, n)
    ct = jnp.asarray(rng.normal(size=(n, n)))
    with cfg.bwd_precision("highest"):
        _, vjp_b = jax.vjp(
            lambda A: blocked_cholesky(A, block=512, base=256), K)
        gb = vjp_b(ct)[0]
    _, vjp_l = jax.vjp(jnp.linalg.cholesky, K)
    gl = vjp_l(ct)[0]
    np.testing.assert_allclose(
        np.asarray(0.5 * (gb + gb.T)), np.asarray(0.5 * (gl + gl.T)),
        atol=2e-8 * n)
