"""Scoped (thread-local) tuning-config overrides (VERDICT r3 item 6).

The perf knobs are trace-time state; the scoped API must (a) actually steer
the traced computation, (b) be impossible to leak — including when the body
raises — and (c) take precedence over, without mutating, the legacy
process-wide setters.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from stheno_tpu import config as cfg
from stheno_tpu.ops import blocked_cholesky as bc
from stheno_tpu.ops import chol as C


def _psd(rng, n, dtype=jnp.float64):
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n), dtype=dtype)


def test_gemm_precision_scope_restores_and_applies():
    assert bc._active_prec() == lax.Precision.HIGH
    with cfg.gemm_precision("highest"):
        assert bc._active_prec() == lax.Precision.HIGHEST
        with cfg.gemm_precision("high"):
            assert bc._active_prec() == lax.Precision.HIGH
        assert bc._active_prec() == lax.Precision.HIGHEST
    assert bc._active_prec() == lax.Precision.HIGH
    # the legacy global default was never touched
    assert bc._PREC == lax.Precision.HIGH


def test_override_cannot_escape_on_exception():
    with pytest.raises(RuntimeError):
        with cfg.gemm_precision("highest"):
            raise RuntimeError("boom")
    assert bc._active_prec() == lax.Precision.HIGH
    with pytest.raises(RuntimeError):
        with cfg.bwd_params(mode="fused", block=64):
            raise RuntimeError("boom")
    assert bc._active_bwd_params()[2] in ("iter", "fused")
    assert bc._active_bwd_params() == (
        bc._BWD_BASE, bc._BWD_VIA_INV, bc._BWD_MODE, bc._BWD_BLOCK)


def test_bwd_params_partial_override():
    base0, via0, mode0, blk0 = bc._active_bwd_params()
    with cfg.bwd_params(block=512):
        base, via, mode, blk = bc._active_bwd_params()
        assert blk == 512
        assert (base, via, mode) == (base0, via0, mode0)
    assert bc._active_bwd_params() == (base0, via0, mode0, blk0)


def test_scoped_bwd_mode_steers_gradients(rng):
    """The scoped mode override is consulted at trace time: gradients under
    each mode agree with lax autodiff (so the override really runs the
    selected reverse rule and really ends with the scope)."""
    n = 256
    K = _psd(rng, n)
    ct = jnp.asarray(rng.normal(size=(n, n)))
    _, vjp_l = jax.vjp(jnp.linalg.cholesky, K)
    gl = vjp_l(ct)[0]
    gl_s = 0.5 * (gl + gl.T)
    for mode, blk in [("fused", 128), ("iter", 128), ("rec", 128)]:
        with cfg.bwd_params(mode=mode, block=blk, base=64):
            _, vjp_b = jax.vjp(
                lambda A: bc.blocked_cholesky(A, block=128, base=64), K)
            gb = vjp_b(ct)[0]
        gb_s = 0.5 * (gb + gb.T)
        np.testing.assert_allclose(
            np.asarray(gb_s), np.asarray(gl_s), atol=1e-8)


def test_chol_backend_scope(rng):
    K = _psd(rng, 64)
    with cfg.chol_backend("blocked"):
        assert C._use_blocked(K)
    with cfg.chol_backend("lax"):
        assert not C._use_blocked(K)
    with pytest.raises(ValueError):
        cfg.chol_backend("nope")


def test_overrides_are_thread_local():
    seen = {}

    def other_thread():
        seen["prec"] = bc._active_prec()

    with cfg.gemm_precision("highest"):
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
    assert seen["prec"] == lax.Precision.HIGH  # not the scoped HIGHEST


def test_set_gemm_precision_rejects_none():
    # ADVICE r3: a None forward precision made the backward-override
    # restore path skip — now rejected outright.
    with pytest.raises(ValueError):
        bc.set_gemm_precision(None)


def test_snapshot_is_hashable_and_tracks_scope():
    s0 = cfg.snapshot()
    hash(s0)
    with cfg.gemm_precision("highest"), cfg.bwd_params(block=512):
        s1 = cfg.snapshot()
        hash(s1)
        assert s1 != s0
        assert dict(s1)["gemm_precision"] == lax.Precision.HIGHEST
    assert cfg.snapshot() == s0


def test_bwd_precision_scope_steers_backward(rng):
    """A scoped backward-precision override must apply inside the reverse
    rule's trace and not leak into the forward precision afterwards."""
    n = 128
    K = _psd(rng, n, dtype=jnp.float32)
    ct = jnp.asarray(rng.normal(size=(n, n)), dtype=jnp.float32)
    with cfg.bwd_precision("highest"):
        _, vjp_b = jax.vjp(
            lambda A: bc.blocked_cholesky(A, block=64, base=32), K)
        vjp_b(ct)
        assert bc._active_prec() == lax.Precision.HIGH  # forward unaffected
    assert bc._active_bwd_prec() is None
    assert bc._active_prec() == lax.Precision.HIGH


def test_snapshot_includes_base_factorisers():
    """Two configurations differing only in base factoriser must produce
    different snapshots (jit-cache keys) — ADVICE r4."""
    import stheno_tpu.config as cfg

    s0 = cfg.snapshot()

    def my_base(A):  # pragma: no cover - identity marker only
        return A

    with cfg.scoped(base_cholesky=my_base):
        s1 = cfg.snapshot()
    with cfg.scoped(base_tri_inv=my_base):
        s2 = cfg.snapshot()
    assert s1 != s0 and s2 != s0 and s1 != s2
    assert cfg.snapshot() == s0
