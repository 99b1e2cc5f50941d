"""TPU perf probe for the N=16k hot-loop components (dev tool, not a test).

Times individual pipeline pieces with the host-pull methodology from
BASELINE.md: every measured call ends in a `float()` pull of a scalar that
consumes the full output, with per-iteration varying inputs.  The pulled
scalar for a Cholesky factor is tr(L Lᵀ) = Σ L² — it equals tr(K) for a
correct factor, so it is simultaneously a forcing scalar, a NaN detector and
a correctness invariant.

Variants probed (pass names as argv to select; default = all):
  chol_cur        blocked_cholesky, HIGHEST precision (library default)
  chol_high       blocked_cholesky, HIGH (bf16_3x) GEMMs
  chol_btri       HIGHEST + blocked triangular-inverse forward TRSM
  chol_high_btri  HIGH + blocked forward TRSM
  chol_lax        XLA built-in cholesky
  km_xla          SE kernelmatrix via broadcast XLA
  km_pal          fused Pallas D=1 SE kernelmatrix (tile variants)

Usage:  python scripts/perf_probe.py [variant ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")

N = int(os.environ.get("PROBE_N", 16384))
DT = jnp.float32
REPS = int(os.environ.get("PROBE_REPS", 4))

x_host = jnp.linspace(-5.0, 5.0, N, dtype=DT)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def km_se(x, var=1.5):
    d = x[:, None] - x[None, :]
    return var * jnp.exp(-0.5 * d * d)


def timed(name, fn, reps=REPS, check=None):
    t0 = time.time()
    v = float(fn(0))
    log(f"{name:16s} compile+first {time.time()-t0:7.1f}s  scalar={v:.6g}"
        + (f"  expect≈{check:.6g}" if check is not None else ""))
    t0 = time.time()
    for i in range(1, reps + 1):
        out = float(fn(i))
    ms = (time.time() - t0) / reps * 1e3
    log(f"{name:16s} steady {ms:9.2f} ms   (last scalar {out:.6g})")
    return ms


# ---------------------------------------------------------------- cholesky
def make_chol_probe(chol_fn):
    @jax.jit
    def run(i):
        xx = x_host + i * 1e-7
        K = km_se(xx) + 0.1 * jnp.eye(N, dtype=DT)
        L = chol_fn(K)
        return jnp.vdot(L, L)  # = tr(K) for a correct factor; forces all of L

    return run


def blocked_chol_btri(A, block=2048, base=256):
    """Forward blocked Cholesky with the recursive blocked triangular
    inverse on the panel TRSM (vs the library's direct XLA TRSM-vs-I)."""
    from stheno_tpu.ops.blocked_cholesky import _mm, blocked_tri_inv_lower

    n = A.shape[-1]
    B = block
    nb = n // B
    L = jnp.zeros_like(A)
    for kb in range(nb):
        c = kb * B
        A_panel = lax.dynamic_slice(A, (c, c), (n - c, B))
        if kb > 0:
            rows = lax.dynamic_slice(L, (c, 0), (n - c, c))
            top = lax.dynamic_slice(L, (c, 0), (B, c))
            A_panel = A_panel - _mm(rows, top.T)
        A11 = A_panel[:B]
        from stheno_tpu.ops.blocked_cholesky import _blocked_cholesky_impl

        L11 = _blocked_cholesky_impl(A11, block=max(base, B // 4), base=base)
        out_panel = L11
        if n - c > B:
            A21 = A_panel[B:]
            L21 = _mm(A21, blocked_tri_inv_lower(L11, base=base).T)
            out_panel = jnp.concatenate([L11, L21], axis=0)
        L = lax.dynamic_update_slice(L, out_panel, (c, c))
    return L


# ------------------------------------------------------------ kernelmatrix
def make_km_xla():
    @jax.jit
    def run(i):
        xx = x_host + i * 1e-7
        K = km_se(xx)
        return jnp.vdot(K, K)

    return run


def make_km_pallas(tile_m, tile_n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, y_ref, o_ref):
        xv = x_ref[:]  # (tile_m, 1)
        yv = y_ref[:]  # (1, tile_n)
        d = xv - yv
        o_ref[:] = 1.5 * jnp.exp(-0.5 * d * d)

    def km(x):
        n = x.shape[0]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, n), DT),
            interpret=jax.default_backend() != "tpu",
            grid=(n // tile_m, n // tile_n),
            in_specs=[
                pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=3 * n * n,
                bytes_accessed=n * n * 4,
                transcendentals=n * n,
            ),
        )(x[:, None], x[None, :])

    @jax.jit
    def run(i):
        xx = x_host + i * 1e-7
        K = km(xx)
        return jnp.vdot(K, K)

    return run


def main():
    sel = set(sys.argv[1:])

    def want(name):
        return not sel or name in sel

    log(f"device: {jax.devices()[0]}  N={N}")
    trK = N * (1.5 + 0.1)

    from stheno_tpu.ops import blocked_cholesky as bc

    results = {}
    if want("null"):
        # fixed relay/dispatch/host-pull overhead: a trivial jitted scalar.
        # Subtract this from the other rows to estimate pure device time.
        @jax.jit
        def null_fn(i):
            return jnp.sum(x_host[:8]) + i * 1e-7

        results["null"] = timed("null", null_fn)
    if want("chol_lax"):
        results["chol_lax"] = timed(
            "chol_lax", make_chol_probe(lax.linalg.cholesky), check=trK)
    if want("chol_cur"):
        bc.set_gemm_precision("highest")
        results["chol_cur"] = timed(
            "chol_cur",
            make_chol_probe(lambda K: bc._blocked_cholesky_impl(K, 2048, 256)),
            check=trK)
    if want("chol_high"):
        bc.set_gemm_precision("high")
        results["chol_high"] = timed(
            "chol_high",
            make_chol_probe(lambda K: bc._blocked_cholesky_impl(K, 2048, 256)),
            check=trK)
        bc.set_gemm_precision("highest")
    if want("chol_grad"):
        # fwd + custom-VJP backward through the library blocked_cholesky.
        # scalar = Σ L² (so L̄ = 2L — no huge weight constant in the graph,
        # which the compile relay rejects with HTTP 413); the backward still
        # runs the full recursive blocked reverse rule.
        @jax.jit
        def grad_probe(i):
            xx = x_host + i * 1e-7
            K = km_se(xx) + 0.1 * jnp.eye(N, dtype=DT)

            def f(Km):
                from stheno_tpu.ops.blocked_cholesky import blocked_cholesky

                L = blocked_cholesky(Km, 2048, 256)
                return jnp.vdot(L, L)

            v, g = jax.value_and_grad(f)(K)
            return v + jnp.vdot(g, g) * 1e-12

        results["chol_grad"] = timed("chol_grad", grad_probe)

    _bwd_defaults = bc.set_bwd_params()  # read without changing

    def make_grad_probe(block, bwd_base, via_inv, mode="rec", bwd_block=1024,
                        bwd_prec=None):
        # library-default forward (block, 256) + tuned backward knobs; the
        # knobs are trace-time state, so set them before (re)tracing.
        bc.set_bwd_params(base=bwd_base, via_inv=via_inv, mode=mode,
                          block=bwd_block)
        bc.set_bwd_precision(bwd_prec)

        @jax.jit
        def grad_probe(i):
            xx = x_host + i * 1e-7
            K = km_se(xx) + 0.1 * jnp.eye(N, dtype=DT)

            def f(Km):
                L = bc.blocked_cholesky(Km, block, 256)
                return jnp.vdot(L, L)

            v, g = jax.value_and_grad(f)(K)
            return v + jnp.vdot(g, g) * 1e-12

        return grad_probe

    # backward-pass A/B: algorithm (rec 2-way split ~2n³/3 MACs vs iter
    # symmetric panel sweep n³/3), recursion cutoff, TRSM-vs-inverse strategy
    for name, blk, bb, vi, mode, bblk in [
        ("chol_grad_rec", 1024, 256, True, "rec", 1024),   # round-1 bench path
        ("chol_gradb512", 1024, 512, True, "rec", 1024),
        ("chol_gradb1024", 1024, 1024, True, "rec", 1024),
        ("chol_grad_noinv", 1024, 256, False, "rec", 1024),
        ("chol_grad_iter1024", 1024, 256, True, "iter", 1024),
        ("chol_grad_iter2048", 1024, 256, True, "iter", 2048),
        ("chol_grad_iter512", 1024, 256, True, "iter", 512),
        ("chol_grad_iter4096", 1024, 256, True, "iter", 4096),
        ("chol_grad_iter8192", 1024, 256, True, "iter", 8192),
        ("chol_grad_i4096_bb512", 1024, 512, True, "iter", 4096),
        ("chol_grad_i4096_bb1024", 1024, 1024, True, "iter", 4096),
        ("chol_grad_i4096_noinv", 1024, 256, False, "iter", 4096),
        ("chol_grad_i2048_f2048", 2048, 256, True, "iter", 2048),
        # round-4 fused backward (solve-free panel sweep) ladder
        ("chol_grad_fused512", 1024, 256, True, "fused", 512),
        ("chol_grad_fused1024", 1024, 256, True, "fused", 1024),
        ("chol_grad_fused2048", 1024, 256, True, "fused", 2048),
        ("chol_grad_fused4096", 1024, 256, True, "fused", 4096),
        ("chol_grad_f1024_bb512", 1024, 512, True, "fused", 1024),
    ]:
        if want(name):
            results[name] = timed(name, make_grad_probe(blk, bb, vi, mode, bblk))
            bc.set_bwd_params(*_bwd_defaults)  # restore library defaults
    for name, prec in [("chol_grad_bp_def", "default"),
                       ("chol_grad_bp_high", "high")]:
        if want(name):
            results[name] = timed(
                name,
                make_grad_probe(1024, 256, True, "iter", 4096, bwd_prec=prec),
            )
            bc.set_bwd_params(*_bwd_defaults)
            bc.set_bwd_precision(None)
    for name, fn in [
        # sym-fold A/B (the round-4 fold saved ~14 ms at N=16k; the N=32k
        # stage table says the cholesky_psd forward runs ~2x slower than
        # the raw impl — isolate whether the fold is the cause)
        ("chol_impl_plain",
         lambda K: bc._blocked_cholesky_impl(K, 1024, 256)),
        ("chol_impl_sym",
         lambda K: bc._blocked_cholesky_impl(K, 1024, 256, sym=True)),
        ("chol_psd_path", None),  # filled below (needs ops.chol import)
    ]:
        if want(name):
            if name == "chol_psd_path":
                from stheno_tpu.ops import chol as _C

                fn = lambda K: _C.cholesky_psd(K)
            results[name] = timed(name, make_chol_probe(fn), check=trK)
    for blk in (1024, 4096):
        if want(f"chol_b{blk}"):
            results[f"chol_b{blk}"] = timed(
                f"chol_b{blk}",
                make_chol_probe(
                    lambda K, b=blk: bc._blocked_cholesky_impl(K, b, 256)),
                check=trK)
    # forward base-case ladder: larger bases shorten the serial diagonal
    # chain (the forward's ~65%-of-calibrated-peak gap, round 4).  Library
    # precision (HIGH), set explicitly — earlier variants may have left
    # HIGHEST behind.  WARNING: base=1024 measured 3 ms faster but is an
    # ACCURACY regression (negative result #5, BASELINE.md) — XLA's TPU
    # cholesky runs internal matmuls at low precision; run `accuracy`
    # before shipping any base change.
    for blk, base in [(1024, 256), (1024, 512), (1024, 1024), (2048, 512),
                      (2048, 1024)]:
        name = f"chol_f{blk}_b{base}"
        if want(name):
            bc.set_gemm_precision("high")
            results[name] = timed(
                name,
                make_chol_probe(
                    lambda K, b=blk, ba=base: bc._blocked_cholesky_impl(
                        K, b, ba)),
                check=trK)
    if want("chol_btri"):
        bc.set_gemm_precision("highest")
        results["chol_btri"] = timed(
            "chol_btri", make_chol_probe(blocked_chol_btri), check=trK)
    if want("chol_high_btri"):
        bc.set_gemm_precision("high")
        results["chol_high_btri"] = timed(
            "chol_high_btri", make_chol_probe(blocked_chol_btri), check=trK)
        bc.set_gemm_precision("highest")
    if want("chol_pal_base"):
        # HIGH + blocked-tri-inv forward, with the Pallas in-VMEM base-case
        # factoriser instead of lax.linalg.cholesky — tests the hypothesis
        # that the 64 serially-dependent base factorisations are the
        # latency bottleneck of the forward pass.
        from stheno_tpu.experimental.pallas.chol_block import chol_block_auto

        bc.set_gemm_precision("high")
        prev = bc.set_base_cholesky(chol_block_auto)
        results["chol_pal_base"] = timed(
            "chol_pal_base", make_chol_probe(blocked_chol_btri), check=trK)
        bc.set_base_cholesky(prev)
        bc.set_gemm_precision("highest")
    if want("chol_pal_all"):
        # Pallas base factoriser AND Pallas base triangular inverse.
        from stheno_tpu.experimental.pallas.chol_block import (
            chol_block_auto, tri_inv_block_auto)

        bc.set_gemm_precision("high")
        p1 = bc.set_base_cholesky(chol_block_auto)
        p2 = bc.set_base_tri_inv(tri_inv_block_auto)
        results["chol_pal_all"] = timed(
            "chol_pal_all", make_chol_probe(blocked_chol_btri), check=trK)
        bc.set_base_cholesky(p1)
        bc.set_base_tri_inv(p2)
        bc.set_gemm_precision("highest")
    if want("base_chain"):
        # critical-path latency of 64 serially-dependent 256-block
        # factorisations — lax vs pallas, no big GEMMs involved.
        from stheno_tpu.experimental.pallas.chol_block import chol_block_auto

        def make_chain(fn):
            @jax.jit
            def run(i):
                A = km_se(x_host[:256]) + (
                    256.0 + i * 1e-5) * jnp.eye(256, dtype=DT)
                acc = jnp.float32(0.0)
                for _ in range(64):
                    L = fn(A + acc * 1e-12)  # serial dependence
                    acc = acc + jnp.vdot(L, L)
                return acc

            return run

        results["base_chain_lax"] = timed(
            "base_chain_lax", make_chain(lax.linalg.cholesky))
        results["base_chain_pal"] = timed(
            "base_chain_pal", make_chain(chol_block_auto))
    if want("trsm"):
        # single-RHS triangular solve at N: XLA's sequential TRSM vs the
        # blocked substitution (the logpdf alpha-solve + its VJP path).
        from stheno_tpu.ops.blocked_cholesky import (
            blocked_solve_lower, blocked_solve_upper_T)

        @jax.jit
        def make_L():
            K = km_se(x_host) + 0.1 * jnp.eye(N, dtype=DT)
            return bc._blocked_cholesky_impl(K, 1024, 256)

        L_dev = make_L()
        y_dev = jnp.sin(x_host)

        def solve_probe(solver):
            @jax.jit
            def run(i):
                yy = y_dev + i * 1e-7
                x1 = solver(L_dev, yy)
                return jnp.vdot(x1, x1)

            return run

        results["trsm_lax"] = timed(
            "trsm_lax",
            solve_probe(lambda L, b: lax.linalg.triangular_solve(
                L, b[:, None], left_side=True, lower=True)[:, 0]))
        results["trsm_blocked"] = timed(
            "trsm_blocked",
            solve_probe(lambda L, b: blocked_solve_lower(L, b, block=1024)))
        # solve + VJP (the full logpdf quadratic-term chain)
        def grad_solve_probe(solver):
            @jax.jit
            def run(i):
                yy = y_dev + i * 1e-7

                def q(L):
                    a = solver(L, yy)
                    return jnp.vdot(a, a)

                v, g = jax.value_and_grad(q)(L_dev)
                return v + jnp.vdot(g, g) * 1e-12

            return run

        results["trsm_lax_grad"] = timed(
            "trsm_lax_grad",
            grad_solve_probe(lambda L, b: lax.linalg.triangular_solve(
                L, b[:, None], left_side=True, lower=True)[:, 0]))
        results["trsm_blocked_grad"] = timed(
            "trsm_blocked_grad",
            grad_solve_probe(
                lambda L, b: blocked_solve_lower(L, b, block=1024)))
    if want("bench_kgrad") or want("bench_hgrad") or want("logpdf_fwd"):
        # decompose the full bench.py pipeline (composite f3 = f1 + f2,
        # SE + Matern32, logpdf+grad):
        #   logpdf_fwd   — forward only (km + assembly + chol + solve)
        #   bench_kgrad  — value_and_grad stopping at the assembled K
        #                  (adds: solve-adjoint + chol backward)
        #   bench_hgrad  — value_and_grad w.r.t. the 4 hyperparameters
        #                  (adds: kernel-matrix backward passes) ≈ bench.py
        from stheno_tpu.ops import chol as C

        y_b = jnp.sin(x_host) + jnp.asarray(0.2, DT) * jnp.cos(7 * x_host)

        def km_m32(x, l=0.5):
            d = jnp.abs(x[:, None] - x[None, :]) / l
            d3 = jnp.sqrt(jnp.asarray(3.0, DT)) * d
            return (1.0 + d3) * jnp.exp(-d3)

        def assemble(x, v1, l1, l2, noise):
            d = x[:, None] - x[None, :]
            K1 = v1 * jnp.exp(-0.5 * (d / l1) ** 2)
            return K1 + km_m32(x, l2) + noise * jnp.eye(N, dtype=DT)

        def logpdf_of(K):
            L = C.cholesky_psd(K)
            return C.mvn_logpdf_chol(y_b, jnp.zeros_like(y_b), L)

        if want("logpdf_fwd"):
            @jax.jit
            def fwd_run(i):
                xx = x_host + i * 1e-7
                return logpdf_of(assemble(xx, 1.5, 1.0, 0.5, 0.1))

            results["logpdf_fwd"] = timed("logpdf_fwd", fwd_run)
        if want("bench_kgrad"):
            @jax.jit
            def kgrad_run(i):
                xx = x_host + i * 1e-7
                K = assemble(xx, 1.5, 1.0, 0.5, 0.1)
                v, g = jax.value_and_grad(logpdf_of)(K)
                return v + jnp.vdot(g, g) * 1e-12

            results["bench_kgrad"] = timed("bench_kgrad", kgrad_run)
        if want("bench_hgrad"):
            @jax.jit
            def hgrad_run(i):
                xx = x_host + i * 1e-7

                def f(th):
                    return logpdf_of(assemble(xx, *th))

                v, g = jax.value_and_grad(f)((
                    jnp.asarray(1.5, DT), jnp.asarray(1.0, DT),
                    jnp.asarray(0.5, DT), jnp.asarray(0.1, DT)))
                return v + g[1] * 1e-9

            results["bench_hgrad"] = timed("bench_hgrad", hgrad_run)
    if want("accuracy"):
        # f32 logpdf+grad accuracy vs an f64 CPU oracle at N=4096 for the
        # current library defaults — the check that caught the base=1024
        # regression (XLA's TPU cholesky uses low-precision internal
        # matmuls; at 1024-blocks that cost 6× logpdf accuracy and wrecked
        # NUTS adaptation — BASELINE.md round-4 negative result #5).
        from stheno_tpu.ops import chol as C

        Na = 4096
        xa = jnp.linspace(-5.0, 5.0, Na)
        ya = jnp.sin(xa) + 0.2 * jnp.cos(7 * xa)

        def lp(theta, dtype):
            x = xa.astype(dtype)
            y = ya.astype(dtype)
            v, l, noise = (jnp.asarray(t, dtype) for t in theta)
            d = (x[:, None] - x[None, :]) / l
            K = v * jnp.exp(-0.5 * d * d) + noise * jnp.eye(Na, dtype=dtype)
            return C.mvn_logpdf_chol(y, jnp.zeros_like(y), C.cholesky_psd(K))

        import numpy as _np

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            jax.config.update("jax_enable_x64", True)
            v_ref, g_ref = jax.jit(jax.value_and_grad(
                lambda t: lp(t, jnp.float64)))((1.5, 1.0, 0.1))
            v_ref = float(v_ref)
            g_ref = [float(g) for g in g_ref]
        v32, g32 = jax.jit(jax.value_and_grad(
            lambda t: lp(t, jnp.float32)))((1.5, 1.0, 0.1))
        verr = abs(float(v32) - v_ref)
        gerr = max(abs((float(a) - b) / (abs(b) + 1e-12))
                   for a, b in zip(g32, g_ref))
        log(f"accuracy N=4096: |logpdf err| {verr:.3g} (round-4 baseline "
            f"~2.0; base=1024 regression measured 13.5), max grad rel err "
            f"{gerr:.3g}")
        results["accuracy_logpdf_abs_err"] = verr
    if want("gemm_peak"):
        # Calibration: achieved rate of ONE plain square GEMM at each
        # precision — the real "peak" all efficiency claims divide by.
        for nm, prec, n in [
            ("gemm_high_8k", lax.Precision.HIGH, 8192),
            ("gemm_high_16k", lax.Precision.HIGH, 16384),
            ("gemm_highest_8k", lax.Precision.HIGHEST, 8192),
            ("gemm_bf16_8k", lax.Precision.DEFAULT, 8192),
        ]:
            def make(prec=prec, n=n):
                @jax.jit
                def run(i):
                    # real materialised n×n operands (no broadcast shortcut)
                    r = jax.lax.broadcasted_iota(DT, (n, n), 0)
                    c = jax.lax.broadcasted_iota(DT, (n, n), 1)
                    a = jnp.sin(r * 0.001 + c * 0.002 + i * 1e-6)
                    b = jnp.cos(r * 0.002 - c * 0.001)
                    # barrier: keep operand generation OUT of the matmul
                    # fusion (else the producers re-run per MXU tile visit)
                    a, b = lax.optimization_barrier((a, b))
                    C = jnp.matmul(a, b, precision=prec)
                    return jnp.sum(C)

                return run

            ms = timed(nm, make())
            macs = n**3
            log(f"{nm:16s} {macs/ (ms/1e3) / 1e12:8.1f} e12 MAC/s raw "
                f"({macs/((ms-26)/1e3)/1e12:7.1f} dev-est)")
            results[nm] = ms
    if want("fwd_floor"):
        # Forward-gap decomposition (VERDICT r5 item 1): the blocked forward
        # runs at ~65% of the calibrated 31-32e12 MAC/s peak (~14 ms above
        # its MAC bound at N=16k).  Is the missing time (i) skewed-shape
        # GEMM inefficiency, (ii) the serial per-panel diagonal-factor +
        # tri-inv chain, or (iii) stitching/slice overhead?  Measure (i) and
        # (ii) in isolation, same window, and subtract.
        from stheno_tpu.ops.blocked_cholesky import (
            _blocked_cholesky_impl,
            blocked_tri_inv_lower,
        )

        B = 1024
        nb = N // B
        prec = lax.Precision.HIGH

        def _op(shape, seed):
            r = jax.lax.broadcasted_iota(DT, shape, 0)
            c = jax.lax.broadcasted_iota(DT, shape, 1)
            return jnp.sin(r * 0.001 + c * 0.002 + seed)

        # (i) exact GEMM-shape replay: the left-looking panel updates
        # (n-c, c)@(c, B) and the TRSM-apply (n-c-B, B)@(B, B) GEMMs of the
        # B=1024 forward, as a chain of barrier-fenced matmuls.
        macs = 0
        for kb in range(nb):
            c0 = kb * B
            if kb > 0:
                macs += (N - c0) * c0 * B
            if N - c0 > B:
                macs += (N - c0 - B) * B * B

        @jax.jit
        def gemm_shapes(i):
            acc = jnp.asarray(0.0, DT)
            for kb in range(nb):
                c0 = kb * B
                if kb > 0:
                    a = _op((N - c0, c0), i * 1e-6)
                    b = _op((B, c0), 0.5)
                    a, b = lax.optimization_barrier((a, b))
                    Pn = jnp.matmul(a, b.T, precision=prec)
                    acc = acc + jnp.vdot(Pn, Pn) * 1e-12
                if N - c0 > B:
                    a = _op((N - c0 - B, B), i * 1e-6 + 1.0)
                    b = _op((B, B), 0.25)
                    a, b = lax.optimization_barrier((a, b))
                    Tn = jnp.matmul(a, b, precision=prec)
                    acc = acc + jnp.vdot(Tn, Tn) * 1e-12
            return acc

        # (ii) serial diagonal chain: nb dependent (recursive B-block factor
        # + blocked tri-inv) steps — the forward's critical-path
        # small-matrix work without the N-tall GEMMs.
        K1 = km_se(x_host[:B]) + 0.1 * jnp.eye(B, dtype=DT)

        @jax.jit
        def diag_chain(i):
            def step(k, carry):
                A, acc = carry
                L = _blocked_cholesky_impl(A, block=max(256, B // 4),
                                           base=256)
                Mi = blocked_tri_inv_lower(L, base=256)
                s = jnp.vdot(L, L) + jnp.vdot(Mi, Mi) * 1e-9
                A = K1 + (i * 1e-7 + s * 1e-20) * jnp.eye(B, dtype=DT)
                return A, acc + s

            _, acc = lax.fori_loop(
                0, nb, step, (K1, jnp.asarray(0.0, DT)))
            return acc

        # (ii') same chain with one whole-panel lax call (the accuracy-
        # regressing round-4 variant) — bounds how much of (ii) is our
        # recursive structure vs inherent small-factorisation latency.
        @jax.jit
        def diag_chain_lax(i):
            def step(k, carry):
                A, acc = carry
                L = lax.linalg.cholesky(A)
                Mi = blocked_tri_inv_lower(L, base=256)
                s = jnp.vdot(L, L) + jnp.vdot(Mi, Mi) * 1e-9
                A = K1 + (i * 1e-7 + s * 1e-20) * jnp.eye(B, dtype=DT)
                return A, acc + s

            _, acc = lax.fori_loop(
                0, nb, step, (K1, jnp.asarray(0.0, DT)))
            return acc

        # the forward itself, same window (B=1024/base=256 library default)
        from stheno_tpu.ops.blocked_cholesky import blocked_cholesky

        @jax.jit
        def fwd_now(i):
            xx = x_host + i * 1e-7
            K = km_se(xx) + 0.1 * jnp.eye(N, dtype=DT)
            L = blocked_cholesky(K, block=B, base=256)
            return jnp.vdot(L, L)

        results["fwd_now"] = timed("fwd_now", fwd_now)
        results["gemm_shapes"] = timed("gemm_shapes", gemm_shapes)
        results["diag_chain"] = timed("diag_chain", diag_chain)
        results["diag_chain_lax"] = timed("diag_chain_lax", diag_chain_lax)
        log(f"fwd_floor arithmetic (raw ms; subtract the null in-window):")
        log(f"  GEMM-shape MACs {macs:.3e} -> perfect "
            f"{macs / 31e12 * 1e3:.1f} ms at 31e12 MAC/s")
        log(f"  fwd - shapes - chain = "
            f"{results['fwd_now'] - results['gemm_shapes'] - results['diag_chain']:.1f} ms residual (+2 nulls)")
    if want("dist_p1"):
        # VERDICT r5 item 3: every multi-device artifact so far ran on the
        # virtual CPU mesh, and round 4 proved backend-specific failure
        # modes are real (the fused backward compiles in 0.85 GB on CPU
        # and OOMs at 42 GB on XLA:TPU).  This variant executes the
        # distributed (shard_map) factorisation + logpdf on a ONE-DEVICE
        # 'rows' mesh on the actual backend — the only multi-chip-code
        # validation a single-chip environment permits — A/B'd against the
        # single-chip blocked path in the same window.
        import numpy as _np
        from jax.sharding import Mesh

        from stheno_tpu.ops import chol as C
        from stheno_tpu.parallel.cholesky import (
            distributed_cholesky_auto,
            distributed_mvn_logpdf,
        )

        mesh = Mesh(_np.asarray(jax.devices()[:1]), ("rows",))
        y_obs = jnp.sin(x_host)

        def K_of(i):
            xx = x_host + i * 1e-7
            return km_se(xx) + 0.1 * jnp.eye(N, dtype=DT)

        @jax.jit
        def single_run(i):
            K = K_of(i)
            return C.mvn_logpdf_chol(
                y_obs, jnp.zeros_like(y_obs), C.cholesky_psd(K))

        @jax.jit
        def dist_run(i):
            K = K_of(i)
            return distributed_mvn_logpdf(
                mesh, K, jnp.zeros_like(y_obs), y_obs, block_size=1024)

        @jax.jit
        def dist_chol_run(i):
            L = distributed_cholesky_auto(mesh, K_of(i), block_size=1024)
            return jnp.vdot(L, L)

        results["logpdf_single"] = timed("logpdf_single", single_run)
        results["logpdf_dist_p1"] = timed("logpdf_dist_p1", dist_run)
        results["chol_dist_p1"] = timed("chol_dist_p1", dist_chol_run)
        v_s, v_d = float(single_run(99)), float(dist_run(99))
        log(f"dist_p1 value check: single {v_s:.6g} vs distributed "
            f"{v_d:.6g} (|diff| {abs(v_s - v_d):.3g})")
    if want("ring_p1"):
        # Companion to dist_p1 (VERDICT r5 item 3): the OTHER distributed
        # family — the matrix-free ppermute ring (CG solve + SLQ logdet +
        # Hutchinson custom-VJP gradient, parallel/ring.py) — has also never
        # executed on XLA:TPU.  Run forward AND gradient on a ONE-DEVICE
        # 'rows' mesh on the real backend; value-check the forward against
        # the dense blocked-Cholesky logpdf and the (exact, non-stochastic)
        # y-gradient against −K̂⁻¹y in the same window.  noise=1.0 keeps the
        # SE system's condition number within f32-CG reach at this N.
        import numpy as _np
        from jax.sharding import Mesh

        import stheno_tpu as st
        from stheno_tpu.ops import chol as C
        from stheno_tpu.parallel.ring import ring_gp_logpdf

        mesh = Mesh(_np.asarray(jax.devices()[:1]), ("rows",))
        kern = 1.5 * st.with_lengthscale(st.SEKernel(), 1.0)
        y_obs = jnp.sin(x_host)
        key0 = jax.random.PRNGKey(7)
        RING = dict(num_probes=8, lanczos_iters=20, tol=1e-6, maxiter=400)

        @jax.jit
        def ring_fwd(i):
            return ring_gp_logpdf(
                mesh, kern, x_host + i * 1e-7, y_obs, 1.0, key0, **RING)

        @jax.jit
        def ring_ygrad(i):
            return jnp.sum(jax.grad(
                lambda yy: ring_gp_logpdf(
                    mesh, kern, x_host + i * 1e-7, yy, 1.0, key0, **RING)
            )(y_obs) * y_obs)

        @jax.jit
        def dense_ref(i):
            K = km_se(x_host + i * 1e-7) + 1.0 * jnp.eye(N, dtype=DT)
            L = C.cholesky_psd(K)
            alpha = C.chol_solve(L, y_obs)
            lp = C.mvn_logpdf_chol(y_obs, jnp.zeros_like(y_obs), L)
            return lp, -jnp.sum(alpha * y_obs)

        results["ring_p1_fwd"] = timed("ring_p1_fwd", ring_fwd)
        results["ring_p1_ygrad"] = timed("ring_p1_ygrad", ring_ygrad)
        v_r, g_r = float(ring_fwd(99)), float(ring_ygrad(99))
        v_d, g_d = (float(t) for t in dense_ref(99))
        log(f"ring_p1 value check: ring {v_r:.6g} vs dense {v_d:.6g} "
            f"(rel {abs(v_r - v_d) / max(abs(v_d), 1e-9):.3g}); "
            f"ygrad ring {g_r:.6g} vs dense {g_d:.6g} "
            f"(rel {abs(g_r - g_d) / max(abs(g_d), 1e-9):.3g})")
    if want("markov_1m"):
        # State-space Markov-GP throughput: exact logpdf (+hyperparameter
        # grad) at N=1e6 via the parallel Kalman filter — the O(log N)-depth
        # associative-scan formulation (markov.py).  A dense path at this N
        # would be 3.3e17 FLOPs; this is ~O(N) small-matrix work, i.e. a
        # bandwidth/latency row, not an MXU row.
        import numpy as _np

        import stheno_tpu as st
        from stheno_tpu.markov import markov_gp_logpdf

        NM = int(os.environ.get("PROBE_MARKOV_N", 1_000_000))
        rngm = _np.random.default_rng(0)
        xm_np = _np.sort(rngm.uniform(0.0, 4000.0, NM))
        xm = jnp.asarray(xm_np, DT)
        ym = jnp.asarray(
            _np.sin(0.3 * xm_np) + 0.3 * rngm.standard_normal(NM), DT)

        def k_of(lv):
            return lv[0] * st.with_lengthscale(st.Matern32Kernel(), lv[1])

        lv0 = jnp.asarray([1.2, 5.0], DT)

        @jax.jit
        def mk_fwd(i):
            return markov_gp_logpdf(k_of(lv0 + i * 1e-7), xm, ym, 0.1,
                                    dtype=DT)

        @jax.jit
        def mk_grad(i):
            val, g = jax.value_and_grad(
                lambda lv: markov_gp_logpdf(k_of(lv), xm, ym, 0.1, dtype=DT)
            )(lv0 + i * 1e-7)
            return val + jnp.sum(g)

        results[f"markov_fwd_{NM}"] = timed(f"markov_fwd_{NM}", mk_fwd)
        results[f"markov_grad_{NM}"] = timed(f"markov_grad_{NM}", mk_grad)
    if want("km_xla"):
        results["km_xla"] = timed("km_xla", make_km_xla())
    if want("km_pal"):
        for tm, tn in [(256, 2048), (512, 1024)]:
            results[f"km_pal_{tm}x{tn}"] = timed(
                f"km_pal_{tm}x{tn}", make_km_pallas(tm, tn))

    log("---- summary (ms) ----")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"{k:20s} {v:9.2f}")


if __name__ == "__main__":
    main()
