"""Benchmark driver: the north-star hot loop — logpdf + hyperparameter
gradient of a composite GPPP at N=16k, f32, single chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": <ms>, "unit": "ms", "vs_baseline": <x>, ...}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speed-of-light ratio: SOL_ms / measured_ms, where SOL counts the minimum
FLOPs of the factorisation+gradient pipeline at the chip's peak f32 rate
(1.0 == running at the hardware roofline; higher is better).

Health telemetry (VERDICT r2 item 1): the TPU relay's throughput degrades
transiently by >10x on identical compiled graphs and its fixed per-call
overhead drifts (healthy ≈ 26-28 ms null probe).  A bare number is
uninterpretable, so the same JSON line carries:

- ``null_before_ms`` / ``null_after_ms`` — the fixed relay/dispatch/host-pull
  overhead, measured immediately around the main measurement;
- ``stages`` — probe-level decomposition (kernel matrices / Cholesky forward
  / +backward / full logpdf forward), same host-pull methodology;
- ``relay_healthy`` — verdict: both null probes under ``NULL_HEALTHY_MS``
  and mutually consistent; when false, `value` reflects the tunnel, not the
  hardware;
- ``device_ms`` / ``vs_sol_device`` — overhead-subtracted estimate (the
  fixed null overhead is not device time; VERDICT r2 weak-item 7).

Set BENCH_STAGES=0 to skip the stage probes (4 extra N=16k compiles; cached
compiles make reruns cheap).  Extra diagnostics go to stderr; stdout carries
only the JSON line.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the N=16k grad graph takes minutes to
# compile cold; cache hits bring reruns down to seconds.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


_p = argparse.ArgumentParser(description=__doc__)
_p.add_argument(
    "--n", type=int, default=int(os.environ.get("BENCH_N", 16384)),
    help="problem size (default 16384; --n 32768 is the single-chip "
    "scaling row — same pipeline, telemetry and methodology, metric name "
    "carries the size)",
)
_ARGS, _ = _p.parse_known_args()
N = _ARGS.n  # env BENCH_N also honoured (CPU smoke)
DTYPE = jnp.float32
# per-chip peak f32 FLOP/s (TPU v5e ≈ 197 TFLOP/s bf16 → ~49 TF/s f32;
# conservative single-chip figure used only to normalise vs_baseline)
PEAK_F32 = 49e12
NULL_HEALTHY_MS = 40.0  # healthy null probe ≈ 26-28 ms; >40 = degraded relay


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timed(fn, reps, label):
    t0 = time.time()
    v0 = float(fn(0))
    _log(f"{label:12s} compile+first {time.time()-t0:7.1f}s  scalar={v0:.6g}")
    t0 = time.time()
    for i in range(1, reps + 1):
        float(fn(i))
    ms = (time.time() - t0) / reps * 1e3
    _log(f"{label:12s} steady {ms:9.2f} ms")
    return ms


def main():
    import stheno_tpu as st
    from stheno_tpu import GPPPInput, gppp, logpdf

    dev = jax.devices()[0]
    _log(f"bench device: {dev}")

    @gppp
    def build(p):
        f1 = st.GP(p["v1"] * st.with_lengthscale(st.SEKernel(), p["l1"]))
        f2 = st.GP(st.with_lengthscale(st.Matern32Kernel(), p["l2"]))
        return dict(f1=f1, f2=f2, f3=f1 + f2)

    x = jnp.linspace(-5.0, 5.0, N, dtype=DTYPE)
    y = jnp.sin(x) + jnp.asarray(0.2, DTYPE) * jnp.cos(7 * x)
    theta = dict(
        v1=jnp.asarray(1.5, DTYPE),
        l1=jnp.asarray(1.0, DTYPE),
        l2=jnp.asarray(0.5, DTYPE),
        noise=jnp.asarray(0.1, DTYPE),
    )

    # ---- probes --------------------------------------------------------
    @jax.jit
    def null_fn(i):
        # fixed relay/dispatch/host-pull overhead: trivial jitted scalar
        return jnp.sum(x[:8]) + i * 1e-7

    def nlml_at(tt, xx):
        f = build(tt)
        return -logpdf(f(GPPPInput("f3", xx), tt["noise"]), y)

    @jax.jit
    def step(theta, i):
        # perturb one hyperparameter per call: defeats any value-level
        # result caching in the runtime without changing the program
        t = dict(theta)
        t["l1"] = theta["l1"] + i * 1e-7
        v, g = jax.value_and_grad(lambda tt: nlml_at(tt, x))(t)
        # scalar that depends on value AND gradient — host-pulling it forces
        # the whole computation (block_until_ready is unreliable on relayed
        # backends)
        return v + g["l1"] * 1e-9

    # stage probes: the bench pipeline cut at increasing depth, same
    # composite covariance (SE + Matern32 + noise) and methodology
    from stheno_tpu.ops import chol as C

    def assemble(xx, tt):
        f = build(tt)
        fx = f(GPPPInput("f3", xx), tt["noise"])
        return fx.cov()

    @jax.jit
    def km_fn(i):
        K = assemble(x + i * 1e-7, theta)
        # full-matrix reduction: anything less (e.g. two rows) lets XLA DCE
        # slice the kernel-matrix computation away (BASELINE.md methodology)
        return jnp.vdot(K, K)

    @jax.jit
    def cholf_fn(i):
        K = assemble(x + i * 1e-7, theta)
        L = C.cholesky_psd(K)
        return jnp.vdot(L, L)  # tr(K): forcing scalar + correctness invariant

    @jax.jit
    def cholg_fn(i):
        K = assemble(x + i * 1e-7, theta)

        def f(Km):
            L = C.cholesky_psd(Km)
            return jnp.vdot(L, L)

        v, g = jax.value_and_grad(f)(K)
        return v + jnp.vdot(g, g) * 1e-12

    @jax.jit
    def fwd_fn(i):
        K = assemble(x + i * 1e-7, theta)
        L = C.cholesky_psd(K)
        return C.mvn_logpdf_chol(y, jnp.zeros_like(y), L)

    # ---- measure -------------------------------------------------------
    null_before = _timed(null_fn, 6, "null(before)")

    stages = {}
    if os.environ.get("BENCH_STAGES", "1") != "0":
        stages["km_ms"] = round(_timed(km_fn, 3, "km"), 2)
        stages["chol_fwd_ms"] = round(_timed(cholf_fn, 3, "chol_fwd"), 2)
        stages["chol_grad_ms"] = round(_timed(cholg_fn, 3, "chol_grad"), 2)
        stages["logpdf_fwd_ms"] = round(_timed(fwd_fn, 3, "logpdf_fwd"), 2)

    t0 = time.time()
    v0 = float(step(theta, 0))
    _log(f"main compile+first: {time.time() - t0:.1f}s nlml={v0:.2f}")

    # roofline context on stderr (XLA cost model of the compiled graph);
    # NOTE: the byte count is the cost model's (it over-charges blocked
    # slicing — utils/cost.py), shown for structure comparison only
    try:
        from stheno_tpu.utils.cost import cost_summary

        cost_summary(step, theta, 0, peak_flops=PEAK_F32, hbm_bw=819e9,
                     name="logpdf+grad-16k")
    except Exception as e:  # pragma: no cover - diagnostics only
        _log(f"[cost] unavailable: {e}")

    # steady state: per-iteration host-pull forcing; MINIMUM over several
    # small batches — the best sustained rate reflects the hardware rather
    # than the tunnel's current health.
    batches, reps = 4, 3
    best = float("inf")
    for b in range(batches):
        t0 = time.time()
        for i in range(1, reps + 1):
            float(step(theta, b * reps + i))
        best = min(best, (time.time() - t0) / reps * 1e3)
    ms = best

    null_after = _timed(null_fn, 6, "null(after)")

    healthy = (
        max(null_before, null_after) <= NULL_HEALTHY_MS
        and max(null_before, null_after)
        <= 1.6 * max(min(null_before, null_after), 1.0)
    )

    # speed-of-light: kernelmatrix (2·2·N²·D ≈ negligible at D=1) +
    # Cholesky N³/3 + gradient ≈ 3 more N³/3-class passes (2 TRSM-level
    # solves + the symmetric rank-update backprop) → 4/3·N³ FLOPs.
    sol_ms = (4.0 / 3.0 * N**3) / PEAK_F32 * 1e3
    overhead = 0.5 * (null_before + null_after)
    device_ms = max(ms - overhead, 1e-3)
    vs = sol_ms / ms
    _log(
        f"steady: {ms:.1f} ms (device ≈ {device_ms:.1f} + overhead "
        f"{overhead:.1f}); SOL {sol_ms:.1f} ms; ratio {vs:.3f} "
        f"(device {sol_ms / device_ms:.3f}); relay_healthy={healthy}"
    )

    metric = (
        "gppp_logpdf_grad_ms_n16k_f32"
        if N == 16384
        else f"gppp_logpdf_grad_ms_n{N}_f32"
    )
    print(json.dumps({
        "metric": metric,
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(vs, 4),
        "null_before_ms": round(null_before, 2),
        "null_after_ms": round(null_after, 2),
        "relay_healthy": healthy,
        "device_ms": round(device_ms, 2),
        "vs_sol_device": round(sol_ms / device_ms, 4),
        "sol_ms": round(sol_ms, 2),
        "stages": stages,
    }))


if __name__ == "__main__":
    main()
