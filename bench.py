"""Benchmark driver: the north-star hot loop — logpdf + hyperparameter
gradient of a composite GPPP at N=16k, f32, single chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": <ms>, "unit": "ms", "vs_baseline": <x>}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speed-of-light ratio: SOL_ms / measured_ms, where SOL counts the minimum
FLOPs of the factorisation+gradient pipeline at the chip's peak f32 rate
(1.0 == running at the hardware roofline; higher is better).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
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


N = 16384
DTYPE = jnp.float32
# per-chip peak f32 FLOP/s (TPU v5e ≈ 197 TFLOP/s bf16 → ~49 TF/s f32;
# conservative single-chip figure used only to normalise vs_baseline)
PEAK_F32 = 49e12


def main():
    import stheno_tpu as st
    from stheno_tpu import GPPPInput, gppp, logpdf

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

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

    @jax.jit
    def step(theta, i):
        # perturb one hyperparameter per call: defeats any value-level
        # result caching in the runtime without changing the program
        t = dict(theta)
        t["l1"] = theta["l1"] + i * 1e-7

        def nlml(tt):
            f = build(tt)
            return -logpdf(f(GPPPInput("f3", x), tt["noise"]), y)

        v, g = jax.value_and_grad(nlml)(t)
        # scalar that depends on value AND gradient — host-pulling it forces
        # the whole computation (block_until_ready is unreliable on relayed
        # backends)
        return v + g["l1"] * 1e-9

    t0 = time.time()
    v0 = float(step(theta, 0))
    print(f"compile+first: {time.time() - t0:.1f}s nlml={v0:.2f}",
          file=sys.stderr)

    # roofline context on stderr (XLA cost model of the compiled graph)
    try:
        from stheno_tpu.utils.cost import cost_summary

        cost_summary(step, theta, 0, peak_flops=PEAK_F32, hbm_bw=819e9,
                     name="logpdf+grad-16k")
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"[cost] unavailable: {e}", file=sys.stderr)

    # steady state: per-iteration host-pull forcing.  The relay's throughput
    # degrades transiently by large factors (measured 291 ms → 3467 ms on an
    # identical compiled graph within one session), so take the MINIMUM over
    # several small batches — the best sustained rate is the number that
    # reflects the hardware rather than the tunnel's current health.
    batches, reps = 4, 3
    best = float("inf")
    for b in range(batches):
        t0 = time.time()
        for i in range(1, reps + 1):
            out = float(step(theta, b * reps + i))
        best = min(best, (time.time() - t0) / reps * 1e3)
    ms = best

    # speed-of-light: kernelmatrix (2·2·N²·D ≈ negligible at D=1) +
    # Cholesky N³/3 + gradient ≈ 3 more N³/3-class passes (2 TRSM-level
    # solves + the symmetric rank-update backprop) → 4/3·N³ FLOPs.
    sol_ms = (4.0 / 3.0 * N**3) / PEAK_F32 * 1e3
    vs = sol_ms / ms
    print(f"steady: {ms:.1f} ms; SOL {sol_ms:.1f} ms; ratio {vs:.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "gppp_logpdf_grad_ms_n16k_f32",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
