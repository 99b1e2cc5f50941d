"""SMC on TPU: evidence accuracy + particle throughput (dev tool).

VERDICT r3 item 9: the third sampler had tests and an example but no
measured TPU row.  Two workloads, host-pull methodology with null probes
(BASELINE.md discipline):

1. `analytic` — linear-Gaussian model whose evidence is closed-form:
       loglike(q) = log N(y0; q, σ² I_d),  prior q ~ N(0, I_d)
       ⇒ log Z = log N(y0; 0, (1+σ²) I_d)
   measures the SMC evidence estimator's error directly (O(1/√P)).
2. `gp` — the model-evidence workload (examples/smc_model_evidence.py) at
   configurable N: 3-hyperparameter GP likelihood, one N³/3 Cholesky per
   particle per leapfrog.  Reports particle-stage updates/s
   (= P · stages / wall; each stage is num_mcmc HMC sweeps of all P).

The whole SMC run is ONE jitted lax.while_loop program; keep
P·N³·stages small enough for the relay's single-execution kill (~15 s
device) — on directly-attached TPUs the same code runs unsegmented.

Usage: python scripts/smc_bench.py [analytic] [gp] [--n 1024] [--p 64]
"""

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*", default=[])
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--p", type=int, default=64)
    ap.add_argument("--p-analytic", type=int, default=4096)
    ap.add_argument("--segment", type=int, default=0,
                    help="gp workload: tempering stages per jitted segment "
                         "(0 = whole run in one lax.while_loop program).  "
                         "The relay kills long single executions, so large-N "
                         "rows need segmenting; per-stage fold_in keys make "
                         "segmented == fused bit-exact (tested).")
    ap.add_argument("--seeds", type=int, default=2,
                    help="gp workload: timed replicate runs (also the "
                         "spread basis for the log-Z run-to-run column)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    want = set(args.which) or {"analytic", "gp"}

    import stheno_tpu as st
    from stheno_tpu import GPPPInput, gppp, logpdf, rand
    from stheno_tpu.inference import run_smc

    DT = jnp.float32
    log(f"device: {jax.devices()[0]}")

    @jax.jit
    def _null(i):
        return jnp.sum(jnp.arange(8.0)) + i * 1e-7

    def null_probe(label):
        float(_null(0))
        t0 = time.time()
        for i in range(1, 7):
            float(_null(i))
        s = (time.time() - t0) / 6
        log(f"null({label}): {s * 1e3:.1f} ms")
        return s

    rows = []

    if "analytic" in want:
        d, sigma2 = 3, 0.5
        y0 = jnp.asarray([0.7, -1.1, 0.4], DT)
        lz_true = float(
            -0.5 * (d * np.log(2 * np.pi * (1 + sigma2))
                    + float(jnp.sum(y0 * y0)) / (1 + sigma2))
        )

        def loglike(q):
            r = q - y0
            return -0.5 * (d * jnp.log(jnp.asarray(2 * np.pi * sigma2, DT))
                           + jnp.sum(r * r) / sigma2)

        def logprior(q):
            return -0.5 * (jnp.sum(q * q)
                           + d * jnp.log(jnp.asarray(2 * np.pi, DT)))

        P_ = args.p_analytic
        init = jax.random.normal(jax.random.PRNGKey(1), (P_, d), DT)

        @jax.jit
        def run(i):
            res = run_smc(
                jax.random.fold_in(jax.random.PRNGKey(5), i), loglike,
                logprior, init, num_mcmc=3, hmc_step_size=0.4,
                hmc_num_steps=8,
            )
            return res.log_evidence, res.num_stages

        nb = null_probe("before")
        t0 = time.time()
        lz, stages = (float(v) for v in run(0))
        log(f"analytic compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        reps = 3
        errs = []
        for i in range(1, reps + 1):
            lz, stages = (float(v) for v in run(i))
            errs.append(lz - lz_true)
        dt_s = (time.time() - t0) / reps
        na = null_probe("after")
        rows.append({
            "metric": "smc_evidence_error_analytic",
            "particles": P_, "d": d,
            "log_z_true": round(lz_true, 4),
            "log_z_err_mean": round(float(np.mean(errs)), 4),
            "log_z_err_abs_max": round(float(np.max(np.abs(errs))), 4),
            "stages": stages, "wall_s": round(dt_s, 3),
            "null_ms": round(5e2 * (nb + na), 1),
        })
        log(f"analytic: logZ err {errs} (truth {lz_true:.3f})")

    if "gp" in want:
        N, P_ = args.n, args.p
        rng = np.random.default_rng(3)
        x = jnp.asarray(np.sort(rng.uniform(-4, 4, N)), DT)

        gpc = st.graph.GPC()
        f_true = st.GP(
            1.5 * st.with_lengthscale(st.SEKernel(), 1.2), gpc=gpc)
        y = rand(jax.random.PRNGKey(0), f_true(x, 0.1))

        @gppp
        def build(p):
            return dict(
                f=st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"])))

        def loglike(q):
            p = dict(v=jnp.exp(q[0]), l=jnp.exp(q[1]), noise=jnp.exp(q[2]))
            f = build(p)
            return logpdf(f(GPPPInput("f", x), p["noise"]), y)

        def logprior(q):
            return -0.5 * (jnp.sum(q * q)
                           + 3 * jnp.log(jnp.asarray(2 * np.pi, DT)))

        init = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (P_, 3), DT)
        kw = dict(num_mcmc=3, hmc_step_size=0.25, hmc_num_steps=8)

        if args.segment > 0:
            from stheno_tpu.inference import (
                smc_finished,
                smc_init,
                smc_result,
                smc_segment,
            )

            MAXS = 50
            init_j = jax.jit(
                lambda: smc_init(loglike, logprior, init, max_stages=MAXS))
            seg_j = jax.jit(
                lambda k, stt: smc_segment(
                    k, loglike, logprior, init, stt, args.segment,
                    max_stages=MAXS, **kw))

            def run(i):
                """Segmented pass; returns (lz, stages, particles, wall,
                seg_times)."""
                key = jax.random.fold_in(jax.random.PRNGKey(5), i)
                t0 = time.time()
                state = init_j()
                float(state.beta)  # host pull forces the init program
                seg_times = []
                while not bool(smc_finished(state, MAXS)):
                    ts = time.time()
                    state = seg_j(key, state)
                    float(jnp.sum(state.particles))  # forces the segment
                    seg_times.append(time.time() - ts)
                    log(f"  seg {len(seg_times)}: {seg_times[-1]:.2f}s "
                        f"beta={float(state.beta):.4f} "
                        f"step={int(state.step)}")
                res = smc_result(state, init)
                return (res.log_evidence, res.num_stages, res.particles,
                        time.time() - t0, seg_times)
        else:
            @jax.jit
            def _run_fused(i):
                res = run_smc(
                    jax.random.fold_in(jax.random.PRNGKey(5), i), loglike,
                    logprior, init, **kw,
                )
                return res.log_evidence, res.num_stages, res.particles

            def run(i):
                t0 = time.time()
                lz, stages, parts = _run_fused(i)
                np.asarray(parts)  # host pull forces the whole run
                return lz, stages, parts, time.time() - t0, []

        nb = null_probe("before")
        t0 = time.time()
        lz, stages, parts, _, _ = run(0)
        log(f"gp compile+first {time.time()-t0:.1f}s "
            f"logZ={float(lz):.2f} stages={int(stages)}")
        lzs, walls, seg_times = [], [], []
        for i in range(1, args.seeds + 1):
            lz, stages, parts, wall, segs = run(i)
            p_host = np.asarray(parts)
            lzs.append(float(lz))
            walls.append(wall)
            seg_times += segs
        dt_s = float(np.mean(walls))
        na = null_probe("after")
        med = np.exp(np.median(p_host, axis=0))
        stages = int(stages)
        row = {
            "metric": f"smc_gp_evidence_N{N}",
            "n": N, "particles": P_, "stages": stages,
            "num_mcmc": 3, "hmc_steps": 8,
            "wall_s": round(dt_s, 2),
            "particle_stage_updates_per_s": round(P_ * stages / dt_s, 1),
            "loglike_evals_per_s": round(
                P_ * stages * (1 + 3 * 8) / dt_s, 1),
            "log_z": round(float(lzs[-1]), 2),
            "log_z_seed_spread": round(float(np.ptp(lzs)), 3),
            "posterior_medians_v_l_noise": [round(float(v), 3) for v in med],
            "null_ms": round(5e2 * (nb + na), 1),
        }
        if args.segment > 0:
            row["segment_stages"] = args.segment
            row["seg_s_median"] = round(float(np.median(seg_times)), 2)
        rows.append(row)
        log(f"gp: medians v={med[0]:.2f} l={med[1]:.2f} noise={med[2]:.3f} "
            f"(truth 1.5, 1.2, 0.1)")

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
