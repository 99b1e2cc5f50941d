"""NUTS ESS/s per chip at configurable likelihood cost (dev tool, not a test).

VERDICT round-1 item 6: the round-1 north-star 2311 ESS/s used a toy N=256
likelihood; this measures the same getting_started-style 3-hyperparameter
posterior with an N=2048 / N=4096 exact-GP likelihood per chain, where each
leapfrog step pays an O(N³/3) Cholesky.

Timing uses the host-pull methodology (BASELINE.md): the whole run
(warmup + sampling, all chains vmapped) is ONE jitted function of the PRNG
key; the measured call ends in `np.asarray(samples)` (the full device→host
pull), and the steady measurement re-runs with a fresh key so nothing is
cached.  ESS is computed host-side with the library's Geyer/Stan estimator.

Usage:  python scripts/nuts_bench.py [--n 2048] [--chains 16]
                                     [--warmup 300] [--samples 500]
Prints one JSON line on stdout; progress on stderr.
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
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--segment", type=int, default=0,
                    help="draws per jitted segment (0 = whole run in one "
                         "jit).  The axon relay kills executions running "
                         "longer than ~10s as 'TPU worker crashed', so "
                         "large-N runs need segmenting; per-draw keys are "
                         "fold_in(offset+i) so segmentation does not change "
                         "the draws (resume-equivalence tested).")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import stheno_tpu as st
    from stheno_tpu import GPPPInput, gppp, logpdf, rand
    from stheno_tpu import params as P
    from stheno_tpu.inference import (
        run_nuts,
        effective_sample_size,
        potential_scale_reduction,
    )
    from stheno_tpu.graph import GPC

    N = args.n
    log(f"device: {jax.devices()[0]}  N={N}  chains={args.chains}  "
        f"warmup={args.warmup}  samples={args.samples}")

    # ground-truth data from a known GP (getting_started recipe at scale)
    gpc = GPC()
    f_true = st.GP(2.0 * st.with_lengthscale(st.SEKernel(), 1.3), gpc=gpc)
    x = jnp.asarray(
        np.sort(np.random.default_rng(1).uniform(-5, 5, N)), jnp.float32
    )
    y = rand(jax.random.PRNGKey(0), f_true(x, 0.1))

    @gppp
    def build(p):
        return dict(f=st.GP(p["v"] * st.with_lengthscale(st.SEKernel(), p["l"])))

    spec = dict(v=P.positive(1.0), l=P.positive(1.0), noise=P.positive(0.3))
    theta0, unflatten = P.init(spec)

    def logdensity(theta):
        p = unflatten(theta)
        f = build(p)
        lp = logpdf(f(GPPPInput("f", x), p["noise"]), y)
        return lp - 0.5 * jnp.sum(theta**2)

    from stheno_tpu.inference import (
        ChainState,
        nuts_warmup,
        warmup_result,
    )

    if args.segment <= 0:
        @jax.jit
        def run(key):
            return run_nuts(
                key,
                logdensity,
                theta0,
                num_warmup=args.warmup,
                num_samples=args.samples,
                num_chains=args.chains,
                max_depth=args.max_depth,
            )

        t0 = time.time()
        samples, info = run(jax.random.PRNGKey(1))
        s_host = np.asarray(samples)
        log(f"compile+first: {time.time()-t0:.1f}s")

        t0 = time.time()
        samples, info = run(jax.random.PRNGKey(2))
        s_host = np.asarray(samples)  # full host pull forces everything
        div = float(np.asarray(info.diverging).mean())
        dt = time.time() - t0
        log(f"steady: {dt:.1f}s")
    else:
        S = args.segment

        # warmup in W-iteration segments (each a short XLA program — the
        # relay kills long single executions); bit-equal to fused warmup
        WSEG = max(args.segment, 10)

        # first segment: static start 0 (initialises chains); later
        # segments share ONE compiled program (traced start, static length)
        first = jax.jit(
            lambda key: nuts_warmup(
                key, logdensity, theta0, num_warmup=args.warmup,
                num_chains=args.chains, max_depth=args.max_depth,
                segment=(0, min(WSEG, args.warmup)),
            )
        )

        @jax.jit
        def later(key, start, state):
            return nuts_warmup(
                key, logdensity, theta0, num_warmup=args.warmup,
                num_chains=args.chains, max_depth=args.max_depth,
                segment=(start, WSEG), state=state,
            )

        def warm(key):
            state = first(key)
            jax.block_until_ready(state.q)
            a = min(WSEG, args.warmup)
            while a < args.warmup:
                state = later(key, jnp.asarray(a, jnp.int32), state)
                jax.block_until_ready(state.q)
                a += WSEG
            return warmup_result(state)

        def seg(key, state, off):
            return run_nuts(
                key, logdensity, theta0, num_samples=S,
                num_chains=args.chains, max_depth=args.max_depth,
                resume_state=state, return_state=True, sample_offset=off,
            )

        seg_j = jax.jit(seg)  # offset traced: one compile for all segments

        def full_run(key, time_sampling_only=False):
            t0 = time.time()
            state = warm(key)
            jax.block_until_ready(state.q)
            t_warm = time.time() - t0
            chunks, infos = [], []
            t0 = time.time()
            off = 0
            while off < args.samples:
                smp, inf, state = seg_j(key, state, jnp.asarray(off, jnp.int32))
                chunks.append(np.asarray(smp))  # host pull forces segment
                infos.append(np.asarray(inf.diverging))
                off += S
            dt = time.time() - t0
            return (
                np.concatenate(chunks, axis=1)[:, : args.samples],
                np.concatenate(infos, axis=1)[:, : args.samples],
                dt,
                t_warm,
            )

        t0 = time.time()
        s_host, div_a, dt, t_warm = full_run(jax.random.PRNGKey(1))
        log(f"compile+first full pass: {time.time()-t0:.1f}s "
            f"(warmup segment {t_warm:.1f}s)")
        s_host, div_a, dt, t_warm = full_run(jax.random.PRNGKey(2))
        div = float(div_a.mean())
        log(f"steady sampling: {dt:.1f}s in segments of {S} "
            f"(+ warmup {t_warm:.1f}s, excluded from ESS/s like the "
            f"one-jit path excludes nothing — see note)")

    names = ["v", "l", "noise"]
    flat = jnp.asarray(np.asarray(s_host))
    constrained = {
        nm: np.asarray(jax.vmap(jax.vmap(lambda t: unflatten(t)[nm]))(flat))
        for nm in names
    }
    ess_total, rhat_max = 0.0, 0.0
    for nm in names:
        post = jnp.log(jnp.asarray(constrained[nm]))
        ess = float(effective_sample_size(post))
        rhat = float(potential_scale_reduction(post))
        ess_total += ess
        rhat_max = max(rhat_max, rhat)
        log(f"  {nm:6s} ess={ess:8.1f}  rhat={rhat:.4f}")
    draws_per_s = args.chains * args.samples / dt
    out = {
        "metric": f"nuts_ess_per_s_N{N}",
        "n": N,
        "chains": args.chains,
        "samples": args.samples,
        "warmup": args.warmup,
        "steady_s": round(dt, 2),
        "warmup_s_excluded": (round(t_warm, 2) if args.segment > 0 else None),
        "timing": ("sampling-only, segmented" if args.segment > 0
                   else "warmup+sampling, one jit"),
        "ess_per_s": round(ess_total / dt, 1),
        "draws_per_s": round(draws_per_s, 1),
        "rhat_max": round(rhat_max, 4),
        "divergence_rate": round(div, 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
