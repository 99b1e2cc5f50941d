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
    ap.add_argument("--precision", default=None,
                    help="scoped GEMM precision for the whole run (e.g. "
                         "'highest'): at N≳4k f32 the signal-variance "
                         "gradient is cancellation-dominated at HIGH "
                         "(bf16_3x) — rel err ~2 measured by `perf_probe "
                         "accuracy` — which limits NUTS mixing on that "
                         "coordinate; HIGHEST restores it at ~1.4× cost")
    ap.add_argument("--chain-batches", type=int, default=1,
                    dest="chain_batches",
                    help="run B sequential batches of --chains chains "
                         "(fold_in batch keys) and pool the draws for "
                         "R-hat/ESS: restores a wide statistical basis "
                         "when HBM caps the per-batch chain count (the "
                         "N=8192 row was 4-chain for this reason; VERDICT "
                         "r4 weak-item 4).  Wall time sums over batches, "
                         "so ESS/s stays honest.")
    ap.add_argument("--batch-offset", type=int, default=0,
                    dest="batch_offset",
                    help="offset added to the chain-batch fold_in index: "
                         "lets each batch run as its OWN process "
                         "(--chain-batches 1 --batch-offset b) with "
                         "distinct chains, so a relay-client hang — the "
                         "client dies non-deterministically after many "
                         "successive large calls — costs one batch, not "
                         "the whole run.  Pool the saved draws with "
                         "scripts/nuts_pool.py.")
    ap.add_argument("--save-draws", default=None, dest="save_draws",
                    help="write the constrained draws + timing telemetry "
                         "to this .npz (input of scripts/nuts_pool.py)")
    ap.add_argument("--warmup-segment", type=int, default=0,
                    dest="warmup_segment",
                    help="warmup iterations per jitted segment (default "
                         "max(--segment, 10)); at N=16k a warmup iteration "
                         "costs seconds, so smaller segments keep each "
                         "device program under the relay's execution kill")
    ap.add_argument("--single-pass", action="store_true", dest="single_pass",
                    help="segmented mode: derive the steady rate from the "
                         "first pass's per-segment medians instead of a "
                         "second full pass (halves relay exposure)")
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

    # precision policy: an explicit --precision is passed through to the
    # samplers (and overrides their 'auto' rule); otherwise 'auto' applies —
    # at N>=4096 f32 the entry points pin HIGHEST themselves (round-5
    # policy; BASELINE.md round-4 cliff).  To measure the HIGH configuration
    # at large N (e.g. to reproduce the cliff), pass --precision high.
    prec_arg = args.precision if args.precision else "auto"
    log(f"precision policy: {prec_arg}")

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

    # fixed relay/dispatch/host-pull overhead per jitted call (bench.py
    # discipline, VERDICT r3 item 4): measured around the run; the
    # overhead-subtracted device estimate divides ESS by
    # (wall − n_calls × null) so segmentation overhead does not masquerade
    # as device cost.
    @jax.jit
    def _null(i):
        return jnp.sum(x[:8]) + i * 1e-7

    def null_probe(label):
        float(_null(0))
        t0 = time.time()
        for i in range(1, 7):
            float(_null(i))
        s = (time.time() - t0) / 6
        log(f"null({label}): {s * 1e3:.1f} ms")
        return s

    if args.segment <= 0:
        # warmup and sampling in SEPARATE jits (bit-identical draws to the
        # fused run by the resume design) so ESS/s is sampling-only here
        # exactly like the segmented path (ADVICE.md r3: the two modes'
        # ess_per_s were not comparable).
        warm_j = jax.jit(
            lambda key: warmup_result(
                nuts_warmup(
                    key, logdensity, theta0, num_warmup=args.warmup,
                    num_chains=args.chains, max_depth=args.max_depth,
                    precision=prec_arg,
                )
            )
        )

        @jax.jit
        def sample_j(key, state):
            return run_nuts(
                key, logdensity, theta0, num_samples=args.samples,
                num_chains=args.chains, max_depth=args.max_depth,
                resume_state=state, precision=prec_arg,
            )

        def full_run(key):
            t0 = time.time()
            state = warm_j(key)
            float(jnp.sum(state.q))  # host pull: forces the warmup call
            t_warm = time.time() - t0
            t0 = time.time()
            samples, info = sample_j(key, state)
            s_host = np.asarray(samples)  # full host pull forces everything
            dt = time.time() - t0
            return s_host, np.asarray(info.diverging), dt, t_warm

        t0 = time.time()
        full_run(jax.random.PRNGKey(1))
        log(f"compile+first: {time.time()-t0:.1f}s")

        null_s = null_probe("before")
        parts, divs, dt, t_warm = [], [], 0.0, 0.0
        for b in range(args.chain_batches):
            sb, db, dtb, twb = full_run(
                jax.random.fold_in(jax.random.PRNGKey(2), args.batch_offset + b))
            parts.append(sb)
            divs.append(db)
            dt += dtb
            t_warm += twb
            if args.chain_batches > 1:
                log(f" batch {b + 1}/{args.chain_batches}: sampling "
                    f"{dtb:.1f}s")
        s_host = np.concatenate(parts, axis=0)
        div_a = np.concatenate(divs, axis=0)
        null_s = 0.5 * (null_s + null_probe("after"))
        div = float(div_a.mean())
        n_sample_calls = args.chain_batches
        log(f"steady: sampling {dt:.1f}s (+ warmup {t_warm:.1f}s, excluded)")
    else:
        S = args.segment

        # warmup in W-iteration segments (each a short XLA program — the
        # relay kills long single executions); bit-equal to fused warmup
        WSEG = args.warmup_segment or max(args.segment, 10)

        # first segment: static start 0 (initialises chains); later
        # segments share ONE compiled program (traced start, static length)
        first = jax.jit(
            lambda key: nuts_warmup(
                key, logdensity, theta0, num_warmup=args.warmup,
                num_chains=args.chains, max_depth=args.max_depth,
                segment=(0, min(WSEG, args.warmup)), precision=prec_arg,
            )
        )

        @jax.jit
        def later(key, start, state):
            return nuts_warmup(
                key, logdensity, theta0, num_warmup=args.warmup,
                num_chains=args.chains, max_depth=args.max_depth,
                segment=(start, WSEG), state=state, precision=prec_arg,
            )

        def warm(key):
            # an overshooting final segment is safe: out-of-range warmup
            # iterations are masked no-ops (bit-exact vs the fused run),
            # so WSEG need not divide args.warmup
            state = first(key)
            float(jnp.sum(state.q))  # host pull: forces the segment
            a = min(WSEG, args.warmup)
            n_calls = 1
            t0 = time.time()
            while a < args.warmup:
                state = later(key, jnp.asarray(a, jnp.int32), state)
                float(jnp.sum(state.q))
                a += WSEG
                n_calls += 1
                if n_calls % 20 == 0:
                    log(f"  warmup {a}/{args.warmup} "
                        f"({time.time() - t0:.0f}s since first segment)")
            return warmup_result(state), n_calls

        def seg(key, state, off):
            return run_nuts(
                key, logdensity, theta0, num_samples=S,
                num_chains=args.chains, max_depth=args.max_depth,
                resume_state=state, return_state=True, sample_offset=off,
                precision=prec_arg,
            )

        seg_j = jax.jit(seg)  # offset traced: one compile for all segments

        def full_run(key):
            t0 = time.time()
            state, n_warm_calls = warm(key)
            t_warm = time.time() - t0
            chunks, infos, seg_times = [], [], []
            t0 = time.time()
            off = 0
            n_calls = 0
            while off < args.samples:
                ts = time.time()
                smp, inf, state = seg_j(key, state, jnp.asarray(off, jnp.int32))
                chunks.append(np.asarray(smp))  # host pull forces segment
                seg_times.append(time.time() - ts)
                infos.append(np.asarray(inf.diverging))
                off += S
                n_calls += 1
                log(f"  seg off={off - S:4d}: {seg_times[-1]:.2f}s")
            dt = time.time() - t0
            return (
                np.concatenate(chunks, axis=1)[:, : args.samples],
                np.concatenate(infos, axis=1)[:, : args.samples],
                dt,
                t_warm,
                n_calls,
                seg_times,
            )

        # Per-segment timing lets ONE pass yield a steady estimate (the
        # first segment carries the compile; the median of the rest is the
        # sustained rate — bench.py's min-over-batches philosophy).  On
        # this relay the client process dies non-deterministically after
        # many successive large calls, so --single-pass avoids doubling
        # the exposure; without it a second (fully warm) pass is timed.
        null_s = null_probe("before")
        parts, divs = [], []
        t_warm, n_sample_calls = 0.0, 0
        all_seg = []  # warm per-segment times pooled over batches
        dt_measured = 0.0
        for b in range(args.chain_batches):
            t0 = time.time()
            sb, db, dtb, twb, ncb, seg_times = full_run(
                jax.random.fold_in(jax.random.PRNGKey(2), args.batch_offset + b))
            log(f" batch {b + 1}/{args.chain_batches}: "
                f"{time.time()-t0:.1f}s (warmup {twb:.1f}s)")
            parts.append(sb)
            divs.append(db)
            t_warm += twb
            n_sample_calls += ncb
            dt_measured += dtb
            # batch 1's first segment carries the compile; later batches
            # are fully warm
            all_seg += seg_times[1:] if b == 0 else seg_times
        s_host = np.concatenate(parts, axis=0)
        div_a = np.concatenate(divs, axis=0)
        if args.single_pass:
            steady_seg = float(np.median(all_seg)) if all_seg else (
                dt_measured / n_sample_calls)
            dt = steady_seg * n_sample_calls
            log(f"single-pass steady estimate: median seg "
                f"{steady_seg:.2f}s × {n_sample_calls} = {dt:.1f}s")
        else:
            # a second fully-warm pass over every batch
            parts, divs, dt = [], [], 0.0
            for b in range(args.chain_batches):
                sb, db, dtb, twb, ncb, _ = full_run(
                    jax.random.fold_in(jax.random.PRNGKey(2), args.batch_offset + b))
                parts.append(sb)
                divs.append(db)
                dt += dtb
            s_host = np.concatenate(parts, axis=0)
            div_a = np.concatenate(divs, axis=0)
        null_s = 0.5 * (null_s + null_probe("after"))
        div = float(div_a.mean())
        log(f"steady sampling: {dt:.1f}s in {n_sample_calls} segments of "
            f"{S} (+ warmup {t_warm:.1f}s, excluded)")

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
    total_chains = args.chains * args.chain_batches
    draws_per_s = total_chains * args.samples / dt
    # overhead-subtracted device estimate: each jitted sampling call pays
    # the fixed relay/dispatch/host-pull overhead the null probe measures;
    # the device numbers are the per-chip rates the north star names.
    overhead_s = n_sample_calls * null_s
    device_s = max(dt - overhead_s, 1e-6)
    out = {
        "metric": f"nuts_ess_per_s_N{N}",
        "n": N,
        "chains": total_chains,
        "chains_per_batch": args.chains,
        "chain_batches": args.chain_batches,
        "samples": args.samples,
        "warmup": args.warmup,
        "steady_s": round(dt, 2),
        "warmup_s_excluded": round(t_warm, 2),
        "timing": (
            ("sampling-only, segmented"
             + (", single-pass median-of-segments"
                if args.single_pass else ""))
            if args.segment > 0
            else "sampling-only, one jit (warmup in its own jit)"
        ),
        "ess_per_s": round(ess_total / dt, 1),
        "draws_per_s": round(draws_per_s, 1),
        "null_ms": round(null_s * 1e3, 1),
        "n_sampling_calls": n_sample_calls,
        "sampling_overhead_s": round(overhead_s, 2),
        "overhead_share": round(overhead_s / dt, 3),
        "device_s_est": round(device_s, 2),
        "ess_per_s_device": round(ess_total / device_s, 1),
        "draws_per_s_device": round(total_chains * args.samples / device_s, 1),
        "rhat_max": round(rhat_max, 4),
        "divergence_rate": round(div, 4),
    }
    if args.save_draws:
        np.savez(
            args.save_draws,
            div=div_a,
            dt=dt,
            t_warm=t_warm,
            null_s=null_s,
            n_sampling_calls=n_sample_calls,
            n=N,
            chains=total_chains,
            samples=args.samples,
            warmup=args.warmup,
            **{f"draws_{nm}": constrained[nm] for nm in names},
        )
        log(f"draws saved to {args.save_draws}")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
