"""Compiler cost-model summaries per jitted entry point (SURVEY.md §5:
tracing/profiling — the reference only has BenchmarkTools timers in bench/;
here the XLA cost model is queried directly so every entry point can print
its FLOP/byte footprint and a roofline estimate without running).
"""

from __future__ import annotations

import sys

import jax


def cost_analysis(fn, *args, **kwargs):
    """Compile `fn(*args, **kwargs)` and return XLA's cost analysis dict
    (keys like 'flops', 'bytes accessed', 'transcendentals'; backend-
    dependent).  Returns {} if the backend exposes none."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if ca is None:
        return {}
    # some backends return a list with one entry per computation
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca)


def cost_summary(fn, *args, peak_flops=None, hbm_bw=None, name="entry",
                 file=sys.stderr, **kwargs):
    """Print a one-line roofline summary for a jitted entry point:

        [cost] logpdf-16k flops=2.93e+12 bytes=4.3e+09 intensity=682 model-compute-bound 59.80 ms

    `peak_flops` (FLOP/s) and `hbm_bw` (B/s) are optional chip parameters;
    with both given the bound is max(flops/peak, bytes/bw).  Returns the
    raw cost dict.

    Caveat (measured, BASELINE.md round 2): XLA's analytical byte count
    charges every slice/update with full operand bytes and ignores fusion
    and in-place aliasing — unrolled blocked algorithms "move" 10-20× their
    real HBM traffic by this model (the blocked Cholesky forward shows
    21.5 GB at N=8192 yet measures compute-bound at the MXU peak on TPU).
    Use the FLOP figure and A/B ratios; treat a "memory-bound" verdict here
    as an upper bound on bytes, not a floor on time."""
    ca = cost_analysis(fn, *args, **kwargs)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    parts = [f"flops={flops:.3g}", f"bytes={byts:.3g}"]
    if byts > 0:
        parts.append(f"intensity={flops / byts:.1f}")
    bound = None
    if peak_flops and hbm_bw and (flops or byts):
        t = max(flops / peak_flops, byts / hbm_bw)
        kind = "compute" if flops / peak_flops >= byts / hbm_bw else "memory"
        # 'model-' prefix: the byte side overcounts (see docstring caveat)
        bound = f"model-{kind}-bound {t * 1e3:.2f} ms"
        parts.append(bound)
    print(f"[cost] {name}  " + "  ".join(parts), file=file, flush=True)
    return ca
