"""Observability: per-iteration scalar logging from inside jitted loops
(SURVEY.md §5 — logpdf/ELBO traces, step size, acceptance, divergences must
be first-class because the whole optimisation/sampling loop lives on-device).

Built on `jax.debug.callback` (async, does not stall the device) — scalars
stream to the host logger while the compiled loop keeps running.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def _default_sink(tag, step, values):
    parts = " ".join(f"{k}={float(v):.5g}" for k, v in values.items())
    print(f"[{tag}] step {int(step):>6d}  {parts}", file=sys.stderr, flush=True)


def log_scalars(tag: str, step, every: int = 1, sink=None, **values):
    """Emit named scalars from inside a jitted computation every `every`
    steps.  Usage inside a scan body:

        log_scalars("fit", step=i, every=50, loss=loss, lr=lr)
    """
    sink = sink or _default_sink

    def _cb(step_, *vals):
        sink(tag, step_, dict(zip(values.keys(), vals)))

    jax.lax.cond(
        (jnp.asarray(step) % every) == 0,
        lambda: jax.debug.callback(_cb, step, *values.values()),
        lambda: None,
    )


class Trace:
    """`with Trace('logpdf-16k'):` — jax.profiler trace around a region,
    written to `dir` for tensorboard/xprof (SURVEY.md §5 tracing)."""

    def __init__(self, name: str, dir: str = "/tmp/stheno_tpu_trace"):
        self.name = name
        self.dir = dir

    def __enter__(self):
        jax.profiler.start_trace(self.dir)
        self._ann = jax.profiler.TraceAnnotation(self.name)
        self._ann.__enter__()
        return self

    def __exit__(self, *exc):
        self._ann.__exit__(*exc)
        jax.profiler.stop_trace()
        return False
