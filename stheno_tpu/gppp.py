"""GPPP — the Gaussian-process probabilistic programme (layer 5,
src/gaussian_process_probabilistic_programme.jl).

A `GPPP` is a named collection of processes from one programme, treated as a
single GP over *tagged* inputs (`GPPPInput` / `BlockData`).  The reference
builds one with the `@gppp let ... end` macro; the idiomatic JAX equivalent is
the `@gppp` decorator below: a *pure function* from hyperparameters to a
programme — exactly the `build_model(θ)` pattern the reference examples use
for hyperparameter learning (examples/getting_started/script.jl:111-117),
which is what lets the whole model be traced under `jit` with θ as leaves.

    @gppp
    def model(theta):
        f1 = GP(SEKernel())
        f2 = GP(theta["s"] * Matern52Kernel())
        f3 = f1 + f2
        return dict(f1=f1, f2=f2, f3=f3)

    f = model(theta)          # a GPPP
    fx = f(GPPPInput("f3", x), 0.1)
    lp = logpdf(fx, y)
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from stheno_tpu.tree import pytree_dataclass, static_field
from stheno_tpu.graph import (
    GPC,
    AbstractProcess,
    cross,
    cross_cov,
    cross_var,
)
from stheno_tpu.inputs import BlockData, GPPPInput


@pytree_dataclass
class GPPP:
    """Named collection of processes interpreted as one GP over tagged inputs.

    Implements the same statistics interface as a graph node (`mean`, `cov`,
    `cov2`, `var`, `var2`) but accepting `GPPPInput` / `BlockData` /
    ``[( "f1", x1 ), ...]`` tagged inputs — parity with the AbstractGPs API
    forwarding at gaussian_process_probabilistic_programme.jl:45-80.
    """

    processes: dict
    gpc: GPC = static_field()

    # -- routing (extract_components, gppp.jl:25-43) ------------------------
    def extract(self, x):
        """Map tagged inputs to (process-node, raw-inputs)."""
        if isinstance(x, GPPPInput):
            if x.p not in self.processes:
                raise KeyError(
                    f"GPPP has no process {x.p!r}; has {sorted(self.processes)}"
                )
            return self.processes[x.p], x.x
        if isinstance(x, BlockData):
            pairs = [self.extract(b) for b in x.blocks]
            return cross([p for p, _ in pairs]), BlockData(*[v for _, v in pairs])
        if isinstance(x, (list, tuple)) and x and isinstance(x[0], tuple):
            # Vector of (name, point) tuples: group by name in order of first
            # appearance (gppp.jl:32-43).
            names = []
            grouped = {}
            for p, v in x:
                if p not in grouped:
                    grouped[p] = []
                    names.append(p)
                grouped[p].append(v)
            blocks = [
                GPPPInput(p, jnp.stack([jnp.asarray(v) for v in grouped[p]]))
                for p in names
            ]
            return self.extract(BlockData(*blocks))
        raise TypeError(
            f"GPPP inputs must be GPPPInput, BlockData, or [(name, x), ...]; "
            f"got {type(x)}"
        )

    # -- statistics ---------------------------------------------------------
    def mean(self, x):
        f, v = self.extract(x)
        return f.mean(v)

    def cov(self, x):
        f, v = self.extract(x)
        return f.cov(v)

    def cov2(self, x, x2):
        f, v = self.extract(x)
        f2, v2 = self.extract(x2)
        return cross_cov(f, f2, v, v2)

    def var(self, x):
        f, v = self.extract(x)
        return f.var(v)

    def var2(self, x, x2):
        f, v = self.extract(x)
        f2, v2 = self.extract(x2)
        return cross_var(f, f2, v, v2)

    def mean_and_cov(self, x):
        f, v = self.extract(x)
        return f.mean(v), f.cov(v)

    def mean_and_var(self, x):
        f, v = self.extract(x)
        return f.mean(v), f.var(v)

    # -- sugar --------------------------------------------------------------
    def __getitem__(self, name) -> AbstractProcess:
        return self.processes[name]

    def __contains__(self, name):
        return name in self.processes

    def _validate_tags(self, x):
        """Eagerly check tags so `f(x, noise)` fails fast on an unknown
        process (evaluation-time KeyError would otherwise surface inside a
        jit trace, far from the user's mistake)."""
        if isinstance(x, GPPPInput):
            if x.p not in self.processes:
                raise KeyError(
                    f"GPPP has no process {x.p!r}; has {sorted(self.processes)}"
                )
        elif isinstance(x, BlockData):
            for b in x.blocks:
                self._validate_tags(b)
        elif isinstance(x, (list, tuple)) and x and isinstance(x[0], tuple):
            for p, _ in x:
                self._validate_tags(GPPPInput(p, None))

    def __call__(self, x, noise=None):
        from stheno_tpu.finite_gp import FiniteGP

        self._validate_tags(x)
        return FiniteGP(self, x, noise)


def gppp(fn=None):
    """Decorator version of the reference's `@gppp` macro.

    Runs the decorated builder inside a fresh `GPC` context (so bare
    `GP(kernel)` calls pick up the programme counter) and wraps the returned
    ``dict[str, process]`` into a `GPPP`.  The builder stays a pure function
    of its arguments, so it can be called inside `jit`/`grad` with traced
    hyperparameters.
    """

    def wrap(f):
        @functools.wraps(f)
        def build(*args, **kwargs):
            with GPC() as gpc:
                out = f(*args, **kwargs)
            if isinstance(out, GPPP):
                return out
            if not isinstance(out, dict):
                raise TypeError(
                    "@gppp builder must return a dict of named processes"
                )
            for k, v in out.items():
                if not isinstance(v, AbstractProcess):
                    raise TypeError(f"process {k!r} is not an AbstractProcess")
            return GPPP(dict(out), gpc)

        return build

    if fn is None:
        return wrap
    return wrap(fn)
