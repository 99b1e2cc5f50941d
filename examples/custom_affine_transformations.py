"""Custom affine transformations — the extension contract (reference
examples/custom_affine_transformations/script.jl: user-supplied op nodes get
full GPPP citizenship, validated by the interface-conformance suite;
SURVEY.md §7.4).

We implement (Af)(x) = f(x) + f(x + 3) − 2 as a new process-node class: a
frozen pytree dataclass subclassing AbstractProcess that supplies

- the unary statistics `mean/cov/cov2/var/var2`, and
- the cross-distribution rules `_cross_cov_l/_r`, `_cross_var_l/_r`
  (self on the left/right of a cross-covariance with any other process),

in terms of the statistics of its parent — after which sums, scalings,
GPPP routing, posteriors, VFE, etc. all compose with it for free.

Run: python examples/custom_affine_transformations.py [--platform cpu]
"""

import sys

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import GPPPInput, BlockData, gppp, logpdf, posterior, rand
from stheno_tpu.tree import pytree_dataclass, static_field
from stheno_tpu.graph import AbstractProcess, GPC, cross_cov, cross_var
from stheno_tpu.utils.testing import check_process_interface


@pytree_dataclass
class AGP(AbstractProcess):
    """(Af)(x) = f(x) + f(x + 3) − 2."""

    f: AbstractProcess
    n: int = static_field()
    gpc: GPC = static_field()

    def _s(self, x):
        return x + 3.0

    def mean(self, x):
        return self.f.mean(x) + self.f.mean(self._s(x)) - 2.0

    def cov(self, x):
        return self.cov2(x, x)

    def cov2(self, x, x2):
        f, s = self.f, self._s
        return (
            f.cov2(x, x2)
            + f.cov2(x, s(x2))
            + f.cov2(s(x), x2)
            + f.cov2(s(x), s(x2))
        )

    def var(self, x):
        return self.var2(x, x)

    def var2(self, x, x2):
        f, s = self.f, self._s
        return (
            f.var2(x, x2)
            + f.var2(x, s(x2))
            + f.var2(s(x), x2)
            + f.var2(s(x), s(x2))
        )

    def _cross_cov_l(self, g, x, x2):
        return cross_cov(self.f, g, x, x2) + cross_cov(self.f, g, self._s(x), x2)

    def _cross_cov_r(self, g, x, x2):
        return cross_cov(g, self.f, x, x2) + cross_cov(g, self.f, x, self._s(x2))

    def _cross_var_l(self, g, x, x2):
        return cross_var(self.f, g, x, x2) + cross_var(self.f, g, self._s(x), x2)

    def _cross_var_r(self, g, x, x2):
        return cross_var(g, self.f, x, x2) + cross_var(g, self.f, x, self._s(x2))


def A(f: AbstractProcess) -> AGP:
    return AGP(f, n=f.gpc.next_index(), gpc=f.gpc)


@gppp
def model():
    f = st.GP(st.SEKernel())
    Af = A(f)
    return dict(f=f, Af=Af)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    g = model()
    f, Af = g["f"], g["Af"]

    x = jnp.asarray(rng.normal(size=5))
    x2 = jnp.asarray(rng.normal(size=7))

    # oracle checks of the defining identities
    np.testing.assert_allclose(
        Af.mean(x), f.mean(x) + f.mean(x + 3) - 2.0, atol=1e-12
    )
    np.testing.assert_allclose(
        cross_cov(Af, f, x, x2),
        np.asarray(f.cov2(x, x2)) + np.asarray(f.cov2(x + 3, x2)),
        atol=1e-12,
    )
    # full interface conformance (the test_internal_abstractgps_interface
    # analogue the reference runs at script.jl:158-164)
    check_process_interface(Af, x, jnp.asarray(rng.normal(size=5)), x2, f2=f)
    check_process_interface(
        g, GPPPInput("Af", x), GPPPInput("Af", jnp.asarray(rng.normal(size=5))),
        BlockData(GPPPInput("f", x2), GPPPInput("Af", x)),
    )

    # the custom node composes with everything: condition on Af, read off f
    xo = jnp.asarray(np.sort(rng.uniform(-3, 3, 20)))
    fx = g(GPPPInput("Af", xo), 0.1)
    y = rand(key, fx)
    lp = logpdf(fx, y)
    post = posterior(fx, y)
    m_f = post.mean(GPPPInput("f", xo))
    v_f = post.var(GPPPInput("f", xo))
    assert np.all(np.isfinite(np.asarray(m_f)))
    assert np.all(np.asarray(v_f) > 0)
    # and with derived composites of the custom node
    h = 2.0 * Af + f
    check_process_interface(h, x, jnp.asarray(rng.normal(size=5)), f2=Af)
    print(f"logpdf under custom op: {float(lp):.3f}")
    print("custom_affine_transformations: OK")


if __name__ == "__main__":
    main()
