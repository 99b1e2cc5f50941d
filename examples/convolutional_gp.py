"""The Convolutional Gaussian Process — reference
examples/convolutional_gp/script.jl: a custom derived op `patch_convolve(g)`
that sums a patch-space GP `g` over all 3×3 patches of a greyscale image,
giving a GP over *images*; pseudo-points then live in the 9-dimensional
patch domain (interdomain VFE — the cross-covariance between the image
process and the patch process is exactly Stheno's special power).

TPU-native design: instead of the reference's per-patch loop of
`kernelmatrix` calls (script.jl:45-73), all patches of all images are
flattened into ONE (N·P, 9) array and a single MXU pairwise kernel matrix is
computed, then block-summed — one big matmul instead of P² small ones.

The reference uses MNIST 1s/2s; with no dataset egress here we synthesise
smooth random images (the math being demonstrated is identical).

Run: python examples/convolutional_gp.py [--platform cpu]
"""

import sys

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import GPPPInput, elbo, gppp, logpdf, rand, VFE
from stheno_tpu.graph import GPC, AbstractProcess, cross_cov, cross_var
from stheno_tpu.tree import pytree_dataclass, static_field

PATCH = 3


def extract_patches(ximg):
    """(N, H, W) images → (N, P, 9) patch vectors, vectorised (one XLA op —
    the TPU replacement for the reference's Julia comprehension at
    script.jl:31-37)."""
    n, h, w = ximg.shape
    p = jax.lax.conv_general_dilated_patches(
        ximg[:, None, :, :],  # NCHW
        filter_shape=(PATCH, PATCH),
        window_strides=(1, 1),
        padding="VALID",
    )  # (N, 9, H-2, W-2)
    return jnp.transpose(p.reshape(n, PATCH * PATCH, -1), (0, 2, 1))


def _flat_patches(ximg):
    pp = extract_patches(ximg)
    n, P, d = pp.shape
    return pp.reshape(n * P, d), n, P


@pytree_dataclass
class PatchConvolveGP(AbstractProcess):
    """f(img) = Σ_patches g(patch) — the derived op of script.jl:41-77.

    Inputs to this process are (N, H, W) image stacks; inputs to the parent
    `g` are (M, 9) patch vectors.  Every statistic is one pairwise kernel
    matrix over flattened patches followed by a block-sum."""

    g: AbstractProcess
    n: int = static_field()
    gpc: GPC = static_field()

    def mean(self, x):
        xp, n, P = _flat_patches(x)
        return self.g.mean(xp).reshape(n, P).sum(axis=1)

    def cov2(self, x, x2):
        xp, n, P = _flat_patches(x)
        x2p, n2, P2 = _flat_patches(x2)
        K = self.g.cov2(xp, x2p).reshape(n, P, n2, P2)
        return K.sum(axis=(1, 3))

    def cov(self, x):
        return self.cov2(x, x)

    def var(self, x):
        return self.var2(x, x)

    def var2(self, x, x2):
        # diag of the block-summed matrix: per-image patch-pair sums, O(N·P²)
        xp, n, P = _flat_patches(x)
        x2p, n2, P2 = _flat_patches(x2)
        Kii = jax.vmap(self.g.cov2)(
            xp.reshape(n, P, -1), x2p.reshape(n2, P2, -1)
        )  # (N, P, P2)
        return Kii.sum(axis=(1, 2))

    # cross rules: distribute the patch sum into any other process
    def _cross_cov_l(self, f2, x, x2):
        xp, n, P = _flat_patches(x)
        return cross_cov(self.g, f2, xp, x2).reshape(n, P, -1).sum(axis=1)

    def _cross_cov_r(self, f2, x, x2):
        x2p, n2, P2 = _flat_patches(x2)
        K = cross_cov(f2, self.g, x, x2p)
        return K.reshape(K.shape[0], n2, P2).sum(axis=2)

    def _cross_var_l(self, f2, x, x2):
        xp, n, P = _flat_patches(x)
        v = jax.vmap(lambda xb, x2b: cross_var(self.g, f2, xb, x2b).sum(0))(
            xp.reshape(n, P, -1).transpose(1, 0, 2),
            jnp.broadcast_to(x2, (P, *jnp.shape(x2))),
        )
        return v

    def _cross_var_r(self, f2, x, x2):
        x2p, n2, P2 = _flat_patches(x2)
        v = jax.vmap(lambda x2b: cross_var(f2, self.g, x, x2b))(
            x2p.reshape(n2, P2, -1).transpose(1, 0, 2)
        )
        return v.sum(axis=0)


def patch_convolve(g: AbstractProcess) -> PatchConvolveGP:
    return PatchConvolveGP(g, n=g.gpc.next_index(), gpc=g.gpc)


@gppp
def build_gp(t):
    g = st.GP(t["var"] * st.with_lengthscale(st.SEKernel(), t["l"]))
    f = patch_convolve(g)
    return dict(g=g, f=f)


def main():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(0)

    # synthetic smooth 8×8 images (MNIST stand-in)
    N, H = 12, 8
    base = rng.normal(size=(N, H, H))
    imgs = jnp.asarray(
        np.stack([np.cumsum(np.cumsum(b, 0), 1) / H for b in base])
    )

    f = build_gp(dict(var=jnp.asarray(1.0), l=jnp.asarray(1.0)))
    x = GPPPInput("f", imgs)

    # statistics work and are consistent (script.jl:85-95)
    m = f.mean(x)
    K = f.cov(x)
    v = f.var(x)
    assert m.shape == (N,) and K.shape == (N, N) and v.shape == (N,)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K).T, atol=1e-9)
    np.testing.assert_allclose(v, jnp.diagonal(K), rtol=1e-9, atol=1e-9)

    # oracle: brute-force patch-pair sum for one entry
    pp = extract_patches(imgs)
    k01 = sum(
        float(f["g"].cov2(pp[0, i : i + 1], pp[1, j : j + 1])[0, 0])
        for i in range(pp.shape[1])
        for j in range(pp.shape[1])
    )
    np.testing.assert_allclose(float(K[0, 1]), k01, rtol=1e-8)

    # interdomain cross-covariance image-process × patch-process
    # (cov(f, x, z) at script.jl:102) and the VFE pseudo-point approximation
    # with inducing points in PATCH space (script.jl:97-104)
    M = 32
    z = GPPPInput("g", jnp.asarray(rng.normal(size=(M, PATCH * PATCH))))
    Kfz = f.cov2(x, z)
    assert Kfz.shape == (N, M)

    key, sub = jax.random.split(key)
    y = rand(sub, f(x, 0.1))
    lml = float(logpdf(f(x, 0.1), y))
    lb = float(elbo(VFE(f(z, 1e-6)), f(x, 0.1), y))
    print(f"exact logpdf {lml:.3f}; patch-domain VFE elbo {lb:.3f}")
    assert lb <= lml + 1e-6

    # inducing points AT the data patches make the bound tight(er)
    z_data = GPPPInput("g", pp.reshape(-1, PATCH * PATCH)[: 4 * M])
    lb_data = float(elbo(VFE(f(z_data, 1e-6)), f(x, 0.1), y))
    print(f"elbo with data-patch inducing points: {lb_data:.3f}")
    assert lb_data >= lb - 1e-6

    print("convolutional_gp: OK")


if __name__ == "__main__":
    main()
