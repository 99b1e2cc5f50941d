"""stheno_tpu — a TPU-native Gaussian-process probabilistic-programming
framework with the capabilities of Stheno.jl (see SURVEY.md for the full
reference analysis and parity map).

Public surface (parity: reference exports at src/Stheno.jl:46-48 plus the
AbstractGPs / KernelFunctions verbs its examples exercise):

- programme construction: `@gppp`, `GP`, `GPC`, `atomic`, `GPPP`
- tagged inputs: `GPPPInput`, `BlockData`, `split`, `vcat`
- affine ops: `+ - *` on processes, `compose`, `stretch`, `select`,
  `periodic`, `shift`, `additive_gp`, `cross`
- inference verbs: `rand`, `logpdf`, `posterior`, `marginals`, `mean`, `cov`,
  `var`, `mean_and_cov`, `mean_and_var`, `elbo`, `VFE`, `SparseFiniteGP`
- kernel zoo: `SEKernel`, `Matern12/32/52Kernel`, `WhiteKernel`, ... and
  kernel algebra / `with_lengthscale`
- inference engines (first-class here, ecosystem-delegated in the reference):
  `stheno_tpu.inference` (NUTS/HMC, VI, SMC), `stheno_tpu.parallel`
  (sharded chains, distributed kernel matrices)
"""

from stheno_tpu.kernels import *  # noqa: F401,F403
from stheno_tpu.kernels import __all__ as _kernels_all
from stheno_tpu.means import ZeroMean, ConstMean, FunctionMean
from stheno_tpu.inputs import GPPPInput, BlockData, split, vcat, ColVecs, RowVecs
from stheno_tpu.graph import (
    GPC,
    GP,
    atomic,
    cross,
    cross_cov,
    cross_var,
    compose,
    stretch,
    select,
    periodic,
    shift,
    additive_gp,
    derivative,
    convolve_quadrature,
    AbstractProcess,
    AtomicGP,
    WrappedGP,
    ParamFn,
    StaticFn,
    Stretch,
    Select,
    Periodic,
    Shift,
)
from stheno_tpu.gppp import GPPP, gppp

#: Full reference name (GaussianProcessProbabilisticProgramme == GPPP)
GaussianProcessProbabilisticProgramme = GPPP
from stheno_tpu.finite_gp import (
    FiniteGP,
    DiagNoise,
    FullNoise,
    Marginals,
    mean,
    cov,
    var,
    mean_and_cov,
    mean_and_var,
    marginals,
    rand,
    logpdf,
    posterior,
    PosteriorGP,
    VFE,
    elbo,
    elbo_fx,
    posterior_vfe,
    ApproxPosteriorGP,
    SparseFiniteGP,
)
from stheno_tpu.sampling import (
    spectral_features,
    prior_samples,
    pathwise_conditioned_samples,
)
from stheno_tpu.markov import (
    sde_representation,
    markov_gp_logpdf,
    markov_gp_posterior_marginals,
)

__version__ = "0.1.0"

__all__ = list(_kernels_all) + [
    "ZeroMean",
    "ConstMean",
    "FunctionMean",
    "GPPPInput",
    "BlockData",
    "split",
    "vcat",
    "ColVecs",
    "RowVecs",
    "GPC",
    "GP",
    "atomic",
    "cross",
    "cross_cov",
    "cross_var",
    "compose",
    "stretch",
    "select",
    "periodic",
    "shift",
    "additive_gp",
    "derivative",
    "convolve_quadrature",
    "AbstractProcess",
    "AtomicGP",
    "WrappedGP",
    "ParamFn",
    "StaticFn",
    "spectral_features",
    "prior_samples",
    "pathwise_conditioned_samples",
    "sde_representation",
    "markov_gp_logpdf",
    "markov_gp_posterior_marginals",
    "Stretch",
    "Select",
    "Periodic",
    "Shift",
    "GPPP",
    "gppp",
    "GaussianProcessProbabilisticProgramme",
    "FiniteGP",
    "DiagNoise",
    "FullNoise",
    "Marginals",
    "mean",
    "cov",
    "var",
    "mean_and_cov",
    "mean_and_var",
    "marginals",
    "rand",
    "logpdf",
    "posterior",
    "PosteriorGP",
    "VFE",
    "elbo",
    "elbo_fx",
    "posterior_vfe",
    "ApproxPosteriorGP",
    "SparseFiniteGP",
]
