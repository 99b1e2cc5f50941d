"""First-class inference engines (the reference delegates these to its
ecosystem — README.md:243-258; here they are in-library, SURVEY.md §2.3).

- `hmc` — NUTS / HMC with Stan-style window adaptation, vmapped chains
- `vi`  — optax optimisation loops for nlml / ELBO objectives
- `smc` — adaptive-tempering SMC with systematic resampling
- `diagnostics` — split-R̂ and bulk ESS (on-device)
"""

from stheno_tpu.inference.hmc import (
    nuts_kernel,
    hmc_kernel,
    run_nuts,
    nuts_warmup,
    warmup_result,
    WarmupState,
    NUTSInfo,
    ChainState,
)
from stheno_tpu.inference.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    checkpoint_step,
)
from stheno_tpu.inference.vi import fit, fit_lbfgs, FitResult
from stheno_tpu.inference.svgp import (
    SVGP,
    svgp_init,
    svgp_elbo,
    svgp_posterior,
    svgp_optimal_gaussian,
    SVGPPosteriorGP,
)
from stheno_tpu.inference.likelihoods import (
    Likelihood,
    GaussianLikelihood,
    BernoulliLikelihood,
    PoissonLikelihood,
    StudentTLikelihood,
)
from stheno_tpu.inference.laplace import (
    laplace,
    LaplaceResult,
    LaplacePosteriorGP,
)
from stheno_tpu.inference.smc import (
    run_smc,
    smc_init,
    smc_segment,
    smc_finished,
    smc_result,
    SMCCheckpoint,
    SMCResult,
)
from stheno_tpu.inference.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
)

__all__ = [
    "nuts_kernel",
    "hmc_kernel",
    "run_nuts",
    "nuts_warmup",
    "warmup_result",
    "WarmupState",
    "NUTSInfo",
    "ChainState",
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_step",
    "SVGP",
    "svgp_init",
    "svgp_elbo",
    "svgp_posterior",
    "svgp_optimal_gaussian",
    "SVGPPosteriorGP",
    "fit",
    "fit_lbfgs",
    "FitResult",
    "Likelihood",
    "GaussianLikelihood",
    "BernoulliLikelihood",
    "PoissonLikelihood",
    "StudentTLikelihood",
    "laplace",
    "LaplaceResult",
    "LaplacePosteriorGP",
    "run_smc",
    "smc_init",
    "smc_segment",
    "smc_finished",
    "smc_result",
    "SMCCheckpoint",
    "SMCResult",
    "effective_sample_size",
    "potential_scale_reduction",
]
