"""Multi-chip distribution: mesh helpers, sharded chains (DP), row-sharded
kernel matrices + distributed Cholesky (TP / SP-analogue).  See SURVEY.md
§2.3 for the mapping from the parallelism template to this GP framework."""

from stheno_tpu.parallel.mesh import (
    chains_mesh,
    rows_mesh,
    grid_mesh,
    shard_rows,
)
from stheno_tpu.parallel.chains import run_nuts_sharded, run_smc_sharded
from stheno_tpu.parallel.cholesky import (
    distributed_cholesky,
    distributed_cholesky_auto,
    distributed_cholesky_cyclic,
    distributed_solve_lower,
    distributed_solve_upper_T,
    distributed_chol_solve,
    distributed_logdet_chol,
    distributed_lower_matvec,
    distributed_mvn_logpdf,
)
from stheno_tpu.parallel.gppp import (
    sharded_cov,
    sharded_chol,
    sharded_logpdf,
    sharded_rand,
    sharded_posterior,
    ShardedPosteriorGP,
)
from stheno_tpu.parallel.big import (
    sharded_kernelmatrix,
    sharded_matvec,
    big_gp_logpdf,
)
from stheno_tpu.parallel.svgp import (
    svgp_elbo_dp,
    data_mesh,
    shard_batch,
)
from stheno_tpu.parallel.ring import (
    ring_matvec,
    pcg_solve,
    ring_gp_solve,
    ring_posterior_mean_var,
)

__all__ = [
    "svgp_elbo_dp",
    "data_mesh",
    "shard_batch",
    "chains_mesh",
    "rows_mesh",
    "grid_mesh",
    "shard_rows",
    "run_nuts_sharded",
    "run_smc_sharded",
    "distributed_cholesky",
    "distributed_cholesky_auto",
    "distributed_cholesky_cyclic",
    "distributed_solve_lower",
    "distributed_solve_upper_T",
    "distributed_chol_solve",
    "distributed_logdet_chol",
    "distributed_lower_matvec",
    "distributed_mvn_logpdf",
    "sharded_cov",
    "sharded_chol",
    "sharded_logpdf",
    "sharded_rand",
    "sharded_posterior",
    "ShardedPosteriorGP",
    "sharded_kernelmatrix",
    "sharded_matvec",
    "big_gp_logpdf",
    "ring_matvec",
    "pcg_solve",
    "ring_gp_solve",
    "ring_posterior_mean_var",
]
