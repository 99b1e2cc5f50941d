"""Numerical hot-path ops.

`pairwise` — MXU-friendly pairwise (squared) distances / inner products.
`chol`     — Cholesky factorisation, triangular solves, MvNormal logpdf.
`pallas/`  — hand-written Pallas TPU kernels for the hottest paths; every op
             here has a pure-XLA fallback so the library runs anywhere.
"""

from stheno_tpu.ops.pairwise import (
    pairwise_sqdist,
    pairwise_dist,
    pairwise_dot,
    sqdist_diag,
)
from stheno_tpu.ops.chol import (
    cholesky_psd,
    solve_lower,
    solve_upper,
    chol_solve,
    mvn_logpdf_chol,
)

__all__ = [
    "pairwise_sqdist",
    "pairwise_dist",
    "pairwise_dot",
    "sqdist_diag",
    "cholesky_psd",
    "solve_lower",
    "solve_upper",
    "chol_solve",
    "mvn_logpdf_chol",
]
