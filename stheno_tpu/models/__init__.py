"""Model families: the five BASELINE.json workloads as reusable, parametric
builders (the library counterpart of examples/).  Each builder is a pure
function of hyperparameters usable under jit/grad, following the
`build_model(θ)` pattern (SURVEY.md §3.6)."""

from stheno_tpu.models.workloads import (
    process_decomposition,
    sensor_fusion,
    mauna_loa_style,
    pseudo_points_model,
    hyperparameter_model,
    WORKLOADS,
)

__all__ = [
    "process_decomposition",
    "sensor_fusion",
    "mauna_loa_style",
    "pseudo_points_model",
    "hyperparameter_model",
    "WORKLOADS",
]
