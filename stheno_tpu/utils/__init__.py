from stheno_tpu.utils.cost import cost_analysis, cost_summary
from stheno_tpu.utils.testing import check_process_interface, check_finite_gp

__all__ = [
    "check_process_interface",
    "check_finite_gp",
    "cost_analysis",
    "cost_summary",
]
