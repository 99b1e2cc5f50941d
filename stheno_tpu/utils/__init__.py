from stheno_tpu.utils.testing import check_process_interface, check_finite_gp

__all__ = ["check_process_interface", "check_finite_gp"]
