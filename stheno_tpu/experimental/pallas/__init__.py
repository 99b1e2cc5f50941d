"""Hand-written Pallas TPU kernels for the hot paths.  Every kernel has a
pure-XLA fallback in stheno_tpu.ops; these exist to push the flagship
pipeline toward the roofline (BASELINE.md)."""

from stheno_tpu.experimental.pallas.kernelmatrix import pairwise_kernelmatrix

__all__ = ["pairwise_kernelmatrix"]
