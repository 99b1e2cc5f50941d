"""Research implementations that lost their A/B against the default path.

`experimental.pallas` holds the Pallas TPU kernels (fused pairwise kernel
matrices, in-VMEM base-case Cholesky / triangular inverse).  All three were
benchmarked against the XLA defaults at N=16k on v5e and LOST (BASELINE.md
negative results; docs/internals.md "Pallas verdict"), so nothing routes to
them — they remain importable for future hardware generations and as
reference Pallas patterns, and are still conformance-tested in
tests/test_ops.py (interpret mode).
"""
