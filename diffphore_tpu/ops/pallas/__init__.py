"""Pallas TPU kernels for the hot ops.

The profile of the score-network forward (see PARITY.md "known gaps") is
op-granularity bound: ~26 tensor-product convolutions emit ~12 small path
einsums each, and XLA's per-op overhead dominates the ~3 ms of irreducible
VPU math.  The kernel plan fuses each convolution's {edge-weight masking ->
per-path CG contraction -> sender reduction} into one pallas_call:

  step 1 (this module): scalar-path aggregate kernel - the (l_in=0) paths,
         which carry ~40% of the channels and need no CG tensor;
  step 2: the l>0 paths with unrolled nonzero Wigner-3j entries;
  step 3: whole-conv fusion including the edge MLP's second matmul.
"""

from .tp_scalar import scalar_path_aggregate  # noqa: F401
