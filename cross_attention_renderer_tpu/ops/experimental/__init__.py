"""Measured-loss kernels kept as documented alternatives, NOT production.

Every kernel in this package is real, tested (interpret-mode parity), and
was benchmarked against the production path on a v5e chip — and lost at
flagship shapes (numbers in BENCH_NOTES.md). They are retained because the
measurements are part of the engineering record and the designs become
relevant again if the op balance shifts (e.g. much wider fused work per
sorted stream). The PRODUCTION epipolar gather is the packed-cell XLA
formulation in ``ops/grid_sample.py``.

  * ``banded_gather``  — band-skipping one-hot MXU gather (loses to the
    tightened take; env ``CAR_BANDED_GATHER=1`` to compare).
  * ``fused_mlp``      — VMEM-resident 2-layer MLP chain (106 vs 99 ms per
    block; env ``CAR_FUSED_MLP=1`` to compare).
"""

from cross_attention_renderer_tpu.ops.experimental.banded_gather import (
    grid_sample_banded,
)
from cross_attention_renderer_tpu.ops.experimental.fused_mlp import fused_mlp2

__all__ = ['grid_sample_banded', 'fused_mlp2']
