"""Hot-path ops: bilinear epipolar gather and fused epipolar attention.

XLA reference implementations plus Pallas TPU kernels.
"""

from cross_attention_renderer_tpu.ops.grid_sample import (
    grid_sample,
    grid_sample_pyramid,
)

__all__ = ['grid_sample', 'grid_sample_pyramid']
