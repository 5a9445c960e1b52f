"""Hot-path ops: bilinear epipolar gathers and fused epipolar attention.

The PRODUCTION gather is the packed-cell formulation in ``grid_sample.py``
(``pack_pyramid`` + ``grid_sample_pyramid_packed``). Measured-loss Pallas
alternatives live under ``ops.experimental``; see BENCH_NOTES.md for the
numbers behind each verdict.
"""

from cross_attention_renderer_tpu.ops.grid_sample import (
    grid_sample,
    grid_sample_packed,
    grid_sample_pyramid,
    grid_sample_pyramid_packed,
    grid_sample_pyramid_parts,
    pack_cells,
    pack_pyramid,
)
# NOTE: the fused-attention function shares its module's name; re-export it
# under an alias so `ops.epipolar_attention` stays the module.
from cross_attention_renderer_tpu.ops.epipolar_attention import (
    epipolar_attention as fused_epipolar_attention,
    epipolar_attention_reference,
)
from cross_attention_renderer_tpu.ops import epipolar_attention  # module
from cross_attention_renderer_tpu.ops.pallas_gather import (
    grid_sample_auto,
    grid_sample_pallas,
)

__all__ = ['epipolar_attention', 'epipolar_attention_reference',
           'fused_epipolar_attention', 'grid_sample', 'grid_sample_auto',
           'grid_sample_packed', 'grid_sample_pallas',
           'grid_sample_pyramid', 'grid_sample_pyramid_packed',
           'grid_sample_pyramid_parts', 'pack_cells', 'pack_pyramid']
