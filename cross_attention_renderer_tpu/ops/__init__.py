"""Hot-path ops: bilinear epipolar gathers and the fused render kernels.

The PRODUCTION TPU hot path is: packed-cell stacked row-takes
(``grid_sample.py``: ``pack_pyramid`` + ``cell_rows_and_slot_weights``)
feeding either the fused exchange epilogue (``gather_epilogue.py``) + the
fused joint-softmax attention (``epipolar_attention.py``), or the
fully-fused render core (``fused_render.py``, both stages in one kernel).
Measured-loss Pallas alternatives live under ``ops.experimental``; see
BENCH_NOTES.md for the numbers behind each verdict.
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
from cross_attention_renderer_tpu.ops.gather_epilogue import (
    fused_exchange_epilogue,
)
from cross_attention_renderer_tpu.ops.fused_render import (
    fused_render_core,
)

__all__ = ['epipolar_attention', 'epipolar_attention_reference',
           'fused_epipolar_attention', 'fused_exchange_epilogue',
           'fused_render_core', 'grid_sample', 'grid_sample_auto',
           'grid_sample_packed', 'grid_sample_pallas',
           'grid_sample_pyramid', 'grid_sample_pyramid_packed',
           'grid_sample_pyramid_parts', 'pack_cells', 'pack_pyramid']
