"""Mesh parallelism: DP/TP/ray-SP over jax.sharding meshes; multi-host
process management in :mod:`.distributed`."""

from cross_attention_renderer_tpu.parallel.distributed import (
    global_scene,
    initialize,
    is_primary,
    make_global_mesh,
    process_batch_slice,
)
from cross_attention_renderer_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
    scene_shardings,
)

__all__ = ['global_scene', 'initialize', 'is_primary', 'make_global_mesh',
           'make_mesh', 'param_shardings', 'param_spec',
           'process_batch_slice', 'replicated', 'scene_shardings']
