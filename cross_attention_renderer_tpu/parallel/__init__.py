"""Mesh parallelism: DP/TP/ray-SP over jax.sharding meshes."""

from cross_attention_renderer_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
    scene_shardings,
)

__all__ = ['make_mesh', 'param_shardings', 'param_spec', 'replicated',
           'scene_shardings']
