"""L5 data layer: dataset loaders + synthetic scenes."""

from cross_attention_renderer_tpu.data.synthetic import make_scene

__all__ = ['make_scene']
