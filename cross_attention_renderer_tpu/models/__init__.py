"""L2 model / renderer layer."""

from cross_attention_renderer_tpu.models.renderer import CrossAttentionRenderer
from cross_attention_renderer_tpu.models.resnet_fc import ResnetBlockFC, ResnetFC

__all__ = ['CrossAttentionRenderer', 'ResnetBlockFC', 'ResnetFC']
