"""L1 image encoder backbones (Flax, NHWC, explicit activation taps)."""

from cross_attention_renderer_tpu.encoders.dpt import DPTHybridEncoder
from cross_attention_renderer_tpu.encoders.resnetv2 import ResNetV2Stem
from cross_attention_renderer_tpu.encoders.spatial import SpatialEncoder
from cross_attention_renderer_tpu.encoders.unet import UNetEncoder
from cross_attention_renderer_tpu.encoders.vit import MultiViewViT

__all__ = ['DPTHybridEncoder', 'MultiViewViT', 'ResNetV2Stem',
           'SpatialEncoder', 'UNetEncoder']
