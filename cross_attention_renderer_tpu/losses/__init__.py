"""L3 losses."""

from cross_attention_renderer_tpu.losses.lf_loss import (
    LFLoss,
    depth_smoothness_loss,
    image_loss,
    total_loss,
)

__all__ = ['LFLoss', 'depth_smoothness_loss', 'image_loss', 'total_loss']
