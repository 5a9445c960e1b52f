from cross_attention_renderer_tpu.utils.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_imagenet,
    resize_bilinear,
    upsample2x_align_corners,
)

__all__ = ['IMAGENET_MEAN', 'IMAGENET_STD', 'normalize_imagenet',
           'resize_bilinear', 'upsample2x_align_corners']
