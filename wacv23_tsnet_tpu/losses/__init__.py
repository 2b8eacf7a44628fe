from .gan import lsgan_loss, feature_matching_loss
from .perceptual import vgg_perceptual_loss
from .image import gradient_loss, l1_loss, cosine_align_loss, renorm_to_reference

__all__ = [
    "lsgan_loss",
    "feature_matching_loss",
    "vgg_perceptual_loss",
    "gradient_loss",
    "l1_loss",
    "cosine_align_loss",
    "renorm_to_reference",
]
