from .coords import coord_channels, normalized_grid
from .norms import instance_norm, l2_normalize
from .resize import resize_nearest, upsample_bilinear_2x, resize_bilinear
from .grid_sample import grid_sample
from .warp import patch_warp, space_to_depth, depth_to_space
from .similarity import masked_attention_flow, transformation_warp

__all__ = [
    "coord_channels",
    "normalized_grid",
    "instance_norm",
    "l2_normalize",
    "resize_nearest",
    "resize_bilinear",
    "upsample_bilinear_2x",
    "grid_sample",
    "patch_warp",
    "space_to_depth",
    "depth_to_space",
    "masked_attention_flow",
    "transformation_warp",
]
