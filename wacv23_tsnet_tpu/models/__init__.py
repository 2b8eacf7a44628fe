from .tsnet import TSNetModules, tsnet_forward, tsnet_forward_clip, crop_faces
from .api import TSNet

__all__ = ["TSNetModules", "tsnet_forward", "tsnet_forward_clip",
           "crop_faces", "TSNet"]
