from .tsnet import (TSNetModules, tsnet_forward, tsnet_forward_clip,
                    encode_sources, decode_with_sources, crop_faces)
from .api import TSNet

__all__ = ["TSNetModules", "tsnet_forward", "tsnet_forward_clip",
           "encode_sources", "decode_with_sources", "crop_faces", "TSNet"]
