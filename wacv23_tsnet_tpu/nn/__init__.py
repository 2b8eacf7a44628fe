from .blocks import ResnetBlock, reflect_pad, conv_init
from .encoder import Encoder
from .decoder import Decoder
from .fusenet import FuseNet
from .discriminator import (PatchDiscriminator, PixelDiscriminator,
                            VideoDiscriminator, define_D)
from .generators import ResnetGenerator, UnetGenerator, define_G
from .vgg import VGG19Features, load_vgg19_params

__all__ = [
    "ResnetBlock",
    "reflect_pad",
    "conv_init",
    "Encoder",
    "Decoder",
    "FuseNet",
    "PatchDiscriminator",
    "PixelDiscriminator",
    "VideoDiscriminator",
    "define_D",
    "ResnetGenerator",
    "UnetGenerator",
    "define_G",
    "VGG19Features",
    "load_vgg19_params",
]
