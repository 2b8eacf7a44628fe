from .blocks import ResnetBlock, reflect_pad, conv_init
from .encoder import Encoder
from .decoder import Decoder
from .fusenet import FuseNet
from .discriminator import PatchDiscriminator
from .vgg import VGG19Features, load_vgg19_params

__all__ = [
    "ResnetBlock",
    "reflect_pad",
    "conv_init",
    "Encoder",
    "Decoder",
    "FuseNet",
    "PatchDiscriminator",
    "VGG19Features",
    "load_vgg19_params",
]
