from .torch_import import (
    convert_conv_kernel,
    encoder_params_from_torch,
    decoder_params_from_torch,
    fusenet_params_from_torch,
    discriminator_params_from_torch,
    generator_params_from_checkpoint,
    load_reference_checkpoint,
)

__all__ = [
    "convert_conv_kernel",
    "encoder_params_from_torch",
    "decoder_params_from_torch",
    "fusenet_params_from_torch",
    "discriminator_params_from_torch",
    "generator_params_from_checkpoint",
    "load_reference_checkpoint",
]
