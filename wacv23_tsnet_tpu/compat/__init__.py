from .torch_import import (
    convert_conv_kernel,
    encoder_params_from_torch,
    decoder_params_from_torch,
    fusenet_params_from_torch,
    discriminator_params_from_torch,
    generator_params_from_checkpoint,
    load_reference_checkpoint,
)
from .torch_export import (
    reference_checkpoint,
    save_reference_checkpoint,
)
from .reference_loop import (
    load_reference_tsnet,
    load_reference_tsnet_pose,
    run_reference_clip,
)

__all__ = [
    "convert_conv_kernel",
    "encoder_params_from_torch",
    "decoder_params_from_torch",
    "fusenet_params_from_torch",
    "discriminator_params_from_torch",
    "generator_params_from_checkpoint",
    "load_reference_checkpoint",
    "reference_checkpoint",
    "save_reference_checkpoint",
    "load_reference_tsnet",
    "load_reference_tsnet_pose",
    "run_reference_clip",
]
