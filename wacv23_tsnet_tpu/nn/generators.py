"""pix2pix-style generator zoo (reference model/networks.py:120-160,319-539).

These are part of the reference's network zoo (`define_G`,
ResnetGenerator, UnetGenerator) but are NOT used by TS-Net itself
(SURVEY.md C4 marks them vestigial). Provided for capability parity so
reference-style experiments port directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import instance_norm
from ..ops.resize import upsample_bilinear_2x
from .blocks import ResnetBlock, conv_init, reflect_pad


class ResnetGenerator(nn.Module):
    """7x7 stem, 2 downsamples, n resblocks, 2 upsamples, 7x7 + tanh.

    Mirrors reference ResnetGenerator (networks.py:319-389) with
    InstanceNorm and reflect padding; transposed convs are replaced by
    the TPU-friendlier bilinear-upsample + conv (same receptive field,
    no checkerboarding).
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 6
    n_downsampling: int = 2
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(kernel_init=conv_init, dtype=self.dtype,
                  precision=self.precision)
        x = reflect_pad(x, 3)
        x = nn.Conv(self.ngf, (7, 7), padding="VALID", name="conv_in", **kw)(x)
        x = nn.relu(instance_norm(x))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}", **kw)(x)
            x = nn.relu(instance_norm(x))
        mult = 2 ** self.n_downsampling
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf * mult, dtype=self.dtype,
                            precision=self.precision, name=f"block{j}")(x)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = upsample_bilinear_2x(x)
            x = reflect_pad(x, 1)
            x = nn.Conv(self.ngf * mult // 2, (3, 3), padding="VALID",
                        name=f"up{i}", **kw)(x)
            x = nn.relu(instance_norm(x))
        x = reflect_pad(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                    name="conv_out", **kw)(x)
        return jnp.tanh(x)


class UnetGenerator(nn.Module):
    """U-Net generator with `num_downs` levels (networks.py:392-539)."""

    output_nc: int = 3
    ngf: int = 64
    num_downs: int = 7
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(kernel_init=conv_init, dtype=self.dtype,
                  precision=self.precision)
        chans = [min(self.ngf * (2 ** i), self.ngf * 8)
                 for i in range(self.num_downs)]
        skips = []
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}", **kw)(x)
            if 0 < i < self.num_downs - 1:
                x = instance_norm(x)
            skips.append(x)
            if i < self.num_downs - 1:
                x = nn.leaky_relu(x, 0.2)
        for i in reversed(range(self.num_downs)):
            x = nn.relu(x)
            out_ch = self.output_nc if i == 0 else chans[i - 1]
            x = upsample_bilinear_2x(x)
            x = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"up{i}", **kw)(x)
            if i > 0:
                x = instance_norm(x)
                x = jnp.concatenate([skips[i - 1], x], axis=-1)
        return jnp.tanh(x)


def define_G(output_nc: int, ngf: int, net_g: str, **kwargs):
    """Generator factory (reference define_G, networks.py:120-160)."""
    if net_g == "resnet_9blocks":
        return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=9,
                               **kwargs)
    if net_g == "resnet_6blocks":
        return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=6,
                               **kwargs)
    if net_g == "unet_128":
        return UnetGenerator(output_nc=output_nc, ngf=ngf, num_downs=7,
                             **kwargs)
    if net_g == "unet_256":
        return UnetGenerator(output_nc=output_nc, ngf=ngf, num_downs=8,
                             **kwargs)
    raise NotImplementedError(f"Generator model name [{net_g}] "
                              "is not recognized")
