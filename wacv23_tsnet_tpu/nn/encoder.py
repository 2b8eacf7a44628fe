"""TS-Net encoder trunk (reference model/TSNet.py:52-125).

7x7 reflect-pad conv to ngf channels, `n_downsampling` stride-2 3x3 convs
doubling channels, then `n_blocks` ResNet blocks. Optional CoordConv
input channels and L2 channel normalization of the output.

Used twice in TS-Net (model/TSNet.py:218-223):
- image encoder: input (3 + label_nc) channels, 9 resblocks;
- label encoder: input label_nc channels, 0 resblocks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.coords import coord_channels
from ..ops.norms import instance_norm, l2_normalize
from .blocks import ResnetBlock, conv_init, reflect_pad


class Encoder(nn.Module):
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    addcoords: bool = False
    normalization: bool = False
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.addcoords:
            x = coord_channels(x)
        x = reflect_pad(x, 3)
        x = nn.Conv(self.ngf, (7, 7), padding="VALID", kernel_init=conv_init,
                    dtype=self.dtype, precision=self.precision, name="conv_in")(x)
        x = instance_norm(x)
        x = nn.relu(x)
        for i in range(self.n_downsampling):
            x = nn.Conv(self.ngf * (2 ** (i + 1)), (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), kernel_init=conv_init,
                        dtype=self.dtype, precision=self.precision, name=f"down{i}")(x)
            x = instance_norm(x)
            x = nn.relu(x)
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf * (2 ** self.n_downsampling),
                            dtype=self.dtype, precision=self.precision, name=f"block{j}")(x)
        if self.normalization:
            x = l2_normalize(x, axis=-1)
        return x
