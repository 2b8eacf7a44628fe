"""TS-Net decoder (reference model/TSNet.py:128-174).

A 1x1 `map_conv` fuses the concatenated warp-branch and synthesis-branch
features (2*feat_ch -> feat_ch), then `n_blocks` ResNet blocks, then
`n_downsampling` [bilinear-2x upsample, reflect-pad 3x3 conv halving
channels, IN, ReLU] stages, then a 7x7 conv + tanh to RGB. Also returns
the penultimate feature map (reference `return_fea=True`, used by the
drivers; model/TSNet.py:162-171).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import instance_norm
from ..ops.resize import upsample_bilinear_2x
from .blocks import ResnetBlock, conv_init, reflect_pad


class Decoder(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 0
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, prop_fea: jnp.ndarray, syn_fea: jnp.ndarray):
        x = jnp.concatenate([prop_fea, syn_fea], axis=-1)
        mult = 2 ** self.n_downsampling
        x = nn.Conv(self.ngf * mult, (1, 1), kernel_init=conv_init,
                    dtype=self.dtype, precision=self.precision, name="map_conv")(x)
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf * mult, dtype=self.dtype, precision=self.precision,
                            name=f"block{j}")(x)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = upsample_bilinear_2x(x)
            x = reflect_pad(x, 1)
            x = nn.Conv(self.ngf * mult // 2, (3, 3), padding="VALID",
                        kernel_init=conv_init, dtype=self.dtype, precision=self.precision,
                        name=f"up{i}")(x)
            x = instance_norm(x)
            x = nn.relu(x)
        fea = x
        x = reflect_pad(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                    kernel_init=conv_init, dtype=self.dtype, precision=self.precision,
                    name="conv_out")(x)
        return jnp.tanh(x), fea
