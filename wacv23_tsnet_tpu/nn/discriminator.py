"""70x70 PatchGAN discriminator (reference model/networks.py:542-606).

Returns the intermediate activations of all five stages
(`getIntermFeat=True`, the configuration TS-Net trains with,
model/TSNet.py:230): the first four feed the feature-matching loss, the
last is the patch logit map.

Torch shape notes reproduced exactly: 4x4 kernels, stride 2 pad 1 on the
first three stages (halving), stride 1 pad 1 on the last two (shrinking
by one pixel each). InstanceNorm (no affine) on stages 1..3; convs keep
their bias (torch `use_bias=True` for InstanceNorm discriminators).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import instance_norm
from .blocks import conv_init


class PatchDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        pad = ((1, 1), (1, 1))
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=conv_init, dtype=self.dtype, precision=self.precision, name="stage0")(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=pad,
                        kernel_init=conv_init, dtype=self.dtype, precision=self.precision,
                        name=f"stage{n}")(x)
            x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=pad,
                    kernel_init=conv_init, dtype=self.dtype, precision=self.precision,
                    name=f"stage{self.n_layers}")(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=pad,
                    kernel_init=conv_init, dtype=self.dtype, precision=self.precision,
                    name=f"stage{self.n_layers + 1}")(x)
        feats.append(x)
        return feats
