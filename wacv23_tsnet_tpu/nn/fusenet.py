"""Synthesis branch FuseNet (reference model/TSNet.py:177-200).

concat(source image feature, target label feature) -> one ResNet block at
the doubled width -> 1x1 conv back to feat_ch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ResnetBlock, conv_init


class FuseNet(nn.Module):
    ngf: int = 1024   # concatenated width (2 * feat_ch)
    n_blocks: int = 1
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, src_fea: jnp.ndarray, tar_lbl_fea: jnp.ndarray):
        x = jnp.concatenate([src_fea, tar_lbl_fea], axis=-1)
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf, dtype=self.dtype, precision=self.precision, name=f"block{j}")(x)
        x = nn.Conv(self.ngf // 2, (1, 1), kernel_init=conv_init,
                    dtype=self.dtype, precision=self.precision, name="conv")(x)
        return x
