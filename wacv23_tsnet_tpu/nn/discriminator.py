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


class PixelDiscriminator(nn.Module):
    """1x1 PixelGAN discriminator (reference networks.py:609-638).

    Vestigial in TS-Net (SURVEY.md C7) but part of the `define_D` zoo.
    """

    ndf: int = 64
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(kernel_init=conv_init, dtype=self.dtype,
                  precision=self.precision)
        x = nn.Conv(self.ndf, (1, 1), name="conv0", **kw)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ndf * 2, (1, 1), name="conv1", **kw)(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (1, 1), name="conv2", **kw)(x)


class VideoDiscriminator(nn.Module):
    """DCGAN-style full-image discriminator (reference networks.py:641-677).

    Six stride-2 4x4 convs 256^2 -> 4^2 then a 4x4 VALID conv to
    `out_nc`, flattened per sample. Vestigial in TS-Net (SURVEY.md C7).
    """

    out_nc: int = 16
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(kernel_init=conv_init, use_bias=False, dtype=self.dtype,
                  precision=self.precision)
        widths = [self.ndf * m for m in (1, 2, 4, 8, 16, 32)]
        for i, ch in enumerate(widths):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"conv{i}", **kw)(x)
            if i > 0:
                x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.out_nc, (4, 4), padding="VALID", name="conv_out",
                    **kw)(x)
        return x.reshape(x.shape[0], -1)


class PatchDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bwd_precision: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        from .blocks import DPConv
        kw = dict(kernel_init=conv_init, dtype=self.dtype,
                  precision=self.precision,
                  bwd_precision=self.bwd_precision)
        feats = []
        pad = ((1, 1), (1, 1))
        x = DPConv(self.ndf, (4, 4), strides=(2, 2), padding=pad,
                   name="stage0", **kw)(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = DPConv(self.ndf * nf, (4, 4), strides=(2, 2), padding=pad,
                       name=f"stage{n}", **kw)(x)
            x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(2 ** self.n_layers, 8)
        x = DPConv(self.ndf * nf, (4, 4), strides=(1, 1), padding=pad,
                   name=f"stage{self.n_layers}", **kw)(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        x = DPConv(1, (4, 4), strides=(1, 1), padding=pad,
                   name=f"stage{self.n_layers + 1}", **kw)(x)
        feats.append(x)
        return feats


def define_D(ndf: int, net_d: str = "basic", n_layers_d: int = 3, **kwargs):
    """Discriminator factory (reference define_D, networks.py:163-207)."""
    if net_d == "basic":
        return PatchDiscriminator(ndf=ndf, n_layers=3, **kwargs)
    if net_d == "n_layers":
        return PatchDiscriminator(ndf=ndf, n_layers=n_layers_d, **kwargs)
    if net_d == "pixel":
        return PixelDiscriminator(ndf=ndf, **kwargs)
    raise NotImplementedError(f"Discriminator model name [{net_d}] "
                              "is not recognized")
