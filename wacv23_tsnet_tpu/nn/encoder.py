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
import jax
import jax.numpy as jnp

from typing import Optional

from ..ops.coords import coord_channels
from ..ops.norms import instance_norm, l2_normalize
from .blocks import DPConv, ResnetBlock, conv_init, reflect_pad


class Encoder(nn.Module):
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    addcoords: bool = False
    normalization: bool = False
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bwd_precision: Optional[str] = None
    ring_pad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.addcoords:
            x = coord_channels(x)
        if self.ring_pad:
            from .blocks import RingDPConv
            x = RingDPConv(self.ngf, (7, 7), pad=3, kernel_init=conv_init,
                           dtype=self.dtype, precision=self.precision,
                           bwd_precision=self.bwd_precision,
                           name="conv_in")(x)
        else:
            x = reflect_pad(x, 3)
            x = DPConv(self.ngf, (7, 7), padding="VALID",
                       kernel_init=conv_init, dtype=self.dtype,
                       precision=self.precision,
                       bwd_precision=self.bwd_precision, name="conv_in")(x)
        x = instance_norm(x)
        x = nn.relu(x)
        for i in range(self.n_downsampling):
            x = DPConv(self.ngf * (2 ** (i + 1)), (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), kernel_init=conv_init,
                       dtype=self.dtype, precision=self.precision,
                       bwd_precision=self.bwd_precision, name=f"down{i}")(x)
            x = instance_norm(x)
            x = nn.relu(x)
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf * (2 ** self.n_downsampling),
                            dtype=self.dtype, precision=self.precision,
                            bwd_precision=self.bwd_precision,
                            ring_pad=self.ring_pad,
                            name=f"block{j}")(x)
        if self.normalization:
            x = l2_normalize(x, axis=-1)
        return x


def encoder_apply_fast(enc: Encoder, params: dict,
                       x: jnp.ndarray) -> jnp.ndarray:
    """`Encoder.__call__` with the stem computed in 4x4-folded space.

    Identical math and param tree. The 7x7 stem conv reads only
    label_nc + 3 input channels (5 for the shipped face config) — 5/128
    MXU lane occupancy, measured ~29 of the label encoder's 31.9 ms/clip.
    `ops.stemconv.stem_conv7_fold4` runs the exact same contraction at
    16x the lane occupancy (the folded kernel is a scatter of the
    original taps, not an approximation); the instance norm runs grouped
    in phase layout and only the post-norm activation pays the
    depth-to-space relayout. Everything after the stem is the module's
    own composition (reference math: model/TSNet.py:52-125).
    """
    from ..ops.stemconv import (_PREC, depth_to_space, instance_norm_grouped,
                                stem_conv7_fold4)
    dt = enc.dtype
    prec = _PREC[enc.precision]
    if enc.addcoords:
        x = coord_channels(x)
    x = x.astype(dt)

    def conv(t, p, stride=1, pad=0):
        if pad:
            t = reflect_pad(t, pad)
        return jax.lax.conv_general_dilated(
            t, jnp.asarray(p["kernel"], dt), (stride, stride),
            "VALID" if pad or stride == 1 else ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec) + jnp.asarray(p["bias"], dt)

    fold = 4
    yf = stem_conv7_fold4(x, jnp.asarray(params["conv_in"]["kernel"], dt),
                          jnp.asarray(params["conv_in"]["bias"], dt),
                          precision=enc.precision, fold=fold)
    yf = nn.relu(instance_norm_grouped(yf, fold * fold))
    x = depth_to_space(yf, fold)
    for i in range(enc.n_downsampling):
        x = nn.relu(instance_norm(conv(x, params[f"down{i}"], stride=2)))
    for j in range(enc.n_blocks):
        blk = params[f"block{j}"]
        h = nn.relu(instance_norm(conv(x, blk["conv1"], pad=1)))
        x = x + instance_norm(conv(h, blk["conv2"], pad=1))
    if enc.normalization:
        x = l2_normalize(x, axis=-1)
    return x
