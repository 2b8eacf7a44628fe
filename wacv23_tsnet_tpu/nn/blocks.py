"""Shared building blocks (flax.linen, NHWC).

Conventions shared by every TS-Net module (reference model/TSNet.py:10-49,
model/networks.py:13-35,67-104):

- reflection padding before VALID convs;
- InstanceNorm without affine parameters;
- normal(std=0.02) conv kernel init, zero bias ("normal" init_type of
  reference networks.init_weights).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import instance_norm

conv_init = nn.initializers.normal(stddev=0.02)


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Spatial reflection padding of an NHWC tensor (torch ReflectionPad2d)."""
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    """reflect-pad 3x3 conv + IN + ReLU, reflect-pad 3x3 conv + IN, +skip.

    Matches reference model/TSNet.py:10-49 with padding_type='reflect',
    no dropout.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", kernel_init=conv_init,
                    dtype=self.dtype, precision=self.precision, name="conv1")(h)
        h = instance_norm(h)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", kernel_init=conv_init,
                    dtype=self.dtype, precision=self.precision, name="conv2")(h)
        h = instance_norm(h)
        return x + h
