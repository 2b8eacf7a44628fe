"""Shared building blocks (flax.linen, NHWC).

Conventions shared by every TS-Net module (reference model/TSNet.py:10-49,
model/networks.py:13-35,67-104):

- reflection padding before VALID convs;
- InstanceNorm without affine parameters;
- normal(std=0.02) conv kernel init, zero bias ("normal" init_type of
  reference networks.init_weights).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.dpconv import conv2d_dp
from ..ops.norms import instance_norm

conv_init = nn.initializers.normal(stddev=0.02)


class DPConv(nn.Module):
    """`nn.Conv` with a decoupled backward MXU precision (ops.dpconv).

    Parameter tree ({kernel, bias}, HWIO) and forward math are identical
    to `flax.linen.Conv`; with `bwd_precision=None` the lowering is the
    plain conv under normal AD. Only the argument subset TS-Net uses is
    supported (2D, no dilation/groups).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    use_bias: bool = True
    kernel_init: Callable = conv_init
    dtype: Any = jnp.float32
    precision: Any = None
    bwd_precision: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (x.shape[-1], self.features),
            jnp.float32)
        y = conv2d_dp(x.astype(self.dtype), kernel.astype(self.dtype),
                      self.strides, self.padding,
                      precision=self.precision,
                      bwd_precision=self.bwd_precision)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def get_initializer(init_type: str = "normal", init_gain: float = 0.02):
    """Weight-init factory (reference init_weights, networks.py:67-104):
    normal | xavier | kaiming | orthogonal."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier":
        return nn.initializers.variance_scaling(
            init_gain ** 2, "fan_avg", "truncated_normal")
    if init_type == "kaiming":
        return nn.initializers.kaiming_normal()
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


def get_norm_layer(norm_type: str = "instance"):
    """Norm factory (reference get_norm_layer, networks.py:17-35).

    Returns a callable `x -> x`. TS-Net uses "instance" everywhere
    (affine-free, no running stats); "batch" would need train-state
    plumbing flax-side and, being unused by every shipped config, maps to
    a LayerNorm-free GroupNorm(1 group == batch-free alternative) is NOT
    provided — requesting it raises, documenting the gap explicitly
    rather than silently changing semantics.
    """
    from ..ops.norms import instance_norm

    if norm_type == "instance":
        return instance_norm
    if norm_type == "none":
        return lambda x: x
    if norm_type == "batch":
        raise NotImplementedError(
            "batch norm is vestigial in the reference (never used by a "
            "shipped TS-Net config) and needs mutable batch-stats state; "
            "use 'instance' or 'none'")
    raise NotImplementedError(
        f"normalization layer [{norm_type}] is not found")


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Spatial reflection padding of an NHWC tensor (torch ReflectionPad2d)."""
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class RingDPConv(nn.Module):
    """reflect_pad(p) + DPConv(VALID) without materializing the pad.

    Same parameter tree ({kernel, bias}) and the same sums as the padded
    pair (ops.reflectconv: zero-pad conv + thin border-band correction
    convs; interiors bit-identical, borders differ at float rounding) —
    checkpoint-compatible drop-in. The padded formulation costs a full
    off-tile HBM copy of the activation per conv in BOTH directions
    (measured 37.5 ms/step of the bs=15 train step, round-5 trace);
    this one costs four 3p-row band convs.
    """

    features: int
    kernel_size: Tuple[int, int]
    pad: int = 1
    use_bias: bool = True
    kernel_init: Callable = conv_init
    dtype: Any = jnp.float32
    precision: Any = None
    bwd_precision: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.reflectconv import conv2d_reflect_dp

        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (x.shape[-1], self.features),
            jnp.float32)
        y = conv2d_reflect_dp(x.astype(self.dtype), kernel.astype(self.dtype),
                              self.pad, precision=self.precision,
                              bwd_precision=self.bwd_precision)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ResnetBlock(nn.Module):
    """reflect-pad 3x3 conv + IN + ReLU, reflect-pad 3x3 conv + IN, +skip.

    Matches reference model/TSNet.py:10-49 with padding_type='reflect',
    no dropout.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bwd_precision: Optional[str] = None
    ring_pad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def rconv(t, name):
            if self.ring_pad:
                return RingDPConv(self.dim, (3, 3), pad=1,
                                  kernel_init=conv_init, dtype=self.dtype,
                                  precision=self.precision,
                                  bwd_precision=self.bwd_precision,
                                  name=name)(t)
            return DPConv(self.dim, (3, 3), padding="VALID",
                          kernel_init=conv_init, dtype=self.dtype,
                          precision=self.precision,
                          bwd_precision=self.bwd_precision,
                          name=name)(reflect_pad(t, 1))

        h = rconv(x, "conv1")
        h = instance_norm(h)
        h = nn.relu(h)
        h = rconv(h, "conv2")
        h = instance_norm(h)
        return x + h
