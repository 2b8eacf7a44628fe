"""Dual-precision convolution: forward and backward at different MXU tiers.

The training tier runs fp32 activations at `precision="high"` — every
conv is three bf16 MXU passes (bf16x3). The backward pass of a conv is
two more convs (input-cotangent and filter-gradient), and by default XLA
derives them at the SAME precision as the primal, so the backward costs
3 passes per conv too. But gradient signals tolerate far more rounding
than the forward activations do (the forward feeds the temp-100
attention, where bf16 rounding flips the argmax — see
configs.TSNetConfig.precision; the backward only feeds Adam, whose
update is dominated by the 1e-8/sqrt(v) normalization and the GAN's own
gradient noise).

`conv2d_dp` decouples the two: the primal conv runs at `precision`, and
a `jax.custom_vjp` emits the two backward convs at `bwd_precision`
(e.g. one bf16 pass instead of three). The backward convs are built
with `jax.linear_transpose`, which transposes the low-precision conv
WITHOUT executing a forward pass, so the only cost difference is the
MXU pass count. With `bwd_precision=None` (or equal tiers) this is
exactly `lax.conv_general_dilated` under normal AD — bit-identical,
zero overhead.

No reference analog: the torch reference trains everything in fp32
(model/TSNet.py:432-460). This is the TPU-native equivalent of mixed
precision training's "bf16 backward" recipe, applied per-conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_DN = ("NHWC", "HWIO", "NHWC")


def canon_precision(p):
    """'highest'|'high'|'default'|None|lax.Precision -> lax.Precision|None."""
    if p is None or isinstance(p, jax.lax.Precision):
        return p
    return _PREC[p]


@functools.lru_cache(maxsize=None)
def _dp_conv_fn(strides, padding, fwd_prec, bwd_prec, dn):
    def conv(x, w, prec):
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn, precision=prec)

    @jax.custom_vjp
    def f(x, w):
        return conv(x, w, fwd_prec)

    def fwd(x, w):
        # residuals (x, w) match what default AD saves — no extra memory
        return conv(x, w, fwd_prec), (x, w)

    def bwd(res, g):
        x, w = res
        # conv is linear in each operand; linear_transpose derives the
        # transposed conv symbolically (no primal execution), carrying
        # bwd_prec on the emitted conv ops
        gx = jax.linear_transpose(lambda t: conv(t, w, bwd_prec), x)(g)[0]
        gw = jax.linear_transpose(lambda t: conv(x, t, bwd_prec), w)(g)[0]
        return gx, gw

    f.defvjp(fwd, bwd)
    return f


def conv2d_dp(x: jnp.ndarray, w: jnp.ndarray,
              strides=(1, 1), padding="VALID",
              precision=None, bwd_precision=None,
              dimension_numbers=_DN) -> jnp.ndarray:
    """`lax.conv_general_dilated` whose backward runs at `bwd_precision`.

    With `bwd_precision=None` or equal to `precision`, returns the plain
    conv (normal AD, bit-identical). Both precisions accept the string
    tiers of `TSNetConfig.precision` or `jax.lax.Precision` values.
    """
    fp = canon_precision(precision)
    bp = canon_precision(bwd_precision)
    if bp is None or bp == fp:
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dimension_numbers,
            precision=fp)
    if not isinstance(padding, str):
        padding = tuple(tuple(p) for p in padding)
    return _dp_conv_fn(tuple(strides), padding, fp, bp,
                       tuple(dimension_numbers))(x, w)
