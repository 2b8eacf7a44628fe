"""Space-to-depth ("folded") stem convolution for the encoder.

The encoders' first layer (reference model/TSNet.py:52-125: reflect-pad 3
+ 7x7 conv to ngf channels) reads a 5-channel input at 256^2 for the
shipped face config (label_nc=2 + 3 CoordConv channels). On the MXU that
conv contracts over 49 x 5 input features but the systolic array loads
the channel axis onto 128 lanes — 5/128 occupancy, measured ~29 ms/clip
of the label encoder's 31.9 ms (the three downsampling convs behind it
run at >=64 lanes and cost ~3 ms together).

`stem_conv7_fold4` computes the SAME conv in 4x4-folded space:

    x (B, H, W, Ci) --space-to-depth 4x4--> (B, H/4, W/4, 16 Ci)
    7x7 kernel      --exact scatter------> (3, 3, 16 Ci, 16 Co)
    VALID 3x3 conv  -> (B, H/4, W/4, 16 Co)   [phase layout]

The folded kernel is a pure SCATTER of the original taps (a 0/1
placement matrix on each spatial axis, built at trace time): every
product of the original conv appears exactly once, so the folded conv is
the identical sum up to reassociation with structural zeros. Input-lane
occupancy rises 16x (80/128 for the 5-channel stem) and the output side
lands on 16*Co = 1024 lanes.

Border semantics: the original reflect-pad(3) happens BEFORE folding (on
the unpadded tensor), then the padded 262^2 map is zero-extended to
264^2 so it folds evenly; the placement mask provably never selects the
two garbage rows/cols (tap index t = 4q + r - p <= 6 caps the reach).

The result stays in phase layout so the instance norm that follows can
run grouped (stats over the 16 phase copies of each channel == stats of
the interleaved tensor), and only the post-norm activation pays the
depth-to-space relayout — one fused XLA pass instead of a dedicated one.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.blocks import reflect_pad

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def fold_kernel(kernel: jnp.ndarray, fold: int = 4) -> jnp.ndarray:
    """(K, K, Ci, Co) -> (S, S, fold^2 Ci, fold^2 Co) exact scatter of
    the taps into folded space, S = (K + fold - 2)//fold + 1.

    Tap t of the original conv lands at folded offset q, input phase r,
    output phase p iff t = fold*q + r - p (module docstring). Built as
    a pure GATHER from a zero-padded copy of the kernel — bit-exact
    copies of the tap values (an einsum against a 0/1 placement mask
    would run the scatter through the MXU and round the weights to
    bf16 at default precision — caught on chip at the bit-parity tier,
    maxerr 2e-2). Channel layouts match space_to_depth below:
    (ry * fold + rx) * Ci + ci."""
    kh, kw, ci, co = kernel.shape
    s = (kh + fold - 2) // fold + 1
    pad_hi = fold * (s - 1) + (fold - 1) + 1 - kh  # max t index + 1 - kh
    k7p = jnp.pad(kernel, ((fold - 1, pad_hi), (fold - 1, pad_hi),
                           (0, 0), (0, 0)))
    q = np.arange(s)[:, None, None]
    r = np.arange(fold)[None, :, None]
    p = np.arange(fold)[None, None, :]
    it = fold * q + r - p + (fold - 1)             # (S, fold, fold) >= 0
    it = jnp.asarray(it)
    kf = k7p[it[:, None, :, None, :, None],
             it[None, :, None, :, None, :]]        # (S,S,ry,rx,py,px,i,o)
    kf = kf.transpose(0, 1, 2, 3, 6, 4, 5, 7)      # S S ry rx i py px o
    return kf.reshape(s, s, fold * fold * ci, fold * fold * co)


def space_to_depth(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // fold, fold, w // fold, fold, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // fold, w // fold, fold * fold * c)


def depth_to_space(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    cc = c // (fold * fold)
    x = x.reshape(b, h, w, fold, fold, cc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * fold, w * fold, cc)


def stem_conv7_fold4(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, precision: str = "highest",
                     fold: int = 4) -> jnp.ndarray:
    """[reflect_pad(3) -> 7x7 VALID conv] in 4x4-folded space.

    Args: x (B, H, W, Ci) with H, W divisible by `fold`; kernel
    (7, 7, Ci, Co); bias (Co,). Returns the PHASE-LAYOUT output
    (B, H/fold, W/fold, fold^2 Co); `depth_to_space(y, fold)` is the
    interleaved (B, H, W, Co) tensor. Exact vs the direct conv up to
    sum reassociation (the folded kernel is a scatter, not a rounding).
    """
    assert kernel.shape[0] == kernel.shape[1] == 7
    prec = _PREC[precision]
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    pad = 3
    xp = reflect_pad(x, pad)
    # zero-extend (H + 6) to the next fold multiple; the placement mask
    # never reaches the extension rows (t <= 6 bound)
    ext = (-(h + 2 * pad)) % fold
    xp = jnp.pad(xp, ((0, 0), (0, ext), (0, ext), (0, 0)))
    xf = space_to_depth(xp, fold)
    kf = fold_kernel(kernel.astype(jnp.float32), fold).astype(x.dtype)
    yf = jax.lax.conv_general_dilated(
        xf, kf, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return yf + jnp.tile(bias.astype(yf.dtype), fold * fold)


def instance_norm_grouped(x: jnp.ndarray, groups: int,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm of a phase-layout tensor: statistics per (batch,
    base channel) across spatial AND the `groups` phase copies —
    identical to instance_norm of the interleaved tensor."""
    b, h, w, c = x.shape
    cc = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w * groups, cc)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=1, keepdims=True)
                      - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.reshape(b, h, w, c).astype(x.dtype)
