"""Fused [reflect-pad 3x3 conv -> instance-norm (-> relu | + skip)]
Pallas kernel for the decoder's ResNet blocks at clip-inference scale.

The decoder's four 512-ch blocks at 32^2 measure ~12 ms/clip each under
XLA (conv -> IN two-pass -> relu -> conv -> IN -> add as separate HBM
passes; ~52% MFU), against a ~6.3 ms/block bf16 compute floor
(reference math: model/TSNet.py:10-49, shapes SURVEY.md §2.4). This
kernel runs one whole frame per grid step entirely in VMEM:

  * the 3x3 reflect pad is materialized once into a (H+2, W+2, C)
    scratch (1.2 MB at decoder shape) — no HBM-resident padded tensor;
  * the conv is 3 row-contiguous (H*(W+2), C) @ (C, 3*Co) MXU dots
    (one per kernel row; the padded rows are contiguous in the scratch
    so no per-tap extraction copies) whose three column taps land as
    shifted adds on the fp32 accumulator;
  * instance-norm statistics, normalize, relu / residual add all happen
    on the fp32 accumulator before the single bf16 HBM write-back.

The conv BIAS is intentionally absent: a per-channel constant cancels
exactly in the instance norm's mean subtraction (same argument as
ops/upconv.upconv_in_relu).

Inference-only: no custom VJP (training keeps the XLA composition,
whose autodiff is exercised by the train step). Like every pallas_call
this is opaque to GSPMD — callers under a parallel.spmd mesh get the
shard_map wrapping via ops.similarity's `_BATCH_MESH` context, same as
the transformation kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _kernel(x_ref, w_ref, *args, relu: bool, eps: float, h: int, w: int,
            has_skip: bool):
    if has_skip:
        skip_ref, o_ref, xp_ref = args
    else:
        (o_ref, xp_ref) = args
    c = x_ref.shape[-1]
    co = w_ref.shape[-1]

    xb = x_ref[0]                                        # (H, W, C)
    # reflect pad into scratch: rows first (from x), then columns
    # (from the already-padded rows, so corners come out right)
    xp_ref[1:h + 1, 1:w + 1] = xb
    xp_ref[0:1, 1:w + 1] = xb[1:2]
    xp_ref[h + 1:h + 2, 1:w + 1] = xb[h - 2:h - 1]
    xp_ref[:, 0:1] = xp_ref[:, 2:3]
    xp_ref[:, w + 1:w + 2] = xp_ref[:, w - 1:w]

    # row-contiguous dots (see ops.pallas_fuse): one dot per kernel row
    # over the padded rows — no per-tap strided extraction (the 9-slice
    # im2col form pays 9 VMEM relayouts per step) — then the three
    # column taps land as shifted adds on the fp32 accumulator.
    wp = w + 2
    acc = jnp.zeros((h, w, co), jnp.float32)
    for dy in range(3):
        rows = xp_ref[dy:dy + h].reshape(h * wp, c)      # contiguous
        z = jax.lax.dot(rows, w_ref[dy].reshape(c, 3 * co),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
        zv = z.reshape(h, wp, 3, co)
        for dx in range(3):
            acc = acc + zv[:, dx:dx + w, dx]

    n = h * w
    acc = acc.reshape(n, co)
    mean = jnp.sum(acc, axis=0, keepdims=True) / n       # (1, Co)
    var = jnp.maximum(
        jnp.sum(acc * acc, axis=0, keepdims=True) / n - mean * mean, 0.0)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    if relu:
        y = jnp.maximum(y, 0.0)
    if has_skip:
        y = y + skip_ref[0].reshape(h * w, co).astype(jnp.float32)
    o_ref[0] = y.reshape(h, w, co).astype(o_ref.dtype)


def conv3x3_in(x: jnp.ndarray, kernel: jnp.ndarray,
               skip: jnp.ndarray | None = None, relu: bool = True,
               eps: float = 1e-5) -> jnp.ndarray:
    """Fused `instance_norm(conv3x3(reflect_pad(x)))` (+ relu or + skip).

    Args:
      x:      (B, H, W, C) activations (bf16 fast-tail tier).
      kernel: (3, 3, C, Co) HWIO weights (bias-free; see module doc).
      skip:   optional (B, H, W, Co) residual added AFTER the norm
              (the ResnetBlock's second half); mutually exclusive in
              the reference math with `relu`.
      relu:   apply relu after the norm (the block's first half).

    Returns (B, H, W, Co), same dtype as x. Exact vs the XLA
    composition up to matmul reassociation (single-pass bf16 dots —
    the decoder fast-tail tier this kernel serves).
    """
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    kern = functools.partial(_kernel, relu=relu, eps=eps, h=h, w=w,
                             has_skip=skip is not None)
    # (dy, dx, C, Co) -> (dy, C, dx, Co): dx adjacent to Co for the
    # per-dy (C, 3*Co) row-dot reshape
    k2r = jnp.transpose(kernel, (0, 2, 1, 3)).astype(x.dtype)
    in_specs = [
        pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((3, c, 3, co), lambda i: (0, 0, 0, 0)),
    ]
    operands = [x, k2r]
    if skip is not None:
        in_specs.append(pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0)))
        operands.append(skip)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)


def resblock_fused(x: jnp.ndarray, conv1_kernel: jnp.ndarray,
                   conv2_kernel: jnp.ndarray, eps: float = 1e-5):
    """One reference ResnetBlock (model/TSNet.py:10-49):
    `x + IN(conv2(relu(IN(conv1(x)))))`, both convs reflect-padded 3x3,
    as two fused kernel launches."""
    hmid = conv3x3_in(x, conv1_kernel, relu=True, eps=eps)
    return conv3x3_in(hmid, conv2_kernel, skip=x, relu=False, eps=eps)
