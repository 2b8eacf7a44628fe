"""Fused FuseNet pair block for clip inference: one Pallas kernel runs
[pair-sum -> instance-norm -> relu -> reflect-pad -> 3x3 conv2] per
(source, frame) pair entirely in VMEM.

Context (reference math model/TSNet.py:177-200, split form
nn/fusenet.fuse_clip): with S sources x F frames the block's second conv
is per-pair — at the shipped face shape that is 7.4 TFLOP per 128-frame
clip, HALF of the whole model's FLOPs. Measured under XLA
(artifacts/round3/probe_fuse): pair-sum+IN+relu 13.1 ms/clip (three HBM
passes over the 805 MB `hp` tensor) + conv2 47.2 ms at 40% MFU.

This kernel removes the HBM-resident `hp` entirely (it is built,
normalized, relu'd and padded in a VMEM scratch once per pair) and runs
conv2 as row-contiguous MXU dots:

  * for each kernel row dy, the padded activation rows [dy, dy+32) form
    a CONTIGUOUS (32*34, K) matrix — no per-tap strided extraction (the
    9-slice im2col in ops.pallas_conv pays 9 VMEM relayouts per step);
  * one dot per dy against the (K, 3*Co_tile) repacked weights computes
    all three column taps at once (6% extra FLOPs on the two pad
    columns, zero copies);
  * the three column taps land as cheap shifted adds on the fp32
    accumulator.

Output is the raw per-pair conv2 result `h2` (B=S*F, H, W, K); the
instance-norm + mean-over-sources stays in ops.pallas_norms.
instance_norm_mean (one more read of h2, fused there). The conv BIAS is
intentionally absent: a per-channel constant cancels in that norm.

Inference-only (no VJP): training keeps the XLA composition in
fuse_train. Like every pallas_call this is opaque to GSPMD — fuse_clip
wraps it in shard_map over the frame axis under a parallel.spmd mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _kernel(c1a_ref, c1t_ref, w_ref, o_ref, xp_ref, *, h: int, w: int,
            co: int, wp: int, eps: float):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _build_hp():
        xb = (c1a_ref[0].astype(jnp.float32)
              + c1t_ref[0].astype(jnp.float32))          # (H, W, K)
        n = h * w
        mean = jnp.mean(xb, axis=(0, 1), keepdims=True)
        var = jnp.maximum(
            jnp.mean(xb * xb, axis=(0, 1), keepdims=True) - mean * mean,
            0.0)
        hp = jnp.maximum((xb - mean) * jax.lax.rsqrt(var + eps), 0.0)
        hp = hp.astype(xp_ref.dtype)
        xp_ref[1:h + 1, 1:w + 1] = hp
        # reflect pad(1): rows from the interior, then columns from the
        # already-padded rows so corners come out right
        xp_ref[0:1, 1:w + 1] = hp[1:2]
        xp_ref[h + 1:h + 2, 1:w + 1] = hp[h - 2:h - 1]
        xp_ref[:, 0:1] = xp_ref[:, 2:3]
        xp_ref[:, w + 1:w + 2] = xp_ref[:, w - 1:w]
        if wp > w + 2:
            # sublane-alignment padding columns: zeroed once so the
            # (discarded) dot rows they produce stay finite
            xp_ref[:, w + 2:] = jnp.zeros((h + 2, wp - w - 2,
                                           xp_ref.shape[-1]),
                                          xp_ref.dtype)

    k = c1a_ref.shape[-1]
    acc = jnp.zeros((h, w, co), jnp.float32)
    for dy in range(3):
        # (h, WP, K) leading-dim slice; WP % 8 == 0 keeps the merge
        # into (h*WP, K) a pure view of the (sublane, lane) tiling —
        # at WP = w + 2 = 34 it is a relayout copy per dot (measured
        # 0.72x vs XLA; aligned it wins)
        rows = xp_ref[dy:dy + h].reshape(h * wp, k)
        z = jax.lax.dot(rows, w_ref[dy].reshape(k, 3 * co),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
        for dx in range(3):
            # lane-tile-aligned column slice first, row shift second
            zc = z[:, dx * co:(dx + 1) * co].reshape(h, wp, co)
            acc = acc + zc[:, dx:dx + w]
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def fuse_pair_conv2(c1a: jnp.ndarray, c1t: jnp.ndarray,
                    k2: jnp.ndarray, co_tile: int = 128,
                    eps: float = 1e-5) -> jnp.ndarray:
    """conv2(reflect_pad(relu(IN(c1a[s] + c1t[f])))) for all S x F pairs.

    Args:
      c1a: (S, H, W, K) conv1 source halves (bias-free).
      c1t: (F, H, W, K) conv1 target halves (+ conv1 bias).
      k2:  (3, 3, K, K) HWIO conv2 weights (bias dropped by the caller —
           it cancels in the instance norm that follows).

    Returns h2 (S, F, H, W, K) in c1a's dtype. Matches the XLA
    composition at the bf16 fast-tail tier (single-pass dots, fp32
    accumulation and statistics).
    """
    s, h, w, k = c1a.shape
    f = c1t.shape[0]
    co = k2.shape[-1]
    co_tile = min(co_tile, co)
    assert co % co_tile == 0
    n_co = co // co_tile
    wp = w + 2 + (-(w + 2)) % 8          # sublane-aligned padded width
    # (dy, dx, K, Co) -> (dy, K, dx, Co): per-dy row dots then column
    # shifts; dx must be adjacent to Co for the (K, 3*co_tile) reshape
    k2r = jnp.transpose(k2, (0, 2, 1, 3)).astype(c1a.dtype)

    kern = functools.partial(_kernel, h=h, w=w, co=co_tile, wp=wp,
                             eps=eps)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s, f, h, w, co), c1a.dtype),
        grid=(f, s, n_co),
        in_specs=[
            pl.BlockSpec((1, h, w, k), lambda fi, si, ji: (si, 0, 0, 0)),
            pl.BlockSpec((1, h, w, k), lambda fi, si, ji: (fi, 0, 0, 0)),
            pl.BlockSpec((3, k, 3, co_tile),
                         lambda fi, si, ji: (0, 0, 0, ji)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w, co_tile),
                               lambda fi, si, ji: (si, fi, 0, 0, ji)),
        scratch_shapes=[pltpu.VMEM((h + 2, wp, k), c1a.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(c1a, c1t, k2r)
