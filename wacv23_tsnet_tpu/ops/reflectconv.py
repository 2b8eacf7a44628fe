"""Reflect-padded convolution without materializing the padded tensor.

The reference's generators reflect-pad every ResNet-block conv and the
7x7 stem/output convs (model/TSNet.py:10-49 ReflectionPad2d). On TPU,
`jnp.pad(mode="reflect")` lowers to concatenates of reversed slices: a
full extra HBM copy of the activation per conv, in an off-tile layout
(34-row tensors), on both the forward AND the pad-transpose in the
backward. The round-5 device trace measured this single line at
37.5 ms/step of the bs=15 train step (artifacts/round5/train_trace.py —
`nn/blocks.py reflect_pad`), all of it data movement.

STATUS: measured and REJECTED as the default
(artifacts/round5/ring_pad_ab.json, both formulations, real chip):

    train bs=15 256² bench tier:  457 (pad) vs 512 ms/step (ring, DUS)
    clip 256f bench tier:         719 (pad) vs 645 fps    (ring, DUS)

The thin-band corrections are nearly free, but XLA has no cheap way to
PLACE them: dynamic-update-slice copies the whole output per border,
and zero-expand+add materializes four full-size tensors (520 ms / 382
fps — worse still). The reflect pad's one materialized copy beats every
composed alternative; beating it would need a custom output-fusion
kernel, and the round-3/4 record shows hand kernels losing to XLA's
conv pipelining at these shapes. Kept behind `TSNetConfig.ring_pad`
(default False) as the documented, equality-tested, measured rejection.

`conv2d_reflect_dp` computes the SAME sums without ever building the
padded tensor:

    conv(reflect_pad(x, p), k, VALID)
      = conv(x, k, zero-pad p)                 # fuses into the conv; free
      + corrections from the four pad bands    # thin (3p-row) conv each

The kernel taps that would have read pad positions are partitioned into
four disjoint zones (rows above / below, columns left / right of the
image, with the corners assigned to the row bands via their column
reflect-extension), and each zone's contribution is itself a small
convolution over a band of mirrored border rows/columns stacked with
zeros. Interior outputs are bit-identical to the padded conv (same taps,
zero padding contributes nothing); border outputs differ only by
float summation order.

Backward: every piece is a conv/slice/flip, so AD (and the
dual-precision `conv2d_dp` custom vjp) applies unchanged — in
particular the pad-transpose scatter of the padded formulation
disappears from the backward as well.
"""

from __future__ import annotations

import jax.numpy as jnp

from .dpconv import conv2d_dp


def _top_band_correction(x, kernel, p, precision, bwd_precision):
    """Contribution of pad rows -p..-1 (values x[p..1], columns
    reflect-extended so the two top corners are covered) to output rows
    0..p-1. Returns (B, p, W, Co)."""
    b, _, w, c = x.shape
    band = jnp.flip(x[:, 1:p + 1], axis=1)            # rows -p..-1
    band = jnp.pad(band, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")
    v = jnp.concatenate(
        [band, jnp.zeros((b, 2 * p, w + 2 * p, c), x.dtype)], axis=1)
    return conv2d_dp(v, kernel, (1, 1), "VALID",
                     precision=precision, bwd_precision=bwd_precision)


def _left_band_correction(x, kernel, p, precision, bwd_precision):
    """Contribution of pad columns -p..-1 restricted to real rows
    (corners excluded — they belong to the row bands) to output columns
    0..p-1. Returns (B, H, p, Co)."""
    b, h, _, c = x.shape
    band = jnp.flip(x[:, :, 1:p + 1], axis=2)         # cols -p..-1
    v = jnp.concatenate(
        [band, jnp.zeros((b, h, 2 * p, c), x.dtype)], axis=2)
    return conv2d_dp(v, kernel, (1, 1), ((p, p), (0, 0)),
                     precision=precision, bwd_precision=bwd_precision)


def conv2d_reflect_dp(x: jnp.ndarray, kernel: jnp.ndarray, p: int,
                      precision=None, bwd_precision=None) -> jnp.ndarray:
    """conv(reflect_pad(x, p), kernel, VALID) with no materialized pad.

    `kernel` is (2p+1, 2p+1, Cin, Co) HWIO; `x` is NHWC with H, W > 2p
    (every shipped shape). Same-math-different-order vs the padded
    conv: interiors are exact, borders differ at float rounding.
    """
    kh, kw = kernel.shape[:2]
    if kh != 2 * p + 1 or kw != 2 * p + 1:
        raise ValueError(f"kernel {kernel.shape[:2]} does not match pad {p}")
    y = conv2d_dp(x, kernel, (1, 1), ((p, p), (p, p)),
                  precision=precision, bwd_precision=bwd_precision)

    h, w = x.shape[1], x.shape[2]
    top = _top_band_correction(x, kernel, p, precision, bwd_precision)
    bot = jnp.flip(_top_band_correction(
        jnp.flip(x, axis=1), jnp.flip(kernel, axis=0), p,
        precision, bwd_precision), axis=1)
    left = _left_band_correction(x, kernel, p, precision, bwd_precision)
    right = jnp.flip(_left_band_correction(
        jnp.flip(x, axis=2), jnp.flip(kernel, axis=1), p,
        precision, bwd_precision), axis=2)

    # Border placement: .at[].add (dynamic-update-slice) measured BETTER
    # than zero-expand-and-add (the pads do not fuse; four full-size
    # zero-expanded tensors: 520 ms/step / 382 fps vs 512 / 645), but
    # both LOSE to the plain reflect_pad formulation end to end — see
    # the module docstring.
    y = y.at[:, :p].add(top)
    y = y.at[:, -p:].add(bot)
    y = y.at[:, :, :p].add(left)
    y = y.at[:, :, -p:].add(right)
    return y
