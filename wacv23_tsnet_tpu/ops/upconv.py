"""Phase-decomposed [bilinear-2x upsample -> reflect-pad -> 3x3 conv].

The decoder's upsample stages (reference model/TSNet.py:144-153) compute
a 3x3 conv on the 2x-bilinear-upsampled tensor. On TPU that shape is
hostile: the conv runs at the DOUBLED resolution with the HALVED channel
count, underutilizing the 128x128 MXU, and the upsampled intermediate
(4x the input pixels) makes a round trip through HBM.

Because both the upsample and the conv are linear, the composition is
itself a convolution of the INPUT — one 3x3 kernel per output phase
(py, px) in {0,1}^2. With half-pixel centers (align_corners=False),
output row 2i+p of the upsample reads

    u[2i]   = 0.25 x[i-1] + 0.75 x[i]        (edge-clamped at i=0)
    u[2i+1] = 0.75 x[i]   + 0.25 x[i+1]      (edge-clamped at i=H-1)

so a 3-tap conv over u collapses to a 3-tap conv over x with
phase-mixed weights (W1D below). The fused op therefore runs ONE conv at
input resolution with 4x the output channels — MXU-shaped — followed by
a free depth-to-space interleave. FLOPs are identical; the upsampled
intermediate never exists.

Edge exactness: the interior identity assumes unclamped upsample taps
and no reflection, which fails on a 2-pixel ring of the output (the
upsample clamps at the borders and the conv pad reflects the upsampled
tensor, neither of which is expressible as a padding of x). The ring is
recomputed exactly with the reference composition on 3-pixel slabs of
the input — O(H) work — and overwritten, so the op is EXACT everywhere,
not approximately equal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resize import upsample_bilinear_2x

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

# W1D[p, k, d]: coefficient of x[i + d - 1] in upsample tap u[2i + p + k - 1]
# (the k-th of the three rows a VALID 3-tap conv reads for output 2i + p).
_W1D = jnp.asarray(
    [
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]],
        [[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]],
    ],
    jnp.float32,
)


def _conv(x: jnp.ndarray, k: jnp.ndarray, precision) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def _reference(x: jnp.ndarray, kernel: jnp.ndarray, precision) -> jnp.ndarray:
    """The unfused composition (also the correctness oracle in tests)."""
    u = upsample_bilinear_2x(x)
    u = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return _conv(u, kernel, precision)


def phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) conv kernel -> (3, 3, Ci, 4*Co) phase kernel.

    Output channel layout: ((py * 2 + px) * Co + o), matching
    `depth_to_space` below.
    """
    # HIGHEST: this einsum runs at trace time on TPU, where the default
    # precision would compute the derived kernel itself in single-pass
    # bf16 — a ~0.4% relative weight corruption that CPU tests never see
    # (measured 0.39 max output drift on the f32 bit-parity path).
    w = _W1D.astype(kernel.dtype)
    kp = jnp.einsum("pad,qbe,abio->deipqo", w, w, kernel,
                    precision=jax.lax.Precision.HIGHEST)
    kh, kw, ci, co = kernel.shape
    return kp.reshape(kh, kw, ci, 4 * co)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) with ((py*2+px)*C + c) channel layout -> (B, 2H, 2W, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


# Border tap matrices: coefficient of (x[0], x[1]) in the three upsample
# taps a VALID 3-tap conv reads for output rows 0 (phase p=0) and 1
# (p=1) at the CLAMPED + reflect-padded top edge:
#   u[0] = x[0] (clamp), u[1] = .75 x0 + .25 x1, u[2] = .25 x0 + .75 x1,
#   pad row u[-1] = u[1] (reflect).
# _T_EDGE[p, k, a] = weight of x[a] in the k-th tap for output row p.
# The bottom edge is the exact mirror: taps reversed, (x0, x1) ->
# (x[H-1], x[H-2]).
_T_EDGE = jnp.asarray(
    [
        [[0.75, 0.25], [1.0, 0.0], [0.75, 0.25]],   # row 0: u1, u0, u1
        [[1.0, 0.0], [0.75, 0.25], [0.25, 0.75]],   # row 1: u0, u1, u2
    ],
    jnp.float32,
)
# mirror: _T_EDGE reversed in taps and in (x0, x1), expressed directly
# against (x[H-2], x[H-1]) for outputs (2H-2, 2H-1)
_T_EDGE_BOT = jnp.asarray(
    [
        [[0.75, 0.25], [0.25, 0.75], [0.0, 1.0]],   # row 2H-2
        [[0.25, 0.75], [0.0, 1.0], [0.25, 0.75]],   # row 2H-1
    ],
    jnp.float32,
)

_HI = jax.lax.Precision.HIGHEST


def _ring_kernels(kernel: jnp.ndarray):
    """Derived kernels for the exact border ring of
    [upsample2x -> reflect_pad(1) -> conv3x3].

    The 2-pixel output border is linear in the first/last TWO input
    rows/cols (clamped upsample taps + reflect padding never reach
    further), so each border strip collapses to a small conv kernel and
    each corner to a (2, 2, Ci, 4Co) contraction. All derivations run at
    trace time in fp32/HIGHEST (see `phase_kernel`).

    Returns (k_top, k_bot, k_left, k_right, corners) where
      k_top/k_bot:    (2, 3, Ci, 4Co) — row taps over x[{:2,-2:}],
                      col taps standard W1D, output 1 phase row
      k_left/k_right: (3, 2, Ci, 4Co) — col taps over x[:, {:2,-2:}]
      corners:        dict {(vs, hs): (2, 2, Ci, 4Co)} for
                      vs, hs in {0 (near edge), 1 (far edge)}.
    Channel layout matches `phase_kernel`: ((py*2+px)*Co + o).
    """
    k = kernel.astype(jnp.float32)
    w = _W1D
    kh, kw, ci, co = kernel.shape

    def strip_rows(t_edge):
        # K[a, d, i, p, q, o] = sum_{ky,kx} T[p,ky,a] W[q,kx,d] k[ky,kx,i,o]
        kk = jnp.einsum("pka,qxd,kxio->adipqo", t_edge, w, k, precision=_HI)
        return kk.reshape(2, 3, ci, 4 * co)

    def strip_cols(t_edge):
        kk = jnp.einsum("pkd,qxa,kxio->daipqo", w, t_edge, k, precision=_HI)
        return kk.reshape(3, 2, ci, 4 * co)

    corners = {}
    for vs, tv in ((0, _T_EDGE), (1, _T_EDGE_BOT)):
        for hs, th in ((0, _T_EDGE), (1, _T_EDGE_BOT)):
            cc = jnp.einsum("pka,qxb,kxio->abipqo", tv, th, k,
                            precision=_HI)
            corners[(vs, hs)] = cc.reshape(2, 2, ci, 4 * co)
    return (strip_rows(_T_EDGE), strip_rows(_T_EDGE_BOT),
            strip_cols(_T_EDGE), strip_cols(_T_EDGE_BOT), corners)


def _ring_phase(x: jnp.ndarray, kernel: jnp.ndarray, prec):
    """Exact border ring in phase layout, via the closed-form border
    kernels (no upsampled slabs, no relayout transposes).

    Returns (top, bot, left, right): top/bot (B, 1, W, 4Co) — border
    phase-COLS 0 and W-1 are zero-padded don't-cares (the left/right
    strips own them, including corners); left/right (B, H, 1, 4Co).
    """
    kt, kb, kl, kr, kc = _ring_kernels(kernel)
    dt_ = x.dtype
    cast = lambda a: a.astype(dt_)

    def c2(xs, kk):
        return _conv(xs, cast(kk), prec)

    top = c2(x[:, :2], kt)                       # (B, 1, W-2, 4Co)
    bot = c2(x[:, -2:], kb)
    left = c2(x[:, :, :2], kl)                   # (B, H-2, 1, 4Co)
    right = c2(x[:, :, -2:], kr)

    def corner(xs, kk):
        # (B, 2, 2, Ci) x (2, 2, Ci, 4Co) -> (B, 1, 1, 4Co)
        return jnp.einsum("nabi,abio->no", xs, cast(kk),
                          precision=prec)[:, None, None, :]

    tl = corner(x[:, :2, :2], kc[(0, 0)])
    tr = corner(x[:, :2, -2:], kc[(0, 1)])
    bl = corner(x[:, -2:, :2], kc[(1, 0)])
    br = corner(x[:, -2:, -2:], kc[(1, 1)])

    pad_w = ((0, 0), (0, 0), (1, 1), (0, 0))
    top = jnp.pad(top, pad_w)
    bot = jnp.pad(bot, pad_w)
    left = jnp.concatenate([tl, left, bl], axis=1)
    right = jnp.concatenate([tr, right, br], axis=1)
    return top, bot, left, right


def _to_phase_rows(y: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 2W, C) interleaved rows -> (B, 1, W, 4C) phase layout."""
    b, _, w2, c = y.shape
    w = w2 // 2
    y = y.reshape(b, 1, 2, w, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 1, w, 4 * c)


def _to_phase_cols(y: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2, C) interleaved cols -> (B, H, 1, 4C) phase layout."""
    b, h2, _, c = y.shape
    h = h2 // 2
    y = y.reshape(b, h, 2, 1, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h, 1, 4 * c)


def upsample2x_reflect_conv3(x: jnp.ndarray, kernel: jnp.ndarray,
                             bias: jnp.ndarray | None = None,
                             precision: str = "highest",
                             phase_out: bool = False) -> jnp.ndarray:
    """Exact fused [upsample_bilinear_2x -> reflect_pad(1) -> conv3x3 VALID].

    Args:
      x:      (B, H, W, Ci), H, W >= 3.
      kernel: (3, 3, Ci, Co) HWIO conv kernel.
      bias:   optional (Co,).
      phase_out: return the (B, H, W, 4*Co) phase-layout tensor instead
        of interleaving — callers that keep computing in the phase
        domain (instance_norm_phase, conv7x7_phase) skip the
        depth-to-space round trip entirely.

    Returns (B, 2H, 2W, Co) — or its phase layout — bit-comparable to
    the composition up to matmul reassociation.
    """
    prec = _PREC[precision] if isinstance(precision, str) else precision
    b, h, w, _ = x.shape

    kp = phase_kernel(kernel)
    # zero padding (free in the conv): it only corrupts the border ring,
    # which the slab recomputation below overwrites with exact values
    y = jax.lax.conv_general_dilated(
        x, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec)                              # (B, H, W, 4Co) phase

    # exact 2-pixel border ring via closed-form border kernels
    # (`_ring_kernels`): each strip is a thin 2-tap conv on the edge
    # rows/cols of x — no upsampled slabs, no relayout transposes
    # (the former slab composition measured ~6 ms/stage at clip scale).
    # How the ring lands is chosen by measurement (the chip's
    # ~280 GB/s effective HBM makes every full-tensor pass count):
    # when the result is immediately interleaved (depth_to_space), two
    # concats beat four chained dynamic-update-slices (full copies
    # under XLA) by ~2.6 ms/stage; when the result stays in phase
    # layout feeding instance_norm_phase, the DUS form fuses better
    # with the downstream reduction and wins by ~7 ms.
    top, bot, left, right = _ring_phase(x, kernel, prec)
    if phase_out:
        y = y.at[:, :1].set(top)
        y = y.at[:, -1:].set(bot)
        y = y.at[:, :, :1].set(left)
        y = y.at[:, :, -1:].set(right)
    else:
        y = jnp.concatenate([top, y[:, 1:-1], bot], axis=1)
        y = jnp.concatenate([left, y[:, :, 1:-1], right], axis=2)

    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y if phase_out else depth_to_space(y)


def upconv_in_relu(x: jnp.ndarray, kernel: jnp.ndarray,
                   precision: str = "highest", phase_out: bool = False,
                   eps: float = 1e-5,
                   bwd_precision: str | None = None) -> jnp.ndarray:
    """Fused [upsample2x -> reflect-pad -> conv3x3 -> instance_norm -> relu].

    Same math as `relu(instance_norm(upsample2x_reflect_conv3(...)))`
    with the conv BIAS dropped — a per-channel constant is cancelled
    exactly by the instance norm's mean subtraction — and two fewer HBM
    passes: the exact border ring is never written into the bulk tensor.
    Instead the IN statistics are accumulated from the bulk interior and
    the four thin ring pieces separately, and the ring lands during the
    normalize+relu pass via a broadcast `select` (the ~280 GB/s
    effective HBM on this chip makes each avoided full-tensor pass
    ~2-4 ms/clip at decoder scale; see ROUND2.md).

    Args/returns as `upsample2x_reflect_conv3` (bias-free).
    """
    prec = _PREC[precision] if isinstance(precision, str) else precision
    b, h, w, _ = x.shape
    co = kernel.shape[3]

    kp = phase_kernel(kernel)
    # the bulk conv carries ~all the FLOPs -> dual-precision backward;
    # the thin ring convs below stay at the forward tier (negligible)
    from .dpconv import conv2d_dp
    bulk = conv2d_dp(x, kp, (1, 1), ((1, 1), (1, 1)),
                     precision=prec,
                     bwd_precision=bwd_precision)    # (B, H, W, 4Co) phase

    # closed-form border ring (see `_ring_kernels`); top/bot border
    # phase-cols are zero don't-cares owned by left/right below
    top, bot, left, right = _ring_phase(x, kernel, prec)

    # IN statistics over the assembled tensor, from its disjoint pieces:
    # interior = bulk[1:-1, 1:-1]; row 0 / H-1 cols 1..W-2 from top/bot;
    # full cols 0 / W-1 from left/right (they own the corners).
    def sums(t, axes):
        tf = t.astype(jnp.float32).reshape(t.shape[:-1] + (4, co))
        return (jnp.sum(tf, axis=axes), jnp.sum(jnp.square(tf), axis=axes))

    s1i, s2i = sums(bulk[:, 1:-1, 1:-1], (1, 2, 3))
    s1t, s2t = sums(top[:, :, 1:-1], (1, 2, 3))
    s1b, s2b = sums(bot[:, :, 1:-1], (1, 2, 3))
    s1l, s2l = sums(left, (1, 2, 3))
    s1r, s2r = sums(right, (1, 2, 3))
    n = h * w * 4
    mean = (s1i + s1t + s1b + s1l + s1r) / n               # (B, Co)
    # clamp: one-pass variance can cancel below 0 for near-constant
    # channels with large mean, which would NaN the rsqrt
    var = jnp.maximum(
        (s2i + s2t + s2b + s2l + s2r) / n - jnp.square(mean), 0.0)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]       # (B, 1, 1, 4Co)
    inv4 = jnp.tile(jax.lax.rsqrt(var + eps), (1, 4))[:, None, None, :]

    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    val = jnp.where(
        cols == 0, left, jnp.where(
            cols == w - 1, right, jnp.where(
                rows == 0, top, jnp.where(rows == h - 1, bot, bulk))))
    y = jax.nn.relu((val.astype(jnp.float32) - mean4) * inv4).astype(x.dtype)
    return y if phase_out else depth_to_space(y)


def instance_norm_phase(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """`ops.norms.instance_norm` of the interleaved tensor, computed in
    phase layout: statistics reduce over space AND the 4 phase copies of
    each channel. x is (B, H, W, 4C) with ((py*2+px)*C + c) layout."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    xf = x.astype(jnp.float32).reshape(b, h, w, 4, c)
    if x.dtype == jnp.bfloat16:
        # one-pass fp32 statistics for bf16 inputs (see ops.norms)
        n = h * w * 4
        s1 = jnp.sum(xf, axis=(1, 2, 3), keepdims=True)
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3), keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    else:
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.reshape(b, h, w, c4).astype(x.dtype)


def conv7x7_phase_kernel(k7: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, Ci, Co) -> (5, 5, 4Ci, 4Co) phase-domain kernel.

    An output pixel at interleaved position (2i+p, 2j+q) reads
    interleaved rows 2i+p-3 .. 2i+p+3; in phase layout those live at
    phase rows i-2 .. i+2 with tap offset dy = 2*dy' + py - p. Taps with
    |dy| > 3 land in a zero-padded copy of k7, vanishing exactly.
    """
    ci, co = k7.shape[2], k7.shape[3]
    k7p = jnp.pad(k7, ((2, 2), (2, 2), (0, 0), (0, 0)))    # (11, 11, Ci, Co)
    import numpy as np
    a = np.arange(5)
    p_ = np.arange(2)
    py = np.arange(2)
    # IY[a, py, p] = (2*(a-2) + py - p) + 3 + 2 pad offset
    iy = (2 * (a[:, None, None] - 2) + py[None, :, None]
          - p_[None, None, :]) + 5                         # (5, 2, 2)
    # gather: K5[a, b, py, px, ci, p, q, co]
    k5 = k7p[iy[:, None, :, None, :, None],
             iy[None, :, None, :, None, :]]                # (5,5,2,2,2,2,Ci,Co)
    k5 = k5.transpose(0, 1, 2, 3, 6, 4, 5, 7)              # a b py px ci p q co
    return k5.reshape(5, 5, 4 * ci, 4 * co)


def _mix_rows(x: jnp.ndarray, c: int, i_py0: int, i_py1: int) -> jnp.ndarray:
    """One reflect-pad phase row: py=0 channels from row i_py0, py=1 from
    i_py1 (reflection preserves parity, so phases never cross).

    Implemented as a channel-mask `where` of the two row slices, NOT a
    channel concat: on this TPU stack, `concatenate` along the channel
    axis of two DIFFERENT row/col slices of the SAME tensor miscompiles
    (XLA:TPU bug, measured 5.3 abs error on f32; CPU and numpy agree,
    `where`/pad+add forms are correct — see /tmp repro in ROUND2 notes).
    """
    sel = jnp.arange(x.shape[-1]) < 2 * c
    return jnp.where(sel, x[:, i_py0:i_py0 + 1], x[:, i_py1:i_py1 + 1])


def _mix_cols(x: jnp.ndarray, c: int, j_px0: int, j_px1: int) -> jnp.ndarray:
    """One reflect-pad phase column: px=0 channel quarters from column
    j_px0, px=1 quarters from j_px1 (same `where`-not-concat rationale
    as `_mix_rows`)."""
    sel = (jnp.arange(x.shape[-1]) // c) % 2 == 0
    return jnp.where(sel, x[:, :, j_px0:j_px0 + 1], x[:, :, j_px1:j_px1 + 1])


def _row_padded(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """reflect_pad(interleaved, 3)'s rows in phase layout (+2 each side).
    e.g. padded phase row -1 holds interleaved rows (-2, -1) -> reflected
    (2, 1) = (row1.py0, row0.py1)."""
    h = x.shape[1]
    return jnp.concatenate(
        [_mix_rows(x, c, 2, 1), _mix_rows(x, c, 1, 0), x,
         _mix_rows(x, c, h - 1, h - 2), _mix_rows(x, c, h - 2, h - 3)],
        axis=1)


def _col_padded(x: jnp.ndarray, c: int) -> jnp.ndarray:
    w = x.shape[2]
    return jnp.concatenate(
        [_mix_cols(x, c, 2, 1), _mix_cols(x, c, 1, 0), x,
         _mix_cols(x, c, w - 1, w - 2), _mix_cols(x, c, w - 2, w - 3)],
        axis=2)


def conv7x7_phase(x_phase: jnp.ndarray, k7: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  precision: str = "highest",
                  bwd_precision: str | None = None) -> jnp.ndarray:
    """Exact [reflect_pad(3) -> conv7x7 VALID] of the interleaved tensor,
    computed in phase layout.

    The decoder's final 7x7 conv maps to 3 output channels — at 256^2
    that lane-pads 3 -> 128 on the MXU (~40x waste, measured 42 ms/clip).
    In phase layout it is a 5x5 conv over 4*Ci channels at half
    resolution with 4*Co outputs: 4x fewer positions, 4x wider channels.

    The bulk conv uses free zero padding; only the 2-pixel output ring
    sees the reflect-pad values, so it is recomputed exactly from
    6-row/6-col slabs carrying the true phase-mixed pad rows (assembling
    the mixed padding for the FULL tensor relayouts ~2 GB through HBM —
    measured 71 ms/clip — whereas the slabs are O(H)).

    Args: x_phase (B, H, W, 4Ci) phase layout; k7 (7, 7, Ci, Co).
    Returns (B, H, W, 4Co) phase layout (depth_to_space to interleave).
    """
    prec = _PREC[precision] if isinstance(precision, str) else precision
    ci = k7.shape[2]
    k5 = conv7x7_phase_kernel(k7)
    h, w = x_phase.shape[1:3]
    from .dpconv import conv2d_dp
    y = conv2d_dp(x_phase, k5, (1, 1), ((2, 2), (2, 2)),
                  precision=prec, bwd_precision=bwd_precision)

    # exact ring: rows 0..1 read padded rows -2..3 => a 6-row slab with
    # the true pad rows on top (cols padded the same separable way)
    top = jnp.concatenate(
        [_mix_rows(x_phase, ci, 2, 1), _mix_rows(x_phase, ci, 1, 0),
         x_phase[:, :4]], axis=1)
    bot = jnp.concatenate(
        [x_phase[:, -4:], _mix_rows(x_phase, ci, h - 1, h - 2),
         _mix_rows(x_phase, ci, h - 2, h - 3)], axis=1)
    # ring lands via concat (one write per axis), not `.at[].set`
    # (a full-tensor copy per chained dynamic-update-slice)
    y = jnp.concatenate([_conv(_col_padded(top, ci), k5, prec),
                         y[:, 2:-2],
                         _conv(_col_padded(bot, ci), k5, prec)], axis=1)
    left = jnp.concatenate(
        [_mix_cols(x_phase, ci, 2, 1), _mix_cols(x_phase, ci, 1, 0),
         x_phase[:, :, :4]], axis=2)
    right = jnp.concatenate(
        [x_phase[:, :, -4:], _mix_cols(x_phase, ci, w - 1, w - 2),
         _mix_cols(x_phase, ci, w - 2, w - 3)], axis=2)
    y = jnp.concatenate([_conv(_row_padded(left, ci), k5, prec),
                         y[:, :, 2:-2],
                         _conv(_row_padded(right, ci), k5, prec)], axis=2)

    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y
