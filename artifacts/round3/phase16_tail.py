"""Dead end, recorded: SIXTEEN-phase conv7 decoder tail.

Measured on chip (artifacts/round3/ab_tail.py, 128-frame clip, bf16):
tail16 standalone 34.5 ms vs tail4 18.8 ms; end-to-end bench moved
682.9 -> 628.0 fps with this tail. The 48-vs-12 MXU output lanes never
pay for the 4->16 relayout (even as strided-row pad-add) plus the ring
slab recompute + strip relayouts. Round 2 measured the same conclusion
via a general space-to-depth relayout. Kept here (out of the library)
so the measurement is reproducible; imports the live 4-phase helpers
from ops.upconv.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.ops.upconv import (_PREC, _col_padded, _conv,
                                         _mix_cols, _mix_rows,
                                         _row_padded, conv7x7_phase_kernel)

def phase4_to_phase16(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) 4-phase of a (2H, 2W, C) tensor -> (B, H/2, W/2,
    16C) 16-phase of the same tensor (quarter resolution).

    Channel layout: ((py2*2+px2)*4C + c4) where (py2, px2) select the
    odd/even 4-phase row/col and c4 is the incoming 4-phase channel —
    i.e. interleaved row 4i + 2*py2 + py1.

    The column split is a pure reshape (cols alternate px2 in memory);
    the row split lands via pad+add instead of a channel concat of two
    slices of the same tensor — that exact concat pattern miscompiles
    on this XLA:TPU stack (ROUND2.md environment facts).
    """
    b, h, w, c4 = x.shape
    even = x[:, 0::2].reshape(b, h // 2, w // 2, 2 * c4)
    odd = x[:, 1::2].reshape(b, h // 2, w // 2, 2 * c4)
    return (jnp.pad(even, ((0, 0),) * 3 + ((0, 2 * c4),))
            + jnp.pad(odd, ((0, 0),) * 3 + ((2 * c4, 0),)))


def depth_to_space16(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 16C) 16-phase (layout as `phase4_to_phase16`) ->
    (B, 4H, 4W, C) interleaved."""
    b, h, w, c16 = x.shape
    c = c16 // 16
    x = x.reshape(b, h, w, 2, 2, 2, 2, c)       # py2 px2 py1 px1
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)     # b h py2 py1 w px2 px1 c
    return x.reshape(b, 4 * h, 4 * w, c)


def conv7x7_phase16_kernel(k7: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, Ci, Co) -> (3, 3, 16Ci, 16Co) 16-phase-domain kernel.

    Interleaved output position (4i + a, 4j + b) reads interleaved rows
    4i + a - 3 .. 4i + a + 3, which live in quarter rows i-1 .. i+1
    with in-quarter offset a2: tap dy' = 4*dm + a2 - a, zero when
    |dy'| > 3 (landing in the zero-padded copy of k7).
    """
    import numpy as np
    ci, co = k7.shape[2], k7.shape[3]
    k7p = jnp.pad(k7, ((4, 4), (4, 4), (0, 0), (0, 0)))    # (15, 15, ...)
    m = np.arange(3)
    a2 = np.arange(4)
    a = np.arange(4)
    # iy[dm, a2, a] = 4*(dm-1) + a2 - a + 7  in [0, 14]
    iy = 4 * (m[:, None, None] - 1) + a2[None, :, None] - a[None, None, :] + 7
    # gather: (3, 3, a2, b2, a, b, Ci, Co)
    k3 = k7p[iy[:, None, :, None, :, None],
             iy[None, :, None, :, None, :]]
    k3 = jnp.moveaxis(k3, (6, 7), (2, 3))      # (3, 3, Ci, Co, a2, b2, a, b)

    # phase tuples: channel block order is (py2, px2, py1, px1) lex,
    # with a2 = 2*py2 + py1, b2 = 2*px2 + px1 (same for outputs)
    py2, px2, py1, px1 = np.indices((2, 2, 2, 2))
    ain = (2 * py2 + py1).reshape(-1)           # (16,) in block-lex order
    bin_ = (2 * px2 + px1).reshape(-1)
    k16 = k3[:, :, :, :, ain[:, None], bin_[:, None],
             ain[None, :], bin_[None, :]]       # (3, 3, Ci, Co, 16, 16)
    k16 = k16.transpose(0, 1, 4, 2, 5, 3)       # (3, 3, 16, Ci, 16, Co)
    return k16.reshape(3, 3, 16 * ci, 16 * co)


def conv7x7_phase16(x_phase: jnp.ndarray, k7: jnp.ndarray,
                    bias: jnp.ndarray | None = None,
                    precision: str = "highest") -> jnp.ndarray:
    """`conv7x7_phase` computed in SIXTEEN-phase layout at quarter
    resolution: the decoder's 7x7 -> 3-channel tail keeps only 12 of
    128 MXU output lanes in 4-phase form (measured ~15 ms/clip real);
    at 16 phases it is a 3x3 conv with 16*Ci inputs and 48 outputs —
    4x fewer positions, 4x wider lanes.

    Takes the SAME (B, H, W, 4Ci) 4-phase input and k7 as
    `conv7x7_phase`; relayouts to 16-phase internally (two strided-row
    reshapes + pad-add, see `phase4_to_phase16`). The 2-quarter-pixel
    output ring is exact: it reuses `conv7x7_phase`'s slab recompute
    (the true phase-mixed reflect padding) and relayouts the resulting
    strips. Returns (B, H/2, W/2, 16Co) — `depth_to_space16` to
    interleave.
    """
    prec = _PREC[precision] if isinstance(precision, str) else precision
    ci = k7.shape[2]
    h, w = x_phase.shape[1:3]
    k16 = conv7x7_phase16_kernel(k7).astype(x_phase.dtype)
    x16 = phase4_to_phase16(x_phase)
    y = jax.lax.conv_general_dilated(
        x16, k16, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)

    # exact ring, via the proven 4-phase slab recompute (conv7x7_phase
    # body), relayouted: one quarter row/col == two 4-phase rows/cols
    k5 = conv7x7_phase_kernel(k7).astype(x_phase.dtype)
    top = jnp.concatenate(
        [_mix_rows(x_phase, ci, 2, 1), _mix_rows(x_phase, ci, 1, 0),
         x_phase[:, :4]], axis=1)
    bot = jnp.concatenate(
        [x_phase[:, -4:], _mix_rows(x_phase, ci, h - 1, h - 2),
         _mix_rows(x_phase, ci, h - 2, h - 3)], axis=1)
    top16 = phase4_to_phase16(_conv(_col_padded(top, ci), k5, prec))
    bot16 = phase4_to_phase16(_conv(_col_padded(bot, ci), k5, prec))
    y = jnp.concatenate([top16, y[:, 1:-1], bot16], axis=1)
    left = jnp.concatenate(
        [_mix_cols(x_phase, ci, 2, 1), _mix_cols(x_phase, ci, 1, 0),
         x_phase[:, :, :4]], axis=2)
    right = jnp.concatenate(
        [x_phase[:, :, -4:], _mix_cols(x_phase, ci, w - 1, w - 2),
         _mix_cols(x_phase, ci, w - 2, w - 3)], axis=2)
    left16 = phase4_to_phase16(_conv(_row_padded(left, ci), k5, prec))
    right16 = phase4_to_phase16(_conv(_row_padded(right, ci), k5, prec))
    y = jnp.concatenate([left16, y[:, :, 1:-1], right16], axis=2)

    if bias is not None:
        y = y + jnp.tile(bias, 16).astype(y.dtype)
    return y



if __name__ == "__main__":
    # exactness vs the live 4-phase tail (this passed as a pytest while
    # the 16-phase tail was in the library; kept runnable here)
    import numpy as np
    from wacv23_tsnet_tpu.ops.upconv import conv7x7_phase, depth_to_space
    rng = np.random.default_rng(0)
    h, w, ci, co = 12, 16, 4, 3
    x4 = jnp.asarray(rng.standard_normal((2, h, w, 4 * ci)), jnp.float32)
    k7 = jnp.asarray(rng.standard_normal((7, 7, ci, co)), jnp.float32) * .2
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    want = depth_to_space(conv7x7_phase(x4, k7, bias))
    got = depth_to_space16(conv7x7_phase16(x4, k7, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(depth_to_space16(phase4_to_phase16(x4))),
        np.asarray(depth_to_space(x4)), atol=0)
    print("phase16 tail exact vs 4-phase tail")
