"""Bilinear grid sampling with torch `F.grid_sample` semantics (NHWC).

The transformation branch warps source features and unfolded source
images with `F.grid_sample(..., align_corners=False)` and the default
zeros padding (reference model/TSNet.py:366,377). This implements the
identical math as XLA gathers:

- grid carries (x, y) in [-1, 1];
- align_corners=False unnormalizes as `ix = ((x + 1) * W - 1) / 2`;
- out-of-bounds bilinear corners contribute zero.

The gather form (advanced indexing on the batch/row/col axes) lowers to a
single XLA gather per corner, which TPU executes from HBM at full
bandwidth; all four corner gathers and the lerp fuse into one loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False) -> jnp.ndarray:
    """Sample `img` (B, H, W, C) at `grid` (B, Hg, Wg, 2) -> (B, Hg, Wg, C).

    Matches torch `F.grid_sample(mode="bilinear", padding_mode="zeros")`.
    """
    b, h, w, c = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        bidx = jnp.arange(b).reshape((b,) + (1,) * (grid.ndim - 2))
        vals = img[bidx, yc, xc]                      # (B, Hg, Wg, C)
        wgt = jnp.where(valid, weight, 0.0)
        return vals * wgt[..., None].astype(img.dtype)

    out = corner(y0i, x0i, (1.0 - wy) * (1.0 - wx))
    out = out + corner(y0i, x0i + 1, (1.0 - wy) * wx)
    out = out + corner(y0i + 1, x0i, wy * (1.0 - wx))
    out = out + corner(y0i + 1, x0i + 1, wy * wx)
    return out
