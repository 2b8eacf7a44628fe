"""Coordinate grids and CoordConv channels (NHWC).

Semantics match the reference:
- `normalized_grid` reproduces `TSNet.get_grid(normalize=True)`
  (reference model/TSNet.py:299-307): an (H, W, 2) grid of (x, y) pairs
  with both axes `linspace(-1, 1)` INCLUSIVE of the endpoints. Unlike the
  reference — which rebuilds this on CPU and copies to device every
  forward call (model/TSNet.py:362) — callers here treat it as a compile
  time constant folded by XLA.
- `coord_channels` reproduces `Encoder.coord_conv`
  (reference model/TSNet.py:107-125): appends x, y in [-1, 1] and the
  radius channel sqrt(x^2 + y^2).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalized_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid of (x, y) coordinates, each in [-1, 1] inclusive."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)


def coord_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Append CoordConv channels to an NHWC tensor: (x, y, r)."""
    b, h, w, _ = x.shape
    ys = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    rr = jnp.sqrt(xx * xx + yy * yy)
    extra = jnp.stack([xx, yy, rr], axis=-1)          # (h, w, 3)
    extra = jnp.broadcast_to(extra[None], (b, h, w, 3))
    return jnp.concatenate([x, extra], axis=-1)
