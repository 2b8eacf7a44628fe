"""Image resizing with PyTorch index conventions (NHWC).

Two resamplers are needed for parity:

- `resize_nearest` reproduces `F.interpolate(mode="nearest")` used to
  downsample the bbox masks to feature resolution
  (reference model/TSNet.py:322,347). Torch nearest picks
  `src = floor(dst * in / out)` — an asymmetric convention that differs
  from `jax.image.resize("nearest")`'s half-pixel rounding, so it is
  implemented directly as a gather.

- `upsample_bilinear_2x` / `resize_bilinear` reproduce
  `nn.Upsample(mode="bilinear", align_corners=False)` in the decoder
  (reference model/TSNet.py:145) and `F.interpolate(bilinear,
  align_corners=True)` in the pose face-crop path
  (model/TSNet_pose.py:444-446). Torch bilinear align_corners=False uses
  half-pixel centers, which is exactly `jax.image.resize("linear")` when
  upsampling (no antialiasing on either side).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch-convention nearest resize of an NHWC (or NHW1-like) tensor."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    ys = jnp.floor(jnp.arange(oh, dtype=jnp.float32) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow, dtype=jnp.float32) * (w / ow)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return x[:, ys][:, :, xs]


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor, matching torch conventions."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if align_corners:
        # src = dst * (in - 1) / (out - 1)
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        return _sample_separable(x, ys, xs)
    # half-pixel centers == jax.image.resize "linear" for upsampling
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, torch `align_corners=False` semantics."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


def _sample_separable(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Separable bilinear sampling at fractional row/col positions."""
    h, w = x.shape[1], x.shape[2]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wy = (ys - y0.astype(ys.dtype))[None, :, None, None]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wx = (xs - x0.astype(xs.dtype))[None, None, :, None]
    top = x[:, y0]
    bot = x[:, y1]
    rows = top * (1.0 - wy) + bot * wy
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left * (1.0 - wx) + right * wx
