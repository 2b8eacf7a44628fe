"""Patch-grid image warping (the image-space warp supervision op).

The reference supervises the flow in image space by unfolding the 256^2
source image into an h x w grid of (down x down) patches, grid-sampling
that patch grid with the feature-resolution flow, and folding back
(reference model/TSNet.py:372-387: `F.unfold` -> `F.grid_sample` ->
`F.fold`). With kernel == stride, unfold/fold are pure space-to-depth /
depth-to-space reshapes, so the TPU formulation is two transposes around
one `grid_sample` — no im2col materialization.

The channel ordering inside the depth axis differs from torch's
(torch is channel-major: c*k*k + ki*k + kj), but the composition
fold(warp(unfold(x))) is invariant to that ordering, so the result is
bit-identical in exact arithmetic. Golden-tested against the torch
pipeline in tests/test_ops_warp.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample


def space_to_depth(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/p, W/p, p*p*C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // p, w // p, p * p * c)


def depth_to_space(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, h, w, p*p*C) -> (B, h*p, w*p, C)."""
    b, h, w, d = x.shape
    c = d // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c)


def patch_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp a full-resolution image by a feature-resolution flow.

    Args:
      img:  (B, H, W, C) source image.
      flow: (B, h, w, 2) normalized (x, y) sampling grid, H == h * p.

    Returns:
      (B, H, W, C) warped image, equal to the reference's
      fold(grid_sample(unfold(img), flow)).
    """
    p = img.shape[1] // flow.shape[1]
    patches = space_to_depth(img, p)
    warped = grid_sample(patches, flow, align_corners=False)
    return depth_to_space(warped, p)
