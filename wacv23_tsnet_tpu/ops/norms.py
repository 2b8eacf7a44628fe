"""Normalization primitives (NHWC).

`instance_norm` matches `torch.nn.InstanceNorm2d(affine=False,
track_running_stats=False)` as used throughout the reference
(model/networks.py:30, model/TSNet.py ResnetBlock/Encoder/Decoder):
per-sample, per-channel standardization over the spatial axes with
biased variance and eps INSIDE the sqrt (torch adds eps to var).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) spatial standardization of an NHWC tensor."""
    # Compute statistics in fp32 for bf16 inputs — IN is variance-sensitive.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches `torch.nn.functional.normalize(p=2)`: x / max(||x||, eps).

    The reference L2-normalizes encoder features over the channel axis
    before the similarity matmul (model/TSNet.py:319,339).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
