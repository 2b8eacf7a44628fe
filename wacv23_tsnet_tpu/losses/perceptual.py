"""VGG19 perceptual loss (reference model/TSNet.py:527-539).

Weighted L1 over the relu{1..5}_1 activations with weights
1/32, 1/16, 1/8, 1/4, 1. The real branch is detached by the caller
(reference passes `real_img.detach()`, model/TSNet.py:428).
"""

from __future__ import annotations

import jax.numpy as jnp

VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_perceptual_loss(vgg_module, vgg_params, fake: jnp.ndarray,
                        real: jnp.ndarray) -> jnp.ndarray:
    fake_feats = vgg_module.apply(vgg_params, fake)
    real_feats = vgg_module.apply(vgg_params, real)
    loss = 0.0
    for w, f, r in zip(VGG_WEIGHTS, fake_feats, real_feats):
        loss += w * jnp.mean(jnp.abs(f.astype(jnp.float32) -
                                     r.astype(jnp.float32)))
    return loss
